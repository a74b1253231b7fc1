from gennbv_tpu.ops import backproject, camera, carve, chamfer, render, voxel  # noqa: F401
