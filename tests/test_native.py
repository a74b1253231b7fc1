"""Native voxelizer tests: build the C++ library, voxelize a generated cube
and a tetrahedron, check surface + solid fill."""
import os
import shutil

import numpy as np
import pytest

pytestmark = pytest.mark.skipif(shutil.which("g++") is None, reason="no g++")

from gennbv_tpu.utils import native  # noqa: E402

CUBE_OBJ = """
v 0 0 0
v 1 0 0
v 1 1 0
v 0 1 0
v 0 0 1
v 1 0 1
v 1 1 1
v 0 1 1
f 1 4 3
f 1 3 2
f 5 6 7
f 5 7 8
f 1 2 6
f 1 6 5
f 2 3 7
f 2 7 6
f 3 4 8
f 3 8 7
f 4 1 5
f 4 5 8
"""


@pytest.fixture(scope="module")
def cube_path(tmp_path_factory):
    p = tmp_path_factory.mktemp("mesh") / "cube.obj"
    p.write_text(CUBE_OBJ)
    return str(p)


class TestVoxelizer:
    def test_abi(self):
        lib = native.load_library()
        assert lib.voxelizer_abi_version() == 1

    def test_cube_solid(self, cube_path):
        res = 16
        box = (np.array([-0.5, -0.5, -0.5]), np.array([1.5, 1.5, 1.5]))
        occ, lo, hi = native.voxelize_obj(cube_path, res, box=box)
        vsize = 2.0 / res  # 0.125
        # the unit cube spans voxel indices 4..11 per axis
        assert occ[8, 8, 8] == 1, "solid interior filled"
        assert occ[0, 0, 0] == 0 and occ[15, 15, 15] == 0
        frac = occ.mean()
        assert 0.10 < frac < 0.20, f"cube fills ~12.5% of the box, got {frac:.3f}"

    def test_cube_surface_only(self, cube_path):
        res = 16
        box = (np.array([-0.5, -0.5, -0.5]), np.array([1.5, 1.5, 1.5]))
        occ_solid, _, _ = native.voxelize_obj(cube_path, res, box=box, solid=True)
        occ_surf, _, _ = native.voxelize_obj(cube_path, res, box=box, solid=False)
        assert occ_surf.sum() < occ_solid.sum()
        assert occ_surf[8, 8, 8] == 0, "interior voxel empty in shell mode"
        # shell is closed: every boundary voxel of the solid is in the shell
        assert (occ_surf & occ_solid).sum() == occ_surf.sum()

    def test_auto_box_and_scale(self, cube_path):
        occ, lo, hi = native.voxelize_obj(cube_path, 12, scale=2.0)
        assert (hi > lo).all()
        # bounds cover the scaled cube [0, 2]^3 with 5% padding
        assert (lo < 0).all() and (hi > 2).all()
        assert occ.sum() > 0

    def test_scene_pipeline_integration(self, cube_path):
        """Voxelizer output feeds the SceneSet build path (surface + GT)."""
        from gennbv_tpu.env.scene import _surface_from_solid, _downsample_surface
        res = 32
        box = (np.array([-2.0, -2.0, -0.1]), np.array([2.0, 2.0, 3.9]))
        occ, lo, hi = native.voxelize_obj(cube_path, res, box=box)
        surf = _surface_from_solid(occ)
        gt = _downsample_surface(surf, res, 20)
        assert gt.sum() > 0


def test_mesher_single_voxel_and_roundtrip(tmp_path):
    """Native mesher: one voxel -> 8 verts / 6 quads; a meshed box
    re-voxelizes to (a superset of) the original solid."""
    import numpy as np
    from gennbv_tpu.utils.native import mesh_voxels_to_obj, voxelize_obj

    g = np.zeros((4, 4, 4), np.uint8)
    g[1, 1, 1] = 1
    p = str(tmp_path / "one.obj")
    n = mesh_voxels_to_obj(g, origin=(0, 0, 0), vsize=(1, 1, 1), path=p)
    assert n == 6
    txt = open(p).read()
    assert txt.count("\nv ") + txt.startswith("v ") == 8 or txt.count("v ") >= 8
    assert txt.count("\nf ") == 6

    # roundtrip: 2x2x2 solid block -> mesh -> voxelize at the same box
    g2 = np.zeros((4, 4, 4), np.uint8)
    g2[1:3, 1:3, 1:3] = 1
    p2 = str(tmp_path / "block.obj")
    mesh_voxels_to_obj(g2, origin=(0, 0, 0), vsize=(1, 1, 1), path=p2)
    occ, lo, hi = voxelize_obj(p2, res=4,
                               box=(np.zeros(3), np.full(3, 4.0)), solid=True)
    # mesh faces sit exactly ON voxel boundaries, so the rasterized shell
    # may spill one voxel outward: require original ⊆ occ ⊆ dilate(original)
    assert (occ[g2 == 1] == 1).all()
    dil = np.zeros_like(g2)
    for dx in (-1, 0, 1):
        for dy in (-1, 0, 1):
            for dz in (-1, 0, 1):
                dil |= np.roll(np.roll(np.roll(g2, dx, 0), dy, 1), dz, 2)
    assert (occ <= dil).all()
