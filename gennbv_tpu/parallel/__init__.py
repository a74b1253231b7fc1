from gennbv_tpu.parallel import mesh  # noqa: F401
