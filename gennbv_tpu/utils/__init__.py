from gennbv_tpu.utils.logger import Logger  # noqa: F401
