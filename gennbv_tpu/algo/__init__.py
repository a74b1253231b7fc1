from gennbv_tpu.algo import gae, ppo, rollout  # noqa: F401
