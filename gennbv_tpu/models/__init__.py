from gennbv_tpu.models import distributions  # noqa: F401
from gennbv_tpu.models.encoder import HybridEncoder, positional_encoding  # noqa: F401
from gennbv_tpu.models.policy import ActorCriticPolicy, init_policy  # noqa: F401
