from channel_pruning_tpu.utils.config import Config, default_config  # noqa: F401
from channel_pruning_tpu.utils.timers import Timer  # noqa: F401
