from mudpt_tpu.utils.registry import Registry
from mudpt_tpu.utils.logging import setup_logger, MetricsLogger
from mudpt_tpu.utils.rng import set_seed, new_rng

__all__ = ["Registry", "setup_logger", "MetricsLogger", "set_seed", "new_rng"]
