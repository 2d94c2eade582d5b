from scenenet_tpu.utils.seeding import fix_randomness
from scenenet_tpu.utils.logging import RunLogger
from scenenet_tpu.utils.config import ExperimentConfig, load_config, sample_sweep

__all__ = [
    "fix_randomness",
    "RunLogger",
    "ExperimentConfig",
    "load_config",
    "sample_sweep",
]
