from scenenet_tpu.utils.seeding import fix_randomness
from scenenet_tpu.utils.logging import RunLogger

__all__ = ["fix_randomness", "RunLogger"]
