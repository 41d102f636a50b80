"""Utilities: profiling, logging helpers."""
from gisnav_tpu.utils.profiling import StageTimer, device_profile  # noqa: F401
