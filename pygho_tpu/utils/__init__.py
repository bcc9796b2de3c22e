"""Auxiliary subsystems: typed config, structured metrics, checkpointing,
profiling (SURVEY.md §5 — all net-new relative to the reference, which had
print-based logging and no checkpointing)."""

from .config import ModelConfig, TrainConfig, ExperimentConfig
from .metrics import MetricsLogger
from .checkpoint import save_checkpoint, restore_checkpoint
from .profiling import profile_trace, device_memory_stats
from .debugging import nan_guard, assert_all_finite, check_determinism

__all__ = [
    "ModelConfig", "TrainConfig", "ExperimentConfig", "MetricsLogger",
    "save_checkpoint", "restore_checkpoint", "profile_trace",
    "device_memory_stats", "nan_guard", "assert_all_finite",
    "check_determinism",
]
