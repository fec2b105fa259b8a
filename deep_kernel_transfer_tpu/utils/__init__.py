"""Cross-cutting utilities: checkpoints, metrics, torch-parity optimizers."""
from .checkpoint import (
    checkpoint_dir_for,
    get_assigned_file,
    get_best_file,
    get_resume_file,
    load_checkpoint,
    save_checkpoint,
)
from .logger import MetricsLogger
from .metrics import DBindex, calibrate_temperature, ece, one_hot, sparsity
from .profiling import StepTimer, annotate, sync, trace
from .torch_optim import torch_sgd

__all__ = [
    "checkpoint_dir_for", "get_assigned_file", "get_best_file",
    "get_resume_file", "load_checkpoint", "save_checkpoint",
    "DBindex", "calibrate_temperature", "ece", "one_hot", "sparsity",
    "torch_sgd", "MetricsLogger", "StepTimer", "annotate", "sync", "trace",
]
