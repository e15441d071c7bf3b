"""Hyperparameter optimization harness (reference experiment_nni.py +
train_nni.py equivalents for TPU trials)."""

from .search import SEARCH_SPACE, AnnealTuner, sample_space
from .experiment import run_experiment

__all__ = ["SEARCH_SPACE", "AnnealTuner", "sample_space", "run_experiment"]
