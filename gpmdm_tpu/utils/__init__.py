"""Utilities: persistence, metrics, profiling, checkpoints, logging, debug."""

from . import checkpoint, io, metrics, profiling
from .logging import MetricLogger

__all__ = ["checkpoint", "io", "metrics", "profiling", "MetricLogger"]
