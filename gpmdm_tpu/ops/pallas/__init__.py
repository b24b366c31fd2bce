"""Pallas TPU kernels (fused GP posteriors; see gp_posterior.py)."""

from . import gp_posterior

__all__ = ["gp_posterior"]
