"""Pallas TPU kernels for the engine's hot ops."""

from apvast_tpu.ops.pallas.statistics import covariance_pallas

__all__ = ["covariance_pallas"]
