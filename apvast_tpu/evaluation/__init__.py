"""Evaluation suite (layer L5): pressure prediction and quality metrics."""

from apvast_tpu.evaluation.metrics import (
    acoustic_contrast_db,
    detectability,
    normalized_mse,
    predict_pressure,
)

__all__ = [
    "acoustic_contrast_db",
    "detectability",
    "normalized_mse",
    "predict_pressure",
]
