"""Model families: the streaming perceptual AP-VAST engine and the
offline VAST baselines (BACC / variable span / pressure matching)."""

from apvast_tpu.models.apvast import ApVast
from apvast_tpu.models.apvast_fd import ApVastFD
from apvast_tpu.models.multi_scene import MultiSceneApVast
from apvast_tpu.models.vast_offline import (
    acc,
    pressure_matching,
    vast_offline,
    vast_offline_sweep,
)

__all__ = [
    "ApVast",
    "ApVastFD",
    "MultiSceneApVast",
    "acc",
    "pressure_matching",
    "vast_offline",
    "vast_offline_sweep",
]
