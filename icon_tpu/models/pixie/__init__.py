"""PIXIE whole-body SMPL-X estimator (reference lib/pixielib)."""

from icon_tpu.models.pixie.net import (PIXIE, PixieConfig,  # noqa: F401
                                       PixieEstimator, build_pixie)
