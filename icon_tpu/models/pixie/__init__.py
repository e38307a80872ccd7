"""PIXIE whole-body SMPL-X estimator (reference lib/pixielib)."""

from icon_tpu.models.pixie.net import PIXIE, build_pixie  # noqa: F401
