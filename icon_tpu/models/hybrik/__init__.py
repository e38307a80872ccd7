"""HybrIK human pose & shape estimator (reference lib/hybrik)."""

from icon_tpu.models.hybrik.ik import hybrik_ik  # noqa: F401
from icon_tpu.models.hybrik.net import HybrIK, build_hybrik  # noqa: F401
