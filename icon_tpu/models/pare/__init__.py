"""PARE human pose & shape estimator (reference lib/pare)."""

from icon_tpu.models.pare.net import PARE, PareHead, build_pare  # noqa: F401
from icon_tpu.models.pare.hrnet import HRNet  # noqa: F401
