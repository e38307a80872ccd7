"""PyMAF human pose & shape estimator (reference lib/pymaf)."""

from icon_tpu.models.pymaf.net import PyMAF, build_pymaf  # noqa: F401
from icon_tpu.models.pymaf.convert import (  # noqa: F401
    load_pymaf_checkpoint, port_pymaf)
