"""Stateless geometry / tensor ops (reference L3: lib/net/geometry.py,
lib/dataset/mesh_util.py, lib/common/render_utils.py — re-designed TPU-first).
"""

from icon_tpu.ops.projection import orthogonal, perspective, project
from icon_tpu.ops.grid_sample import grid_sample_2d, grid_sample_3d, index
from icon_tpu.ops.select import feat_select
