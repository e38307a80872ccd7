"""Rendering layer (reference L2: lib/common/render.py — PyTorch3D stack),
built on the tile rasterizer in icon_tpu.ops.raster."""

from icon_tpu.render.camera import ortho_views, verts_to_ndc
from icon_tpu.render.render import (render_depth, render_normal,
                                    render_silhouette, query_color)
