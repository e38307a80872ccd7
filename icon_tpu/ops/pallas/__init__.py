"""Pallas TPU kernels for the hot ops (see /opt pallas guide): fusions XLA
cannot express, e.g. the kNN distance matrix that never touches HBM."""
from icon_tpu.ops.pallas.knn import nearest_vertices_pallas  # noqa: F401
