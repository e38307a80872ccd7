"""Benchmark metrics (reference lib/dataset/Evaluator.py)."""

from icon_tpu.eval.evaluator import (chamfer_p2s, normal_consistency,
                                     occupancy_metrics, sample_surface)
