"""Inference pipeline (reference apps/infer.py): SMPL refinement, implicit
reconstruction, cloth refinement, coloring, export."""
