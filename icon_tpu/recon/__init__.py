"""Reconstruction engine: coarse-to-fine occupancy evaluation + on-device
iso-surface extraction (reference lib/common/seg3d_lossless.py, re-designed
with static shapes for XLA)."""
