"""CLI entry points (reference L6: apps/train.py, apps/train-normal.py,
apps/infer.py)."""
