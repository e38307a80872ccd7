"""Training system (reference L5: apps/ICON.py, apps/Normal.py,
lib/common/train_util.py) — functional train steps under jit with
mesh-sharded batches, optax optimizers, orbax checkpoints."""
