"""icon_tpu — a TPU-native (JAX/XLA/Pallas) clothed-human 3D reconstruction framework.

Built from scratch with the capabilities of ICON (CVPR 2022): single-image
clothed-human reconstruction with ICON / PIFu / PaMIR implicit-surface variants,
normal-map prediction nets, SMPL(-X) body priors, a coarse-to-fine occupancy
reconstruction engine with on-device marching cubes, and differentiable
rasterization for SMPL / cloth refinement loops.

Layout (mirrors SURVEY.md §2's component inventory, re-designed TPU-first):

- ``icon_tpu.config``    — typed config tree (reference: lib/common/config.py)
- ``icon_tpu.ops``       — stateless geometry/tensor ops (reference L3)
- ``icon_tpu.models``    — networks + SMPL body models (reference L4)
- ``icon_tpu.recon``     — coarse-to-fine occupancy engine + marching cubes
- ``icon_tpu.parallel``  — device-mesh sharding (pjit/shard_map) helpers
- ``icon_tpu.training``  — train steps, optimizers, checkpointing, metrics
- ``icon_tpu.data``      — datasets and host data pipeline (reference L1)
- ``icon_tpu.apps``      — CLI entry points (infer/train) (reference L6)

All image tensors are channel-last ``[B, H, W, C]`` (TPU/XLA-native), unlike the
reference's ``[B, C, H, W]``; all point sets are ``[B, N, 3]``.
"""

__version__ = "0.1.0"
