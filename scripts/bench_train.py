"""Training-step throughput on the reference recipe (batch 4, 512^2
inputs, 8000 geo samples/item, icon-filter net — configs/train/
icon-filter.yaml:52-76). The reference's dataloader demo sustains
~2 it/s end to end on GPU (lib/dataloader_demo.py:46-48); this measures
the pure device step (fwd+bwd+update) on one chip and the step with a
host->device batch transfer folded in."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(
    os.path.abspath(__file__)), ".."))

import numpy as np

from icon_tpu.utils.jax_cache import enable
enable()

import jax
import jax.numpy as jnp

from icon_tpu.config import Config, NetConfig
from icon_tpu.models.hgpifu import HGPIFuNet
from icon_tpu.training.train_step import create_train_state, train_step
from icon_tpu.utils.synthetic import synthetic_icon_batch


def main():
    B, n_samples = 4, 8000
    cfg = Config(test_mode=False, net=NetConfig(
        mlp_dim=(256, 512, 256, 128, 1), res_layers=(2, 3, 4), num_stack=2,
        prior_type="icon", use_filter=True,
        in_geo=(("normal_F", 3), ("normal_B", 3)),
        in_nml=(("image", 3), ("T_normal_F", 3), ("T_normal_B", 3)),
        smpl_feats=("sdf", "norm", "vis", "cmap"), norm_mlp="batch",
        hourglass_dim=6, smpl_dim=7))
    net = HGPIFuNet(cfg)
    rng = np.random.RandomState(0)
    batch_np = synthetic_icon_batch(rng, B=B, image_size=512,
                                    n_samples=n_samples, subdiv=4)
    batch = {k: jnp.asarray(v) for k, v in batch_np.items()}

    state = create_train_state(net, jax.random.PRNGKey(0), batch, cfg,
                               steps_per_epoch=1000)
    step = jax.jit(train_step)
    state, m = step(state, batch)
    jax.block_until_ready(m["loss"])

    t0 = time.perf_counter()
    iters = 20
    for _ in range(iters):
        state, m = step(state, batch)
    jax.block_until_ready(m["loss"])
    dt = (time.perf_counter() - t0) / iters
    print(f"device step: {dt * 1e3:.1f} ms  ({1 / dt:.2f} it/s, "
          f"batch {B})")

    t0 = time.perf_counter()
    for _ in range(iters):
        batch = {k: jnp.asarray(v) for k, v in batch_np.items()}
        state, m = step(state, batch)
    jax.block_until_ready(m["loss"])
    dt = (time.perf_counter() - t0) / iters
    print(f"step + h2d transfer: {dt * 1e3:.1f} ms  ({1 / dt:.2f} it/s)")


if __name__ == "__main__":
    main()
