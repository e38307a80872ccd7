"""Normal-network trainer CLI (reference apps/train-normal.py)."""

from __future__ import annotations

import argparse
import os
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-cfg", "--config_file", required=True)
    ap.add_argument("--max_steps", type=int, default=0)
    ap.add_argument("opts", nargs=argparse.REMAINDER, default=[])
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from icon_tpu.config import load_config
    from icon_tpu.data.datasets import DataLoader, NormalDataset
    from icon_tpu.models.normalnet import NormalNet
    from icon_tpu.parallel.mesh import (make_mesh_for_batch, replicate,
                                        shard_batch)
    from icon_tpu.training.checkpoints import save_checkpoint
    from icon_tpu.training.logging import MetricLogger
    from icon_tpu.training.normal_step import (create_normal_state,
                                               normal_train_step)

    cfg = load_config(args.config_file, overrides=args.opts or None)
    dataset = NormalDataset(cfg, split="train")
    if len(dataset) == 0:
        raise SystemExit(f"no training data under {cfg.dataset.root!r}")
    loader = DataLoader(dataset, batch_size=cfg.batch_size,
                        num_workers=cfg.num_threads)

    net = NormalNet(in_nml=cfg.net.in_nml or (
        ("image", 3), ("T_normal_F", 3), ("T_normal_B", 3)),
        ngf=cfg.net.ngf, n_downsampling=cfg.net.n_downsampling,
        n_blocks=cfg.net.n_blocks)
    mesh = make_mesh_for_batch(cfg.batch_size, cfg.num_devices or None)

    example = {k: jnp.asarray(v) for k, v in next(iter(loader)).items()
               if isinstance(v, np.ndarray)}
    state = create_normal_state(net, jax.random.PRNGKey(0), example,
                                lr=cfg.lr_N, schedule=cfg.schedule,
                                gamma=cfg.gamma,
                                steps_per_epoch=len(loader))
    state = replicate(state, mesh)
    step_fn = jax.jit(normal_train_step, donate_argnums=0)
    logger = MetricLogger(os.path.join(cfg.ckpt_dir, cfg.name), "normal")

    t0 = time.time()
    step = 0
    for epoch in range(cfg.num_epoch):
        for batch in loader:
            sharded = shard_batch({k: v for k, v in batch.items()
                                   if isinstance(v, np.ndarray)}, mesh)
            state, metrics = step_fn(state, sharded)
            step += 1
            if step % 20 == 0:
                m = {k: float(v) for k, v in metrics.items()}
                logger.log(step, m)
                print(f"epoch {epoch} step {step}: {m}", flush=True)
            if args.max_steps and step >= args.max_steps:
                break
        save_checkpoint(os.path.join(cfg.ckpt_dir, cfg.name), step, state)
        if args.max_steps and step >= args.max_steps:
            break
    print(f"done: {step} steps in {time.time() - t0:.0f}s")


if __name__ == "__main__":
    main()
