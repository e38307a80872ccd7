"""Geometry-network trainer CLI (reference apps/train.py).

Data-parallel over all local devices (or ``num_devices``): the batch shards
on a 1-D mesh, params replicate, and XLA derives the gradient all-reduce and
global batch-norm stats — the reference's Lightning DDP + sync_batchnorm
(apps/train.py:117-121) with no wrapper framework.

Usage:
  python -m icon_tpu.apps.train -cfg configs/train/icon-filter.yaml
  python -m icon_tpu.apps.train -cfg ... -test    # benchmark test mode
"""

from __future__ import annotations

import argparse
import os
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-cfg", "--config_file", required=True)
    ap.add_argument("-test", "--test_mode", action="store_true")
    ap.add_argument("--max_steps", type=int, default=0,
                    help="cap steps (debug)")
    ap.add_argument("opts", nargs=argparse.REMAINDER, default=[])
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from icon_tpu.config import load_config
    from icon_tpu.data.datasets import DataLoader, PIFuDataset
    from icon_tpu.models.hgpifu import HGPIFuNet
    from icon_tpu.parallel.mesh import (make_mesh_for_batch, replicate,
                                        shard_batch)
    from icon_tpu.training.checkpoints import (load_checkpoint,
                                               partial_warm_start,
                                               save_checkpoint)
    from icon_tpu.training.logging import MetricLogger
    from icon_tpu.training.train_step import (create_train_state, train_step)

    cfg = load_config(args.config_file, overrides=args.opts or None)
    if args.test_mode:
        cfg = cfg.replace(test_mode=True)

    dataset = PIFuDataset(cfg, split="test" if args.test_mode else "train")
    if len(dataset) == 0:
        raise SystemExit(
            f"no training data found under {cfg.dataset.root!r} — see "
            "docs/dataset.md of the reference for the expected layout")
    loader = DataLoader(dataset, batch_size=cfg.batch_size,
                        num_workers=cfg.num_threads)
    steps_per_epoch = len(loader)

    net = HGPIFuNet(cfg)
    mesh = make_mesh_for_batch(cfg.batch_size, cfg.num_devices or None)

    example = next(iter(loader))
    example = {k: jnp.asarray(v) for k, v in example.items()
               if isinstance(v, np.ndarray)}
    state = create_train_state(net, jax.random.PRNGKey(0), example, cfg,
                               steps_per_epoch)

    # warm starts (reference train.py:177-229)
    if cfg.resume_path and os.path.exists(cfg.resume_path):
        loaded = load_checkpoint(cfg.resume_path)
        state = state.replace(params=partial_warm_start(
            state.params, loaded["params"]))
    if cfg.normal_path and os.path.exists(cfg.normal_path):
        loaded = load_checkpoint(cfg.normal_path)
        state = state.replace(params=partial_warm_start(
            state.params, loaded["params"],
            rename={"netG": "normal_filter"}))

    state = replicate(state, mesh)
    step_fn = jax.jit(train_step, donate_argnums=0)
    logger = MetricLogger(os.path.join(cfg.ckpt_dir, cfg.name))

    t0 = time.time()
    step = 0
    for epoch in range(cfg.num_epoch):
        for batch in loader:
            batch = {k: v for k, v in batch.items()
                     if isinstance(v, np.ndarray)}
            sharded = shard_batch(batch, mesh)
            state, metrics = step_fn(state, sharded)
            step += 1
            if step % 20 == 0:
                m = {k: float(v) for k, v in metrics.items()}
                m["it_per_s"] = step / (time.time() - t0)
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
