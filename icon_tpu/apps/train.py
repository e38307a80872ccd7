"""Geometry-network trainer CLI (reference apps/train.py).

Data-parallel over all local devices (or ``num_devices``): the batch shards
on a 1-D mesh, params replicate, and XLA derives the gradient all-reduce and
global batch-norm stats — the reference's Lightning DDP + sync_batchnorm
(apps/train.py:117-121) with no wrapper framework.

``-test`` runs the benchmark evaluation loop (reference trainer.test ->
ICON.test_step, apps/train.py:100-110 + apps/ICON.py:519-673): per test view
reconstruct at mcube_res and report chamfer / P2S / normal-consistency
averaged per dataset.

Checkpoints keep the top-3 on validation loss plus the latest; ``-resume``
restores params + optimizer state + step, continuing the loss curve
(reference resume_from_checkpoint, train.py:166-176).

Usage:
  python -m icon_tpu.apps.train -cfg configs/train/icon-filter.yaml
  python -m icon_tpu.apps.train -cfg ... -test    # benchmark test mode
  python -m icon_tpu.apps.train -cfg ... -resume  # continue last run
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
    ap.add_argument("-resume", action="store_true",
                    help="full resume from the latest checkpoint")
    ap.add_argument("--max_steps", type=int, default=0,
                    help="cap steps (debug)")
    ap.add_argument("--max_eval_items", type=int, default=0)
    ap.add_argument("-dist", "--distributed", action="store_true",
                    help="multi-host: jax.distributed.initialize from "
                         "COORDINATOR_ADDRESS/NUM_PROCESSES/PROCESS_ID")
    ap.add_argument("opts", nargs=argparse.REMAINDER, default=[])
    args = ap.parse_args()

    if args.distributed:
        # must run before the first jax import touches the backend
        from icon_tpu.parallel.dist import initialize_distributed
        if initialize_distributed():
            import jax
            print(f"[dist] process {jax.process_index()}/"
                  f"{jax.process_count()}, "
                  f"{jax.device_count()} global devices")

    from icon_tpu.utils.jax_cache import enable as _enable_cache
    _enable_cache()   # persist XLA compilations across runs

    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from icon_tpu.config import load_config
    from icon_tpu.data.datasets import (DataLoader, PIFuDataset, SHARED_KEYS)
    from icon_tpu.models.hgpifu import HGPIFuNet
    from icon_tpu.parallel.mesh import (make_mesh_for_batch, replicate,
                                        shard_batch)
    from icon_tpu.training.checkpoints import (CheckpointManager,
                                               load_checkpoint,
                                               partial_warm_start,
                                               restore_state)
    from icon_tpu.training.logging import MetricLogger
    from icon_tpu.training.train_step import (create_train_state, eval_step,
                                              train_step)

    cfg = load_config(args.config_file, overrides=args.opts or None)

    net = HGPIFuNet(cfg)

    if args.test_mode:
        # benchmark evaluation (reference apps/train.py:100-110,234-236)
        from icon_tpu.eval.test_loop import run_evaluation
        np.random.seed(1993)
        dataset = PIFuDataset(cfg, split="test")
        if len(dataset) == 0:
            raise SystemExit(f"no test data under {cfg.dataset.root!r}")
        example = _collate_example(dataset[0])
        variables = jax.jit(lambda k, b: net.init(k, b, train=False))(
            jax.random.PRNGKey(0), example)
        ckpt_dir = os.path.join(cfg.ckpt_dir, cfg.name)
        mgr = CheckpointManager(ckpt_dir)
        path = cfg.resume_path or mgr.best or mgr.latest
        if path and os.path.exists(path):
            loaded = load_checkpoint(path)
            variables = dict(variables)
            variables["params"] = partial_warm_start(
                variables["params"], loaded["params"])
            # BatchNorm running stats must come from training, not init —
            # otherwise `norm_mlp: batch` configs evaluate with init moments
            # (reference restores the full state dict, train.py:166-176).
            if loaded.get("batch_stats"):
                variables["batch_stats"] = partial_warm_start(
                    variables.get("batch_stats", {}), loaded["batch_stats"])
            print(f"[test] loaded {path}")
        run_evaluation(cfg, dataset, net, variables,
                       max_items=args.max_eval_items,
                       num_devices=cfg.num_devices or 1)
        return

    dataset = PIFuDataset(cfg, split="train")
    if len(dataset) == 0:
        raise SystemExit(
            f"no training data found under {cfg.dataset.root!r} — see "
            "docs/dataset.md of the reference for the expected layout")
    # multi-host: each process loads/decodes only its B/hosts slice of the
    # (identically seeded) global batch; global_batch_from_local stitches
    # the shards with no cross-host data movement
    pi, pc = jax.process_index(), jax.process_count()
    loader = DataLoader(dataset, batch_size=cfg.batch_size,
                        num_workers=cfg.num_threads,
                        process_index=pi, process_count=pc)
    val_dataset = PIFuDataset(cfg, split="val")
    if len(val_dataset) == 0:
        val_dataset = PIFuDataset(cfg, split="test")
    # pad_last: a ragged final val batch would not divide the device mesh
    # (shard_batch raises); wrap-around padding keeps every batch full
    val_loader = DataLoader(val_dataset, batch_size=cfg.batch_size,
                            num_workers=cfg.num_threads, shuffle=False,
                            drop_last=False, pad_last=True,
                            process_index=pi,
                            process_count=pc) if len(val_dataset) else None
    steps_per_epoch = len(loader)

    if pc > 1:
        # the mesh must span every host's chips so the per-process local
        # slices tile the whole batch axis
        assert cfg.batch_size % jax.device_count() == 0, (
            f"multi-host batch {cfg.batch_size} must divide the "
            f"{jax.device_count()} global devices")
        from icon_tpu.parallel.mesh import make_mesh
        mesh = make_mesh()
    else:
        mesh = make_mesh_for_batch(cfg.batch_size, cfg.num_devices or None)

    example = next(iter(loader))
    example = {k: jnp.asarray(v) for k, v in example.items()
               if isinstance(v, np.ndarray)}
    state = create_train_state(net, jax.random.PRNGKey(0), example, cfg,
                               steps_per_epoch)

    ckpt_dir = os.path.join(cfg.ckpt_dir, cfg.name)
    mgr = CheckpointManager(ckpt_dir, top_k=3)

    if args.resume and mgr.latest and os.path.exists(mgr.latest):
        state = restore_state(state, mgr.latest)
        print(f"[train] resumed from {mgr.latest} at step "
              f"{int(state.step)}")
    else:
        # partial warm starts (reference train.py:177-229)
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
    eval_fn = jax.jit(eval_step)
    logger = MetricLogger(ckpt_dir)
    from icon_tpu.config import export_cfg
    export_cfg(cfg, ckpt_dir)   # per-run snapshot (train_util.py:589-597)

    def prep(batch):
        batch = {k: v for k, v in batch.items() if isinstance(v, np.ndarray)}
        if pc > 1:
            from icon_tpu.parallel.mesh import global_batch_from_local
            return global_batch_from_local(batch, mesh,
                                           shared_keys=SHARED_KEYS)
        sharded = shard_batch(
            {k: v for k, v in batch.items() if k not in SHARED_KEYS}, mesh)
        for k in SHARED_KEYS:
            if k in batch:
                sharded[k] = jax.device_put(
                    jnp.asarray(batch[k]), NamedSharding(mesh, P()))
        return sharded

    # prediction panels every freq_show_train fraction of an epoch
    # (reference render_func posting recon slices + predictions to
    # TensorBoard, apps/ICON.py:694-727): sampled-point preds colored by
    # error + a dense low-res occupancy slice, alongside the inputs
    show_every = max(int(cfg.freq_show_train * steps_per_epoch), 1)
    fwd_fn = jax.jit(lambda v, b: net.apply(v, b, train=False))

    def prediction_panels(batch):
        from icon_tpu.ops.projection import project
        from icon_tpu.training.visuals import (occupancy_slice_image,
                                               point_error_image)
        one = {k: (jnp.asarray(v) if k in SHARED_KEYS
                   else jnp.asarray(v[:1]))
               for k, v in batch.items() if isinstance(v, np.ndarray)}
        variables = {"params": state.params,
                     "batch_stats": state.batch_stats}
        pred, _ = fwd_fn(variables, one)
        xyz = project(one["sample"], one["calib"])
        panels = {k: batch[k][0] for k in
                  ("image", "normal_F", "T_normal_F")
                  if k in batch and isinstance(batch[k], np.ndarray)}
        panels["pred_vs_label"] = point_error_image(
            np.asarray(xyz)[0, :, :2], np.asarray(pred)[0],
            np.asarray(one["label"])[0], size=batch["image"].shape[1])
        panels["occ_slice_z"] = occupancy_slice_image(
            net, variables, one, res=65, axis="z")
        return panels

    t0 = time.time()
    step = int(state.step)
    start_epoch = step // max(steps_per_epoch, 1)
    for epoch in range(start_epoch, cfg.num_epoch):
        loader.set_epoch(epoch)
        for batch in loader:
            state, metrics = step_fn(state, prep(batch))
            step += 1
            if step % 20 == 0:
                m = {k: float(v) for k, v in metrics.items()}
                m["it_per_s"] = step / (time.time() - t0)
                logger.log(step, m)
                print(f"epoch {epoch} step {step}: {m}", flush=True)
            if step % show_every == 0:
                try:
                    logger.log_images(step, prediction_panels(batch))
                except Exception as e:          # panels must never kill a run
                    print(f"[train] prediction panel failed: {e}")
            if args.max_steps and step >= args.max_steps:
                break
        # validation epoch -> top-k checkpointing on val loss
        val_loss = float("nan")
        if val_loader is not None:
            vals = []
            for vb in val_loader:
                vm = eval_fn(state, prep(vb))
                vals.append(float(vm["loss"]))
            val_loss = float(np.mean(vals)) if vals else float("nan")
            logger.log(step, {"val_loss": val_loss})
            print(f"epoch {epoch}: val_loss={val_loss:.4f}", flush=True)
        # rank-0-only checkpoint writes (reference apps/train.py:47-61)
        from icon_tpu.parallel.dist import is_main_process
        if is_main_process():
            mgr.save(step, jax.device_get(state),
                     val_loss if np.isfinite(val_loss) else 1e9)
        if args.max_steps and step >= args.max_steps:
            break
    print(f"done: {step} steps in {time.time() - t0:.0f}s")


def _collate_example(item):
    import jax.numpy as jnp
    from icon_tpu.data.datasets import SHARED_KEYS
    out = {}
    for k, v in item.items():
        if not isinstance(v, np.ndarray):
            continue
        out[k] = jnp.asarray(v) if k in SHARED_KEYS \
            else jnp.asarray(v)[None]
    return out


if __name__ == "__main__":
    main()
