"""Normal-network trainer CLI (reference apps/train-normal.py).

Parity with the reference's Lightning setup:
- validation epoch after each training epoch (Normal.py:167-209);
- ``ModelCheckpoint(save_top_k=3, monitor='val/avgloss')`` -> top-3
  checkpoints by val loss via CheckpointManager, plus the latest;
- ``-resume`` continues from the latest checkpoint (params + opt state);
- the logged/validated loss includes the reference's no-grad VGG
  perceptual value when VGG19 weights are installed (models/vgg.py), so
  curves are comparable to the reference's.
"""

from __future__ import annotations

import argparse
import functools
import os
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-cfg", "--config_file", required=True)
    ap.add_argument("-resume", action="store_true")
    ap.add_argument("--max_steps", type=int, default=0)
    ap.add_argument("--vgg_ckpt", default="",
                    help="torchvision vgg19 .pth for the perceptual metric")
    ap.add_argument("opts", nargs=argparse.REMAINDER, default=[])
    args = ap.parse_args()

    from icon_tpu.utils.jax_cache import enable as _enable_cache
    _enable_cache()   # persist XLA compilations across runs

    import jax
    import jax.numpy as jnp

    from icon_tpu.config import load_config
    from icon_tpu.data.datasets import DataLoader, NormalDataset
    from icon_tpu.models.normalnet import NormalNet
    from icon_tpu.models.vgg import load_vgg19
    from icon_tpu.parallel.mesh import (make_mesh_for_batch, replicate,
                                        shard_batch)
    from icon_tpu.training.checkpoints import (CheckpointManager,
                                               restore_state)
    from icon_tpu.training.logging import MetricLogger
    from icon_tpu.training.normal_step import (create_normal_state,
                                               normal_eval_step,
                                               normal_train_step)

    cfg = load_config(args.config_file, overrides=args.opts or None)
    dataset = NormalDataset(cfg, split="train")
    if len(dataset) == 0:
        raise SystemExit(f"no training data under {cfg.dataset.root!r}")
    loader = DataLoader(dataset, batch_size=cfg.batch_size,
                        num_workers=cfg.num_threads)
    val_dataset = NormalDataset(cfg, split="val")
    if len(val_dataset) == 0:
        val_dataset = NormalDataset(cfg, split="test")
    val_loader = DataLoader(val_dataset, batch_size=cfg.batch_size,
                            num_workers=cfg.num_threads, shuffle=False,
                            pad_last=True) if len(val_dataset) else None

    net = NormalNet(in_nml=cfg.net.in_nml or (
        ("image", 3), ("T_normal_F", 3), ("T_normal_B", 3)),
        ngf=cfg.net.ngf, n_downsampling=cfg.net.n_downsampling,
        n_blocks=cfg.net.n_blocks)
    mesh = make_mesh_for_batch(cfg.batch_size, cfg.num_devices or None)

    vgg = load_vgg19(args.vgg_ckpt or None)
    if vgg is None:
        print("[train-normal] no VGG19 weights — val loss omits the "
              "reference's perceptual term (install data/vgg/vgg19.pth)",
              flush=True)

    example = {k: jnp.asarray(v) for k, v in next(iter(loader)).items()
               if isinstance(v, np.ndarray)}
    state = create_normal_state(net, jax.random.PRNGKey(0), example,
                                lr=cfg.lr_N, schedule=cfg.schedule,
                                gamma=cfg.gamma,
                                steps_per_epoch=len(loader))
    ckpt_dir = os.path.join(cfg.ckpt_dir, cfg.name)
    mgr = CheckpointManager(ckpt_dir, top_k=3)
    if args.resume and mgr.latest:
        state = restore_state(state, mgr.latest)
        print(f"[train-normal] resumed step {int(state.step)} "
              f"from {mgr.latest}", flush=True)
    state = replicate(state, mesh)
    step_fn = jax.jit(normal_train_step, donate_argnums=0)
    eval_fn = jax.jit(functools.partial(normal_eval_step, vgg=vgg))
    logger = MetricLogger(ckpt_dir, "normal")
    from icon_tpu.config import export_cfg
    export_cfg(cfg, ckpt_dir)   # per-run snapshot (train_util.py:589-597)

    def prep(batch):
        return shard_batch({k: v for k, v in batch.items()
                            if isinstance(v, np.ndarray)}, mesh)

    # predicted-normal panels every freq_show_train fraction of an epoch
    # (reference Normal.py:117-129 render_func posts predictions, not
    # inputs)
    show_every = max(int(cfg.freq_show_train * len(loader)), 1)
    pred_fn = jax.jit(lambda p, b: net.apply({"params": p}, b, train=False))

    def prediction_panels(batch):
        from icon_tpu.training.visuals import normal_pred_panels
        one = {k: jnp.asarray(v[:1]) for k, v in batch.items()
               if isinstance(v, np.ndarray)}
        pF, pB = pred_fn(state.params, one)
        return normal_pred_panels(one, pF, pB)

    t0 = time.time()
    step = int(state.step)
    for epoch in range(cfg.num_epoch):
        for batch in loader:
            state, metrics = step_fn(state, prep(batch))
            step += 1
            if step % 20 == 0:
                m = {k: float(v) for k, v in metrics.items()}
                logger.log(step, m)
                print(f"epoch {epoch} step {step}: {m}", flush=True)
            if step % show_every == 0:
                try:
                    logger.log_images(step, prediction_panels(batch),
                                      prefix="normal")
                except Exception as e:
                    print(f"[train-normal] prediction panel failed: {e}")
            if args.max_steps and step >= args.max_steps:
                break

        # validation epoch -> top-k checkpointing on val loss
        val_loss = float("nan")
        if val_loader is not None:
            vals = []
            for vb in val_loader:
                vals.append(float(eval_fn(state, prep(vb))["loss"]))
            val_loss = float(np.mean(vals)) if vals else float("nan")
            logger.log(step, {"val_loss": val_loss})
            print(f"epoch {epoch}: val_loss={val_loss:.4f}", flush=True)
        mgr.save(step, state,
                 val_loss if np.isfinite(val_loss) else 1e9)
        if args.max_steps and step >= args.max_steps:
            break
    print(f"done: {step} steps in {time.time() - t0:.0f}s "
          f"(best: {mgr.best})")


if __name__ == "__main__":
    main()
