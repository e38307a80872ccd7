"""Geometry-network training step (reference apps/ICON.py:127-236).

Optimizer: RMSprop(lr_G) with MultiStep decay (configure_optimizers,
ICON.py:127-176). The step is a pure function jitted over a data mesh: batch
sharded on axis 0, params replicated — XLA derives the gradient all-reduce
and global (sync) batch-norm statistics from the shardings, replacing
Lightning's DDP/NCCL + sync_batchnorm flags (apps/train.py:117-121).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import core, struct

from icon_tpu.config import Config


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: core.FrozenDict
    batch_stats: core.FrozenDict
    opt_state: optax.OptState
    tx: optax.GradientTransformation = struct.field(pytree_node=False)
    apply_fn: Any = struct.field(pytree_node=False)


def make_optimizer(cfg: Config, steps_per_epoch: int = 1000,
                   lr: Optional[float] = None):
    """RMSprop/Adam + piecewise lr decay at cfg.schedule epochs."""
    base_lr = lr if lr is not None else cfg.lr_G
    boundaries = {int(e) * steps_per_epoch: cfg.gamma for e in cfg.schedule}
    sched = optax.piecewise_constant_schedule(base_lr, boundaries)
    if cfg.optim.lower() == "rmsprop":
        tx = optax.rmsprop(sched, momentum=cfg.momentum or 0.0)
    elif cfg.optim.lower() == "adam":
        tx = optax.adam(sched)
    else:
        tx = optax.sgd(sched, momentum=cfg.momentum or 0.0)
    if cfg.weight_decay:
        tx = optax.chain(optax.add_decayed_weights(cfg.weight_decay), tx)
    return tx


def create_train_state(net, rng, example_batch, cfg: Config,
                       steps_per_epoch: int = 1000) -> TrainState:
    # jit: eager flax init dispatches hundreds of tiny ops, each a
    # separate XLA compile on a tunneled device (minutes of cold start)
    variables = jax.jit(lambda r, b: net.init(r, b, train=True))(
        rng, example_batch)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", core.FrozenDict())
    tx = make_optimizer(cfg, steps_per_epoch)
    return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                      batch_stats=batch_stats, opt_state=tx.init(params),
                      tx=tx, apply_fn=net.apply)


def train_step(state: TrainState,
               batch: Dict[str, jnp.ndarray]) -> Tuple[TrainState, Dict]:
    """One optimizer step; returns (new_state, metrics)."""

    def loss_fn(params):
        variables = {"params": params, "batch_stats": state.batch_stats}
        (pred, err), updates = state.apply_fn(
            variables, batch, train=True, mutable=["batch_stats"])
        return err, (pred, updates)

    (loss, (pred, updates)), grads = jax.value_and_grad(
        loss_fn, has_aux=True)(state.params)
    new_updates, new_opt = state.tx.update(grads, state.opt_state,
                                           state.params)
    new_params = optax.apply_updates(state.params, new_updates)
    new_state = state.replace(step=state.step + 1, params=new_params,
                              opt_state=new_opt,
                              batch_stats=updates.get("batch_stats",
                                                      state.batch_stats))
    # occupancy accuracy/IoU at 0.5 (reference Evaluator.calc_acc,
    # lib/dataset/Evaluator.py:232-263)
    metrics = {"loss": loss}
    metrics.update(_occ_metrics(pred, batch))
    return new_state, metrics


def _occ_metrics(pred, batch):
    if "label" not in batch:
        return {}
    hard = (pred > 0.5).astype(jnp.float32)
    lab = (batch["label"] > 0.5).astype(jnp.float32)
    inter = jnp.sum(hard * lab)
    union = jnp.sum(jnp.maximum(hard, lab))
    return {"acc": jnp.mean((hard == lab).astype(jnp.float32)),
            "iou": inter / jnp.maximum(union, 1.0)}


def eval_step(state: TrainState,
              batch: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
    """Validation loss/acc without a parameter update (reference
    validation_step, apps/ICON.py:238-283)."""
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    pred, err = state.apply_fn(variables, batch, train=False)
    metrics = {"loss": err}
    metrics.update(_occ_metrics(pred, batch))
    return metrics
