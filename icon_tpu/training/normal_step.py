"""NormalNet training step (reference apps/Normal.py).

The reference runs *manual optimization* with two Adam optimizers, one per
generator, because the front/back losses are separate (Normal.py:37-115).
Since each loss only touches its own generator's params, a single Adam over
the combined loss ``L_F + L_B`` performs the identical update (Adam is
per-parameter); we keep that simpler form.

Loss: 5 * SmoothL1(pred, gt) per side (NormalNet.get_norm_error,
NormalNet.py:101-122). The reference adds a VGG perceptual term computed
under ``torch.no_grad()`` — it contributes **no gradient** there, only a
loss *value* (which drives its val-loss checkpoint selection). When VGG19
weights are installed (models/vgg.py), ``normal_eval_step`` adds the same
term so val losses are comparable to the reference's.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import core, struct

from icon_tpu.models.hgpifu import smooth_l1
from icon_tpu.models.normalnet import NormalNet


class NormalTrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: core.FrozenDict
    opt_state: optax.OptState
    tx: optax.GradientTransformation = struct.field(pytree_node=False)
    apply_fn: any = struct.field(pytree_node=False)


def create_normal_state(net: NormalNet, rng, example_batch,
                        lr: float = 2e-4,
                        schedule=(), gamma: float = 0.1,
                        steps_per_epoch: int = 1000) -> NormalTrainState:
    variables = jax.jit(lambda r, b: net.init(r, b, train=True))(
        rng, example_batch)
    boundaries = {int(e) * steps_per_epoch: gamma for e in schedule}
    sched = optax.piecewise_constant_schedule(lr, boundaries)
    tx = optax.adam(sched)
    params = variables["params"]
    return NormalTrainState(step=jnp.zeros((), jnp.int32), params=params,
                            opt_state=tx.init(params), tx=tx,
                            apply_fn=net.apply)


def normal_train_step(state: NormalTrainState,
                      batch: Dict[str, jnp.ndarray]
                      ) -> Tuple[NormalTrainState, Dict[str, jnp.ndarray]]:
    def loss_fn(params):
        nmlF, nmlB = state.apply_fn({"params": params}, batch, train=True)
        lF = 5.0 * smooth_l1(nmlF, batch["normal_F"])
        lB = 5.0 * smooth_l1(nmlB, batch["normal_B"])
        return lF + lB, (lF, lB)

    (loss, (lF, lB)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        state.params)
    updates, opt_state = state.tx.update(grads, state.opt_state, state.params)
    params = optax.apply_updates(state.params, updates)
    return (state.replace(step=state.step + 1, params=params,
                          opt_state=opt_state),
            {"loss": loss, "loss_F": lF, "loss_B": lB})


def normal_eval_step(state: NormalTrainState,
                     batch: Dict[str, jnp.ndarray],
                     vgg=None) -> Dict[str, jnp.ndarray]:
    """Validation loss (reference Normal.py validation_step): per side
    5*SmoothL1 (+ the no-grad VGG perceptual value when ``vgg`` is
    ``(apply_fn, params)``)."""
    nmlF, nmlB = state.apply_fn({"params": state.params}, batch, train=False)
    lF = 5.0 * smooth_l1(nmlF, batch["normal_F"])
    lB = 5.0 * smooth_l1(nmlB, batch["normal_B"])
    metrics = {"loss_F": lF, "loss_B": lB}
    if vgg is not None:
        from icon_tpu.models.vgg import vgg_perceptual_loss
        apply_fn, vgg_params = vgg
        lF = lF + vgg_perceptual_loss(apply_fn, vgg_params, nmlF,
                                      batch["normal_F"])
        lB = lB + vgg_perceptual_loss(apply_fn, vgg_params, nmlB,
                                      batch["normal_B"])
    # reference val_loss = error_NF + error_NB (Normal.py:199)
    metrics["loss"] = lF + lB
    return metrics
