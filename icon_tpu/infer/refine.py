"""The two per-image optimization loops of the demo (reference apps/infer.py).

1. **SMPL refinement** (infer.py:123-273, HOT LOOP 1): optimize SMPL
   pose/shape/orient/translation so the *body* normal renders match the
   predicted *cloth* normal maps + silhouette. One jitted optax step;
   gradients flow through LBS and the differentiable rasterizer.
2. **Cloth refinement** (infer.py:431-505, HOT LOOP 3): per-vertex LocalAffine
   deformation of the reconstructed mesh against the predicted normals, with
   laplacian/edge/normal-consistency priors (mesh_util.py:168-184) and
   stiffness/rigidity regularizers.
"""

from __future__ import annotations

import functools
from typing import Callable, Dict, NamedTuple, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import optax

from icon_tpu.models.local_affine import (apply_local_affine,
                                          init_local_affine, rigid_loss,
                                          stiffness_loss)
from icon_tpu.models.smplx.body import BodyModel
from icon_tpu.ops.mesh_losses import (edge_face_adjacency, edge_length_loss,
                                      laplacian_loss, mesh_edges,
                                      normal_consistency_loss)
from icon_tpu.render.render import render_normal, render_silhouette


class SmplRefineState(NamedTuple):
    params: Dict[str, jnp.ndarray]
    opt_state: optax.OptState


def make_smpl_refine_step(body_model: BodyModel,
                          faces: np.ndarray,
                          goal_normal_F: jnp.ndarray,
                          goal_normal_B: jnp.ndarray,
                          goal_mask: jnp.ndarray,
                          lr: float = 1e-2,
                          size: int = 512,
                          scale: Optional[jnp.ndarray] = None,
                          w_normal: float = 1.0,
                          w_sil: float = 1.0):
    """Build (init_state, jitted step). Optimized params: betas, body_pose,
    global_orient, trans (infer.py:150-171)."""
    tx = optax.adam(lr)
    faces_j = jnp.asarray(faces)

    def forward_verts(params):
        verts, _ = body_model.forward(
            betas=params["betas"], global_orient=params["global_orient"],
            body_pose=params["body_pose"], transl=params["trans"],
            scale=scale)
        return verts[0]

    def loss_fn(params):
        verts = forward_verts(params)
        nF, mF = render_normal(verts, faces_j, size=size, azimuth=0.0)
        nB, mB = render_normal(verts, faces_j, size=size, azimuth=180.0)
        sil = render_silhouette(verts, faces_j, size=size, azimuth=0.0)

        # normal L1 on the joint support (reference diff masks overlap)
        lossN = jnp.mean(jnp.abs(nF - goal_normal_F)) + \
            jnp.mean(jnp.abs(nB - goal_normal_B))
        lossS = jnp.mean(jnp.abs(sil - goal_mask))
        return w_normal * lossN + w_sil * lossS

    @jax.jit
    def step(state: SmplRefineState):
        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return SmplRefineState(params, opt_state), loss

    def init(betas, body_pose, global_orient, trans) -> SmplRefineState:
        params = {"betas": jnp.asarray(betas),
                  "body_pose": jnp.asarray(body_pose),
                  "global_orient": jnp.asarray(global_orient),
                  "trans": jnp.asarray(trans)}
        return SmplRefineState(params, tx.init(params))

    return init, step, forward_verts


def refine_smpl(body_model: BodyModel, faces: np.ndarray,
                init_params: Dict[str, np.ndarray],
                goal_normal_F: jnp.ndarray, goal_normal_B: jnp.ndarray,
                goal_mask: jnp.ndarray, iters: int = 100,
                lr: float = 1e-2, size: int = 512,
                scale: Optional[jnp.ndarray] = None):
    """Run the loop; returns (refined params dict, final verts, losses)."""
    init, step, forward_verts = make_smpl_refine_step(
        body_model, faces, goal_normal_F, goal_normal_B, goal_mask,
        lr=lr, size=size, scale=scale)
    state = init(**init_params)
    losses = []
    for _ in range(iters):
        state, loss = step(state)
        losses.append(loss)
    verts = forward_verts(state.params)
    return state.params, verts, [float(l) for l in losses]


# ---------------------------------------------------------------------------


def refine_smpl_live(body_model: BodyModel,
                     faces: np.ndarray,
                     image: jnp.ndarray,
                     init: Dict[str, jnp.ndarray],
                     normal_fn: Callable[[Dict[str, jnp.ndarray]],
                                         Tuple[jnp.ndarray, jnp.ndarray]],
                     scale: float,
                     iters: int = 100,
                     lr: float = 1e-3,
                     size: int = 512,
                     patience: int = 5,
                     w_normal: float = 1.0,
                     w_sil: float = 1.0,
                     raster_k: int = 96,
                     mask: Optional[jnp.ndarray] = None,
                     capture_every: int = 0):
    """The faithful SMPL body-fitting loop (reference apps/infer.py:123-273):

    - pose/orient are optimized directly as rotation matrices
      (pose2rot=False, infer.py:174-181);
    - the cloth-normal targets are RE-predicted every iteration because the
      normal net's T_normal inputs evolve with the body (infer.py:200-210);
    - the silhouette term compares BOTH front and back body masks against
      masks derived from the predicted normal maps (non-background pixels,
      infer.py:219-231);
    - SGD(momentum 0.9) with reduce-on-plateau(0.5, patience) scheduling
      (infer.py:136-148). The reference's normal term sums the front diff
      twice (infer.py:216 uses diff_F twice — an apparent typo); here F and
      B both contribute.

    ``init``: betas [1,10], body_pose [1,J-1,3,3], global_orient [1,1,3,3],
    trans [3]. Returns (refined verts [V,3] in render space, final predicted
    (normal_F, normal_B), loss history, final params — the optimized
    pose/betas feed PaMIR's voxelization, reference infer.py:379-388 —
    and the captured progression frames).

    ``capture_every`` > 0 snapshots a uint8 panel row
    [input | body T_normal_F | predicted cloth normal_F] every k-th
    iteration plus the last (the reference's refinement gif frames,
    apps/infer.py:275-321 per_loop_lst); 0 captures nothing.
    """
    faces_j = jnp.asarray(faces)
    tx = optax.chain(
        optax.sgd(lr, momentum=0.9),
        optax.contrib.reduce_on_plateau(factor=0.5, patience=patience,
                                        min_scale=1e-2))

    def forward_verts(params):
        nb = params["body_pose"].shape[1]
        verts, _ = body_model.forward(
            betas=params["betas"],
            global_orient=params["global_orient"].reshape(1, 9),
            body_pose=params["body_pose"].reshape(1, nb * 9),
            pose2rot=False)
        return (verts[0] + params["trans"][None]) * scale

    # Three SMALL executables per iteration instead of one monolith:
    # fusing the normal-net forward with the raster gradients made XLA's
    # compile superlinear (the fused step took 28 min to compile on v5e
    # while the pieces take ~40 s total: raster fwd+grad 11.6 s, net fwd
    # 30.9 s, measured via jax_log_compiles).
    @jax.jit
    def render_targets(params):
        verts = forward_verts(params)
        from icon_tpu.render.render import render_normal_sil
        T_nF, _, _ = render_normal_sil(verts, faces_j, size=size,
                                       azimuth=0.0, K=raster_k)
        T_nB, _, _ = render_normal_sil(verts, faces_j, size=size,
                                       azimuth=180.0, K=raster_k)
        return T_nF, T_nB

    normal_jit = jax.jit(lambda t: normal_fn(t))

    def predict(params):
        """Normal-net targets for one iteration (fwd only)."""
        T_nF, T_nB = render_targets(params)
        nF, nB = normal_jit({"image": image[None], "T_normal_F": T_nF[None],
                             "T_normal_B": T_nB[None]})
        return nF[0], nB[0], T_nF

    def loss_fn(params, nF, nB):
        verts = forward_verts(params)
        # one rasterization per view covers the normal AND silhouette
        # terms (render_normal_sil); nF/nB arrive as constants from
        # ``predict`` so no gradient flows into the normal net
        from icon_tpu.render.render import render_normal_sil
        T_nF, _, silF = render_normal_sil(verts, faces_j, size=size,
                                          azimuth=0.0, K=raster_k)
        T_nB, _, silB = render_normal_sil(verts, faces_j, size=size,
                                          azimuth=180.0, K=raster_k)

        lossN = jnp.mean(jnp.abs(T_nF - nF)) + jnp.mean(jnp.abs(T_nB - nB))
        # goal masks: the input matte when available, else the predicted
        # normals' non-background support. The reference derives them from
        # the predicted normals (infer.py:219-231) which its NormalNet masks
        # by the image matte (NormalNet.py:93-97) — identical support; the
        # explicit matte stays correct even if predictions were unmasked.
        if mask is not None:
            gtF = gtB = (mask > 0.5).astype(jnp.float32)
        else:
            gtF = (jnp.sum(jnp.abs(nF), axis=-1) > 1e-6).astype(jnp.float32)
            gtB = (jnp.sum(jnp.abs(nB), axis=-1) > 1e-6).astype(jnp.float32)
        lossS = 0.5 * (jnp.mean(jnp.abs(silF - gtF)) +
                       jnp.mean(jnp.abs(silB - gtB)))
        return w_normal * lossN + w_sil * lossS

    @jax.jit
    def step(params, opt_state, nF, nB):
        loss, grads = jax.value_and_grad(loss_fn)(params, nF, nB)
        updates, opt_state = tx.update(grads, opt_state, params, value=loss)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    def to_u8(img):
        return (np.clip(np.asarray(img) * 0.5 + 0.5, 0, 1)
                * 255).astype(np.uint8)

    params = {k: jnp.asarray(v) for k, v in init.items()}
    opt_state = tx.init(params)
    losses = []
    frames = []
    nF = nB = None
    for i in range(iters):
        nF, nB, T_nF = predict(params)
        if capture_every and (i % capture_every == 0 or i == iters - 1):
            frames.append(np.concatenate(
                [to_u8(image), to_u8(T_nF), to_u8(nF)], axis=1))
        params, opt_state, loss = step(params, opt_state, nF, nB)
        losses.append(float(loss))
    verts = jax.jit(forward_verts)(params)
    return np.asarray(verts), (nF, nB), losses, params, frames


def refine_cloth(verts: np.ndarray, faces: np.ndarray,
                 goal_normal_F: jnp.ndarray, goal_normal_B: jnp.ndarray,
                 iters: int = 200, lr: float = 1e-4, size: int = 512,
                 w_cloth: float = 1e1, w_stiff: float = 1e5,
                 w_rigid: float = 1e5, w_lap: float = 1e2,
                 w_edge: float = 0.0, w_nc: float = 1e1):
    """LocalAffine cloth refinement (infer.py:431-505; default loss weights
    follow the reference's anneal targets). Returns refined verts."""
    edges = jnp.asarray(mesh_edges(faces))
    fpairs = jnp.asarray(edge_face_adjacency(faces))
    verts0 = jnp.asarray(verts)
    faces_j = jnp.asarray(faces)
    tx = optax.adam(lr)

    def loss_fn(params):
        deformed = apply_local_affine(params, verts0)
        nF, _ = render_normal(deformed, faces_j, size=size, azimuth=0.0)
        nB, _ = render_normal(deformed, faces_j, size=size, azimuth=180.0)
        l_cloth = jnp.mean(jnp.abs(nF - goal_normal_F)) + \
            jnp.mean(jnp.abs(nB - goal_normal_B))
        l = (w_cloth * l_cloth +
             w_stiff * stiffness_loss(params, edges) +
             w_rigid * rigid_loss(params) +
             w_lap * laplacian_loss(deformed, edges) +
             w_nc * normal_consistency_loss(deformed, faces_j, fpairs))
        if w_edge:
            l += w_edge * edge_length_loss(deformed, edges)
        return l

    @jax.jit
    def step(params, opt_state):
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    params = init_local_affine(verts0.shape[0])
    opt_state = tx.init(params)
    losses = []
    for _ in range(iters):
        params, opt_state, loss = step(params, opt_state)
        losses.append(loss)
    return np.asarray(apply_local_affine(params, verts0)), \
        [float(l) for l in losses]
