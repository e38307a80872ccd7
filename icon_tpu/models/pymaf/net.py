"""PyMAF — pyramidal mesh-alignment-feedback SMPL regressor
(reference lib/pymaf/models/pymaf_net.py; the default `-hps_type` the demo
loads at lib/dataset/TestDataset.py:90-109).

Architecture (pymaf_net.py:166-343):
  ResNet-50 -> (s_feat 7x7x2048, g_feat 2048)
  3 deconv stages (4x4 s2, 256ch) build a 14/28/56 feature pyramid
  iteration 0: a 21x21 grid of points samples the first pyramid level
  iterations 1..2: the current SMPL estimate's 431 downsampled vertices are
    weak-perspective projected and sample the next level (mesh-aligned
    feedback), each through a Conv1d MLP (256,128,64,5) with input skip
  each iteration runs one Regressor step: fc(feat+pose6d+betas+cam) ->
    residual updates of (pose 24x6D, betas 10, cam 3)

The SMPL forward and the 6890->431 downsample matrix are injected —
real assets when installed, synthetic stand-ins otherwise (tests).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

from icon_tpu.models.pymaf.geometry import (identity_rot6d, rot6d_to_rotmat,
                                            rotmat_to_angle_axis,
                                            weak_perspective_projection)
from icon_tpu.models.pymaf.resnet import ResNetBackbone
from icon_tpu.ops.grid_sample import grid_sample_2d

NPOSE = 24 * 6


class MAFExtractor(nn.Module):
    """Mesh-aligned feature extraction + dim reduction
    (maf_extractor.py:20-140)."""

    mlp_dims: Sequence[int] = (256, 128, 64, 5)

    @nn.compact
    def __call__(self, feat_map: jnp.ndarray,
                 points2d: jnp.ndarray) -> jnp.ndarray:
        """feat_map [B, H, W, C]; points2d [B, N, 2] in [-1, 1].
        Returns [B, N * mlp_dims[-1]]."""
        y = grid_sample_2d(feat_map, points2d)          # [B, N, C]
        tmpy = y
        n = len(self.mlp_dims) - 1
        for i in range(n):
            inp = y if i == 0 else jnp.concatenate([y, tmpy], axis=-1)
            y = nn.Dense(self.mlp_dims[i + 1], name=f"conv{i}")(inp)
            if i != n - 1:
                y = nn.leaky_relu(y, 0.01)
        y = nn.relu(y)
        B = y.shape[0]
        # channel-major flatten: the reference's reduce_dim flattens
        # [B, C, N] (maf_extractor.py reduce_dim y.view(B, -1)), so the
        # regressor's fc1 weights are laid out c-major — a point-major
        # flatten here would permute a ported checkpoint's fc1 input
        return jnp.swapaxes(y, 1, 2).reshape(B, -1)


class Regressor(nn.Module):
    """Iterative residual SMPL parameter regressor (pymaf_net.py:18-107)."""

    smpl_forward: Callable  # (betas [B,10], rotmats [B,24,3,3]) -> (v, j)
    mean_pose6d: Any        # [NPOSE]
    mean_shape: Any         # [10]
    mean_cam: Any           # [3]

    @nn.compact
    def __call__(self, x: Optional[jnp.ndarray], batch_size: int,
                 init_pose=None, init_shape=None, init_cam=None,
                 run_fc: bool = True) -> Dict[str, jnp.ndarray]:
        B = batch_size
        pred_pose = jnp.broadcast_to(jnp.asarray(self.mean_pose6d),
                                     (B, NPOSE)) \
            if init_pose is None else init_pose
        pred_shape = jnp.broadcast_to(jnp.asarray(self.mean_shape), (B, 10)) \
            if init_shape is None else init_shape
        pred_cam = jnp.broadcast_to(jnp.asarray(self.mean_cam), (B, 3)) \
            if init_cam is None else init_cam

        if run_fc:
            xc = jnp.concatenate([x, pred_pose, pred_shape, pred_cam], 1)
            xc = nn.Dense(1024, name="fc1")(xc)
            xc = nn.Dense(1024, name="fc2")(xc)
            pred_pose = nn.Dense(NPOSE, name="decpose")(xc) + pred_pose
            pred_shape = nn.Dense(10, name="decshape")(xc) + pred_shape
            pred_cam = nn.Dense(3, name="deccam")(xc) + pred_cam

        rotmat = rot6d_to_rotmat(pred_pose).reshape(B, 24, 3, 3)
        verts, joints = self.smpl_forward(pred_shape, rotmat)
        kp2d = weak_perspective_projection(joints, pred_cam)
        pose_aa = rotmat_to_angle_axis(rotmat.reshape(-1, 3, 3)).reshape(
            B, 72)
        return {
            "theta": jnp.concatenate([pred_cam, pred_shape, pose_aa], 1),
            "verts": verts,
            "smpl_kp_3d": joints,
            "kp_2d": kp2d,
            "rotmat": rotmat,
            "pred_cam": pred_cam,
            "pred_shape": pred_shape,
            "pred_pose": pred_pose,
        }


class PyMAF(nn.Module):
    """Full PyMAF network. ``smpl_forward`` and ``dmap`` are injected."""

    smpl_forward: Callable
    dmap: Any                       # [431, V] downsample matrix (np)
    mean_pose6d: Any = None
    mean_shape: Any = None
    mean_cam: Any = None
    n_iter: int = 3
    maf_dims: Sequence[int] = (256, 128, 64, 5)
    backbone_layers: Sequence[int] = (3, 4, 6, 3)
    backbone_width: int = 64
    deconv_filters: Sequence[int] = (256, 256, 256)
    grid_size: int = 21

    def setup(self):
        self.feature_extractor = ResNetBackbone(
            layers=tuple(self.backbone_layers), width=self.backbone_width,
            name="feature_extractor")
        self.maf = [MAFExtractor(mlp_dims=tuple(self.maf_dims),
                                 name=f"maf_{i}")
                    for i in range(self.n_iter)]
        mp = jnp.asarray(self.mean_pose6d) if self.mean_pose6d is not None \
            else identity_rot6d(24)
        ms = jnp.asarray(self.mean_shape) if self.mean_shape is not None \
            else jnp.zeros((10,))
        mc = jnp.asarray(self.mean_cam) if self.mean_cam is not None \
            else jnp.array([0.9, 0.0, 0.0])
        self.regressors = [Regressor(smpl_forward=self.smpl_forward,
                                     mean_pose6d=mp, mean_shape=ms,
                                     mean_cam=mc, name=f"regressor_{i}")
                           for i in range(self.n_iter)]
        g = np.linspace(-1, 1, self.grid_size, dtype=np.float32)
        xv, yv = np.meshgrid(g, g, indexing="ij")
        self._points_grid = np.stack([xv.reshape(-1), yv.reshape(-1)],
                                     axis=-1)        # [gs*gs, 2] (x from xv)
        # torch ConvTranspose2d(k=4, s=2, p=1) parity: flax padding (2,2)
        # per dim doubles the spatial size exactly (verified numerically)
        self._tconvs = [nn.ConvTranspose(
            self.deconv_filters[i], (4, 4), strides=(2, 2),
            padding=((2, 2), (2, 2)), use_bias=False, transpose_kernel=True,
            name=f"deconv{i}_tconv") for i in range(self.n_iter)]
        self._tbns = [nn.BatchNorm(momentum=0.9, name=f"deconv{i}_bn")
                      for i in range(self.n_iter)]

    def deconv_stage(self, i: int, x: jnp.ndarray,
                     train: bool) -> jnp.ndarray:
        y = self._tconvs[i](x)
        y = self._tbns[i](y, use_running_average=not train)
        return nn.relu(y)

    def __call__(self, x: jnp.ndarray, train: bool = False
                 ) -> Dict[str, Any]:
        """x: [B, 224, 224, 3] ImageNet-normalized. Returns the reference's
        out_list['smpl_out'] (one dict per iteration, last is final)."""
        B = x.shape[0]
        s_feat, g_feat = self.feature_extractor(x, train)

        smpl_out = self.regressors[0](None, B, run_fc=False)
        outs = [smpl_out]

        for i in range(self.n_iter):
            pred_cam = jax.lax.stop_gradient(smpl_out["pred_cam"])
            pred_shape = jax.lax.stop_gradient(smpl_out["pred_shape"])
            pred_pose = jax.lax.stop_gradient(smpl_out["pred_pose"])

            s_feat = self.deconv_stage(i, s_feat, train)

            if i == 0:
                pts = jnp.broadcast_to(
                    jnp.asarray(self._points_grid)[None],
                    (B, self._points_grid.shape[0], 2))
                ref_feat = self.maf[i](s_feat, pts)
            else:
                verts_ds = jnp.einsum(
                    "dv,bvc->bdc", jnp.asarray(self.dmap),
                    jax.lax.stop_gradient(smpl_out["verts"]))
                pts = weak_perspective_projection(verts_ds, pred_cam)
                ref_feat = self.maf[i](s_feat, pts)

            smpl_out = self.regressors[i](
                ref_feat, B, init_pose=pred_pose, init_shape=pred_shape,
                init_cam=pred_cam)
            outs.append(smpl_out)
        return {"smpl_out": outs}


def build_pymaf(model_root: Optional[str] = None,
                backbone_width: int = 64,
                backbone_layers: Sequence[int] = (3, 4, 6, 3),
                n_betas: int = 10) -> Tuple[PyMAF, Any]:
    """Construct PyMAF with real assets when installed (SMPL male model,
    mesh_downsampling.npz, smpl_mean_params.npz under data/), else synthetic
    stand-ins. Returns (net, body_model)."""
    import os.path as osp
    from icon_tpu.models.smplx.assets import SMPLX, data_root
    from icon_tpu.models.smplx.body import (load_body_model,
                                            synthetic_smplx_model)

    reg = SMPLX()
    smpl_path = None
    for g in ("NEUTRAL", "MALE"):
        for ext in ("pkl", "npz"):
            p = osp.join(reg.model_dir, "smpl", f"SMPL_{g}.{ext}")
            if osp.exists(p):
                smpl_path = p
                break
        if smpl_path:
            break
    if smpl_path:
        body = load_body_model(smpl_path, model_type="smpl")
    else:
        body = _synthetic_smpl24()

    V = body.v_template.shape[0]
    ds_path = osp.join(data_root(), "smpl_related", "smpl_data",
                       "mesh_downsampling.npz")
    if osp.exists(ds_path):
        import scipy.sparse as sp
        data = np.load(ds_path, allow_pickle=True, encoding="latin1")
        D = data["D"]
        d0 = sp.coo_matrix(D[0]).todense()
        d1 = sp.coo_matrix(D[1]).todense()
        dmap = np.asarray(d1 @ d0, np.float32)          # [431, 6890]
    else:
        ids = np.linspace(0, V - 1, 431).astype(np.int32)
        dmap = np.zeros((431, V), np.float32)
        dmap[np.arange(431), ids] = 1.0

    mean_path = osp.join(data_root(), "smpl_related", "smpl_data",
                         "smpl_mean_params.npz")
    mp = ms = mc = None
    if osp.exists(mean_path):
        mean = np.load(mean_path)
        mp = mean["pose"].astype(np.float32).reshape(-1)
        ms = mean["shape"].astype(np.float32).reshape(-1)
        mc = mean["cam"].astype(np.float32).reshape(-1)

    def smpl_forward(betas, rotmats):
        v, j = body.forward(betas=betas,
                            global_orient=rotmats[:, :1].reshape(-1, 9),
                            body_pose=rotmats[:, 1:].reshape(
                                rotmats.shape[0], -1),
                            pose2rot=False)
        return v, j

    net = PyMAF(smpl_forward=smpl_forward, dmap=dmap,
                mean_pose6d=mp, mean_shape=ms, mean_cam=mc,
                backbone_width=backbone_width,
                backbone_layers=tuple(backbone_layers))
    return net, body


def _synthetic_smpl24(subdiv: int = 4):
    """24-joint SMPL-shaped synthetic model (no licensed assets)."""
    from icon_tpu.models.smplx.body import BodyModel
    from icon_tpu.utils.synthetic import synthetic_body
    rng = np.random.RandomState(11)
    v, faces = synthetic_body(subdiv=subdiv)
    V, J = len(v), 24
    shapedirs = rng.randn(V, 3, 10).astype(np.float32) * 0.01
    posedirs = (rng.randn(9 * (J - 1), V * 3) * 0.0005).astype(np.float32)
    Jr = rng.rand(J, V).astype(np.float32) ** 4
    Jr /= Jr.sum(1, keepdims=True)
    w = rng.rand(V, J).astype(np.float32) ** 4
    w /= w.sum(1, keepdims=True)
    parents = [0] + [max(0, j - 1) for j in range(1, J)]
    return BodyModel(jnp.asarray(v), jnp.asarray(shapedirs),
                     jnp.asarray(posedirs), jnp.asarray(Jr), jnp.asarray(w),
                     faces, tuple(parents), "smpl", 10)
