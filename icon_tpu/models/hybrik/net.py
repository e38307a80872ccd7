"""HybrIK — 3D-heatmap pose estimation + hybrid analytical IK
(reference lib/hybrik/models/simple3dpose.py:41-383, HybrIKBaseSMPLCam).

Pipeline (simple3dpose.forward :222-330):
  ResNet backbone -> 3 deconvs -> per-joint 3D heatmaps (D x H x W)
  -> soft-argmax over each axis -> uvd coords in [-0.5, 0.5]
  -> camera back-projection to root-relative xyz (2.2m unit cube)
  -> fc head from pooled features: betas residual, per-bone twists (phi),
     weak-perspective camera
  -> hybrik analytical IK (ik.py) -> SMPL rotation matrices -> LBS verts.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Sequence

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn


class BasicBlock(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm = lambda n: nn.BatchNorm(use_running_average=not train,
                                      momentum=0.9, name=n)
        out = nn.Conv(self.planes, (3, 3), strides=self.stride, padding=1,
                      use_bias=False, name="conv1")(x)
        out = nn.relu(norm("bn1")(out))
        out = nn.Conv(self.planes, (3, 3), padding=1, use_bias=False,
                      name="conv2")(out)
        out = norm("bn2")(out)
        if self.downsample:
            res = nn.Conv(self.planes, (1, 1), strides=self.stride,
                          use_bias=False, name="downsample_conv")(x)
            res = norm("downsample_bn")(res)
        else:
            res = x
        return nn.relu(out + res)


class ResNet34(nn.Module):
    """BasicBlock ResNet (layers (3,4,6,3) = ResNet-34); returns the final
    feature map [B, 7, 7, 8w]."""

    layers: Sequence[int] = (3, 4, 6, 3)
    width: int = 64

    @nn.compact
    def __call__(self, x, train: bool = False):
        w = self.width
        x = nn.Conv(w, (7, 7), strides=2, padding=3, use_bias=False,
                    name="conv1")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         name="bn1")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        for si, (p, n) in enumerate(zip((w, 2 * w, 4 * w, 8 * w),
                                        self.layers)):
            for bi in range(n):
                stride = 2 if (si > 0 and bi == 0) else 1
                x = BasicBlock(p, stride=stride,
                               downsample=bi == 0 and si > 0,
                               name=f"layer{si + 1}_{bi}")(x, train)
        return x


class HybrIK(nn.Module):
    """smpl_forward(betas, rotmats [B,24,3,3]) -> (verts, joints).

    ``num_hm_joints`` = 29 heatmap joints (24 SMPL + ankle/wrist/head leaf
    extensions, reference hybrik_config NUM_JOINTS); the analytical IK here
    consumes the 24 SMPL joints — the reference feeds all 29 to its IK
    where the 5 leaves only refine leaf-adjacent twists that the predicted
    ``phi`` already parameterizes (simple3dpose.py:325-330)."""

    smpl_forward: Callable
    rest_joints: Any                    # [24, 3] template joints (np)
    parents: Sequence[int]
    num_joints: int = 24
    num_hm_joints: int = 29
    depth_dim: int = 64
    heatmap_size: int = 64
    backbone_layers: Sequence[int] = (3, 4, 6, 3)
    backbone_width: int = 64
    deconv_filters: Sequence[int] = (256, 256, 256)
    focal_length: float = 1000.0
    input_size: float = 256.0

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False
                 ) -> Dict[str, jnp.ndarray]:
        B = x.shape[0]
        J = self.num_hm_joints
        feat = ResNet34(layers=tuple(self.backbone_layers),
                        width=self.backbone_width, name="preact")(x, train)

        h = feat
        for i, ch in enumerate(self.deconv_filters):
            # torch ConvTranspose2d(k=4, s=2, p=1) parity (see pymaf/net.py)
            h = nn.ConvTranspose(ch, (4, 4), strides=(2, 2),
                                 padding=((2, 2), (2, 2)), use_bias=False,
                                 transpose_kernel=True,
                                 name=f"deconv{i}")(h)
            h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             name=f"deconv_bn{i}")(h)
            h = nn.relu(h)
        hm = nn.Conv(J * self.depth_dim, (1, 1), name="final_layer")(h)

        # soft-argmax over (z, y, x) (simple3dpose.py:237-268)
        D, S = self.depth_dim, self.heatmap_size
        hm = hm.reshape(B, S, S, J, D)             # [B, y, x, J, z]
        hm = hm.transpose(0, 3, 4, 1, 2).reshape(B, J, -1)
        hm = jax.nn.softmax(hm, axis=-1).reshape(B, J, D, S, S)
        rng_d = jnp.arange(D, dtype=jnp.float32)
        rng_s = jnp.arange(S, dtype=jnp.float32)
        coord_z = jnp.einsum("bjdhw,d->bj", hm, rng_d) / D - 0.5
        coord_y = jnp.einsum("bjdhw,h->bj", hm, rng_s) / S - 0.5
        coord_x = jnp.einsum("bjdhw,w->bj", hm, rng_s) / S - 0.5
        uvd = jnp.stack([coord_x, coord_y, coord_z], -1)   # [B, J, 3]

        # reference heads have NO activation between fc1/fc2 (only
        # dropout, simple3dpose.py:276-281) and add the h36m mean-shape
        # buffer to the shape delta
        g = jnp.mean(feat, axis=(1, 2))
        xc = nn.Dense(1024, name="fc1")(g)
        xc = nn.Dense(1024, name="fc2")(xc)
        init_shape = self.param("init_shape",
                                nn.initializers.zeros, (10,))
        pred_shape = nn.Dense(10, name="decshape")(xc) + init_shape[None]
        JS = self.num_joints
        pred_phi = nn.Dense((JS - 1) * 2, name="decphi")(xc).reshape(
            B, JS - 1, 2)
        pred_cam = nn.Dense(3, name="deccam")(xc) + jnp.array([0.9, 0, 0])

        # camera back-projection (simple3dpose.py:286-302): xy pixels ->
        # meters at predicted depth minus the camera translation,
        # root-relative
        cam_scale = pred_cam[:, :1][:, None]
        cam_trans = pred_cam[:, None, 1:]
        cam_depth = self.focal_length / (self.input_size * cam_scale + 1e-9)
        xyz_z = uvd[..., 2:]
        xyz_xy = ((uvd[..., :2] * self.input_size / self.focal_length)
                  * (xyz_z * 2.2 + cam_depth) - cam_trans) / 2.2
        xyz = jnp.concatenate([xyz_xy, xyz_z], -1)
        xyz = xyz - xyz[:, :1]

        from icon_tpu.models.hybrik.ik import hybrik_ik
        rest = jnp.broadcast_to(jnp.asarray(self.rest_joints)[None],
                                (B, JS, 3))
        rotmats = hybrik_ik(xyz[:, :JS] * 2.2, pred_phi, rest,
                            self.parents)

        verts, joints = self.smpl_forward(pred_shape, rotmats)
        return {
            "pred_theta_mats": rotmats,
            "pred_shape": pred_shape,
            "pred_phi": pred_phi,
            "pred_camera": pred_cam,
            "pred_uvd_jts": uvd,
            "pred_xyz_jts": xyz,
            "pred_vertices": verts,
            "pred_joints": joints,
        }


def build_hybrik(backbone_width: int = 64,
                 backbone_layers: Sequence[int] = (3, 4, 6, 3)):
    """HybrIK with real SMPL assets when installed, synthetic otherwise."""
    import os.path as osp
    from icon_tpu.models.pymaf.net import _synthetic_smpl24
    from icon_tpu.models.smplx.assets import SMPLX
    from icon_tpu.models.smplx.body import load_body_model

    reg = SMPLX()
    body = None
    for g in ("NEUTRAL", "MALE"):
        for ext in ("npz", "pkl"):
            p = osp.join(reg.model_dir, "smpl", f"SMPL_{g}.{ext}")
            if osp.exists(p):
                body = load_body_model(p, model_type="smpl")
                break
        if body is not None:
            break
    if body is None:
        body = _synthetic_smpl24()

    rest = np.asarray(jnp.einsum(
        "jv,vc->jc", body.J_regressor, body.v_template))

    def smpl_forward(betas, rotmats):
        v, j = body.forward(
            betas=betas,
            global_orient=rotmats[:, :1].reshape(-1, 9),
            body_pose=rotmats[:, 1:].reshape(rotmats.shape[0], -1),
            pose2rot=False)
        return v, j

    net = HybrIK(smpl_forward=smpl_forward, rest_joints=rest,
                 parents=tuple(body.parents),
                 num_joints=len(body.parents),
                 num_hm_joints=len(body.parents) + 5,
                 backbone_width=backbone_width,
                 backbone_layers=tuple(backbone_layers))
    return net, body
