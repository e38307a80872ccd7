"""PARE — part-attention SMPL regressor
(reference lib/pare/pare/models/{pare.py, head/pare_head.py}; loaded by the
demo via PARETester at lib/pare/pare/core/tester.py:28 for -hps_type pare).

Deployed configuration (the published checkpoint's hparams): HRNet-W32-conv
backbone, use_heatmaps='part_segm', keypoint attention, single-shot (non-
iterative) regression:

  features [B, 56, 56, 480]
  -> 2D part branch: 3x (conv3x3 256 + BN + ReLU) -> 1x1 -> J+1 part
     segmentation logits (background first, pare_head.py:809-826)
  -> 3D smpl branch: 3x (conv3x3 256 + BN + ReLU); smpl_final 1x1 -> 64
  -> keypoint attention: per-part softmax over pixels pools both feature
     maps to per-joint vectors (layers/keypoint_attention.py:44-63)
  -> pose: per-joint locally-connected 256 -> 6D rotation
     shape/cam: Linear(J*64 -> 10 / 3)  (pare_head.py:_pare_get_final_preds)
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

from icon_tpu.models.pare.hrnet import HRNet
from icon_tpu.models.pymaf.geometry import (identity_rot6d, rot6d_to_rotmat,
                                            weak_perspective_projection)


class LocallyConnected(nn.Module):
    """Per-joint independent linear map: [B, J, Cin] -> [B, J, Cout]
    (the reference's LocallyConnected2d with 1x1 kernel over [J, 1])."""

    out_ch: int

    @nn.compact
    def __call__(self, x):
        B, J, C = x.shape
        w = self.param("weight", nn.initializers.xavier_uniform(),
                       (J, C, self.out_ch))
        b = self.param("bias", nn.initializers.zeros, (J, self.out_ch))
        return jnp.einsum("bjc,jco->bjo", x, w) + b[None]


def keypoint_attention(features: jnp.ndarray,
                       heatmaps: jnp.ndarray) -> jnp.ndarray:
    """[B, H, W, C] x [B, H, W, J] -> [B, J, C]: per-part spatial softmax
    pooling (layers/keypoint_attention.py:44-63)."""
    B, H, W, C = features.shape
    J = heatmaps.shape[-1]
    attn = jax.nn.softmax(heatmaps.reshape(B, H * W, J), axis=1)
    return jnp.einsum("bpj,bpc->bjc", attn, features.reshape(B, H * W, C))


class PareHead(nn.Module):
    num_joints: int = 24
    num_features_smpl: int = 64
    conv_filters: Sequence[int] = (256, 256, 256)
    mean_pose6d: Any = None
    mean_shape: Any = None
    mean_cam: Any = None

    @nn.compact
    def __call__(self, features: jnp.ndarray, train: bool = False
                 ) -> Dict[str, jnp.ndarray]:
        B = features.shape[0]
        J = self.num_joints

        def conv_branch(name, x):
            for i, ch in enumerate(self.conv_filters):
                x = nn.Conv(ch, (3, 3), padding=1, use_bias=False,
                            name=f"{name}_conv{i}")(x)
                x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                 name=f"{name}_bn{i}")(x)
                x = nn.relu(x)
            return x

        part_feats = conv_branch("keypoint_deconv", features)
        smpl_feats = conv_branch("smpl_deconv", features)

        # part segmentation logits, background channel first
        segm = nn.Conv(J + 1, (1, 1), name="keypoint_final")(part_feats)
        part_attention = segm[..., 1:]

        cam_shape_feats = nn.Conv(self.num_features_smpl, (1, 1),
                                  name="smpl_final")(smpl_feats)

        point_local_feat = keypoint_attention(smpl_feats, part_attention)
        cam_shape = keypoint_attention(cam_shape_feats, part_attention)

        pred_pose6d = LocallyConnected(6, name="pose_mlp")(point_local_feat)
        # channel-major flatten: the reference flattens [B, C, J]
        # (pare_head.py torch.flatten(cam_shape_feats [B, 64, 24])), so the
        # shape/cam Linear weights are laid out c-major
        flat = jnp.swapaxes(cam_shape, 1, 2).reshape(B, -1)
        pred_shape = nn.Dense(10, name="shape_mlp")(flat)
        pred_cam = nn.Dense(3, name="cam_mlp")(flat)

        rotmat = rot6d_to_rotmat(pred_pose6d.reshape(B * J, 6)).reshape(
            B, J, 3, 3)
        return {
            "pred_pose": rotmat,
            "pred_shape": pred_shape,
            "pred_cam": pred_cam,
            "pred_segm_mask": segm,
        }


class PARE(nn.Module):
    smpl_forward: Callable
    backbone_width: int = 32
    stage_modules: Sequence[int] = (1, 4, 3)
    num_joints: int = 24

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False
                 ) -> Dict[str, jnp.ndarray]:
        feats = HRNet(width=self.backbone_width,
                      stage_modules=tuple(self.stage_modules),
                      name="backbone")(x, train)
        out = PareHead(num_joints=self.num_joints, name="head")(feats, train)
        verts, joints = self.smpl_forward(out["pred_shape"],
                                          out["pred_pose"])
        out["smpl_vertices"] = verts
        out["smpl_joints3d"] = joints
        out["smpl_joints2d"] = weak_perspective_projection(
            joints, out["pred_cam"])
        return out


def build_pare(backbone_width: int = 32,
               stage_modules: Sequence[int] = (1, 4, 3)):
    """PARE with real SMPL assets when installed, synthetic stand-in
    otherwise. Returns (net, body_model)."""
    from icon_tpu.models.pymaf.net import _synthetic_smpl24
    import os.path as osp
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

    def smpl_forward(betas, rotmats):
        v, j = body.forward(
            betas=betas,
            global_orient=rotmats[:, :1].reshape(-1, 9),
            body_pose=rotmats[:, 1:].reshape(rotmats.shape[0], -1),
            pose2rot=False)
        return v, j

    return PARE(smpl_forward=smpl_forward, backbone_width=backbone_width,
                stage_modules=tuple(stage_modules)), body
