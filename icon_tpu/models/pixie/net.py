"""PIXIE — SMPL-X whole-body estimator with part experts + moderators
(reference lib/pixielib/pixie.py:55-140; the demo's -hps_type pixie, loaded
at lib/dataset/TestDataset.py:104-109).

The demo path (`PIXIE.forward` with a body image, copy_and_paste=False)
is: body ResNet-50 encoder -> 2048-d feature; per part (head/hand) an
extractor MLP pulls a part feature out of the body feature; a moderator
(temperature-softmax fusion over the concatenated pair,
models/moderators.py:14-58) mixes it with the part-crop expert feature; MLP
regressors decode per-part SMPL-X parameters (continuous 6D rotations); the
SMPL-X body model decodes vertices. Here the part experts see the extractor
features when no crop pipeline runs (the moderator then fuses two views of
the body estimate) — the crop-expert encoders plug into ``expert_features``
when face/hand crops are available.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

from icon_tpu.models.pymaf.geometry import identity_rot6d, rot6d_to_rotmat
from icon_tpu.models.pymaf.resnet import ResNetBackbone


class MLPStack(nn.Module):
    channels: Sequence[int]
    last_op: Optional[str] = None

    @nn.compact
    def __call__(self, x):
        for i, c in enumerate(self.channels):
            x = nn.Dense(c, name=f"fc{i}")(x)
            if i != len(self.channels) - 1:
                x = nn.relu(x)
        if self.last_op == "sigmoid":
            x = nn.sigmoid(x)
        return x


class TempSoftmaxFusion(nn.Module):
    """Moderator (models/moderators.py:14-58): an MLP on [x, y] produces two
    temperature-softmax weights; output = w0*x + w1*y."""

    channels: Sequence[int] = (1024,)

    @nn.compact
    def __call__(self, x, y):
        f = jnp.concatenate([x, y], axis=-1)
        logits = MLPStack(tuple(self.channels) + (2,), name="mlp")(f)
        temp = self.param("temperature", nn.initializers.ones, ())
        w = jax.nn.softmax(logits * temp, axis=-1)
        return x * w[:, 0:1] + y * w[:, 1:2], w


# per-part parameter layout (pixielib param_list_dict, 6D rotations)
BODY_PARAMS = {
    "shape": 10, "exp": 10, "global_pose6d": 6, "body_pose6d": 21 * 6,
    "cam": 3,
}
HEAD_PARAMS = {"jaw_pose6d": 6, "exp": 10}
HAND_PARAMS = {"left_hand6d": 12, "right_hand6d": 12}


def _split(vec, layout):
    out = {}
    i = 0
    for k, d in layout.items():
        out[k] = vec[:, i:i + d]
        i += d
    return out


class PIXIE(nn.Module):
    smplx_forward: Callable
    backbone_width: int = 64
    backbone_layers: Sequence[int] = (3, 4, 6, 3)

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False,
                 expert_features: Optional[Dict[str, jnp.ndarray]] = None
                 ) -> Dict[str, jnp.ndarray]:
        """x [B, 224, 224, 3]; optional expert_features['head'/'hand']
        [B, 2048] from crop encoders."""
        B = x.shape[0]
        _, g = ResNetBackbone(layers=tuple(self.backbone_layers),
                              width=self.backbone_width,
                              name="encoder_body")(x, train)

        feat_dim = g.shape[-1]
        body_vec = MLPStack((1024, 1024, sum(BODY_PARAMS.values())),
                            name="regressor_body")(g)
        body = _split(body_vec, BODY_PARAMS)

        parts = {}
        for part, layout in (("head", HEAD_PARAMS), ("hand", HAND_PARAMS)):
            extracted = MLPStack((1024, feat_dim),
                                 name=f"extractor_{part}")(g)
            expert = expert_features.get(part) if expert_features else None
            if expert is None:
                expert = extracted
            fused, w = TempSoftmaxFusion(name=f"moderator_{part}")(
                extracted, expert)
            vec = MLPStack((1024, sum(layout.values())),
                           name=f"regressor_{part}")(fused)
            parts.update(_split(vec, layout))

        def to_rotmat(p6d, n):
            return rot6d_to_rotmat(
                p6d.reshape(B * n, 6) +
                identity_rot6d(1)[None]).reshape(B, n, 3, 3)

        global_pose = to_rotmat(body["global_pose6d"], 1)
        body_pose = to_rotmat(body["body_pose6d"], 21)
        jaw_pose = to_rotmat(parts["jaw_pose6d"], 1)

        verts, joints = self.smplx_forward(
            body["shape"], body_pose, global_pose, jaw_pose,
            parts["exp"] + body["exp"],
            parts["left_hand6d"], parts["right_hand6d"])

        cam = body["cam"] + jnp.array([0.9, 0.0, 0.0])
        return {
            "shape": body["shape"],
            "exp": parts["exp"] + body["exp"],
            "global_pose": global_pose,
            "body_pose": body_pose,
            "jaw_pose": jaw_pose,
            "left_hand_pose": parts["left_hand6d"],
            "right_hand_pose": parts["right_hand6d"],
            "vertices": verts,
            "joints": joints,
            "cam": cam,
        }


def build_pixie(backbone_width: int = 64,
                backbone_layers: Sequence[int] = (3, 4, 6, 3)):
    """PIXIE with the real SMPL-X model when installed, synthetic stand-in
    otherwise. Returns (net, body_model)."""
    from icon_tpu.models.smplx.assets import get_smpl_model
    from icon_tpu.models.smplx.lbs import batch_rodrigues

    body = get_smpl_model("smplx", "neutral")

    def smplx_forward(betas, body_pose, global_pose, jaw_pose, exp,
                      lhand, rhand):
        B = betas.shape[0]
        v, j = body.forward(
            betas=betas,
            global_orient=_rotmat_to_aa(global_pose.reshape(B, 3, 3)),
            body_pose=_rotmats_to_aa(body_pose),
            jaw_pose=_rotmat_to_aa(jaw_pose.reshape(B, 3, 3)),
            expression=exp,
            left_hand_pose=lhand, right_hand_pose=rhand)
        return v, j

    net = PIXIE(smplx_forward=smplx_forward, backbone_width=backbone_width,
                backbone_layers=tuple(backbone_layers))
    return net, body


def _rotmat_to_aa(R):
    from icon_tpu.models.pymaf.geometry import rotmat_to_angle_axis
    return rotmat_to_angle_axis(R)


def _rotmats_to_aa(R):
    from icon_tpu.models.pymaf.geometry import rotmat_to_angle_axis
    B, J = R.shape[:2]
    return rotmat_to_angle_axis(R.reshape(B * J, 3, 3)).reshape(B, J * 3)
