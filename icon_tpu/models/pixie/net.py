"""PIXIE — SMPL-X whole-body estimator with part experts + moderators
(reference lib/pixielib/pixie.py; the demo's -hps_type pixie, built at
lib/dataset/TestDataset.py:100-102).

Faithful re-implementation of the deployed inference graph
(``PIXIE.encode`` with a body image, threthold=True, keep_local=True,
copy_and_paste=False — pixie.py:189-357):

1. body HRNet-W48 encoder -> 2048-d feature (encoders.py:51-72);
2. per part (head / left_hand / right_hand) an extractor Linear pulls a
   part-share feature out of the body feature (pixie.py:239-242);
3. a coarse body estimate is decoded and used to crop head/hand regions
   from the high-res image (pixie.py:244-284, part_from_body);
4. ResNet-50 part experts encode the crops (left hand flipped to right,
   pixie.py:287-295); moderators (temperature-softmax fusion,
   models/moderators.py:14-58) mix part-share and expert features —
   for hands, an expert weight > 0.7 snaps to 1 (pixie.py:305-315);
5. share regressors decode SMPL-X parameters from the fused features,
   local params (expression, finger poses) keep the raw expert estimates
   (keep_local, pixie.py:349-355);
6. pose composition: 6D rotations -> matrices, jaw euler -> matrix, the
   absolute head/wrist poses -> relative via the kinematic chain
   (SMPLX.pose_abs2rel, models/SMPLX.py:296-345), head pose clamped to
   natural ranges (pixie.py:464-474).

The flax module owns steps 1/2/4/5 (everything with weights); the pure
pose math of step 6 lives in module-level jnp functions; step 3 (cropping)
is orchestrated by :class:`~icon_tpu.data.test_dataset` using
:func:`crop_part_boxes`.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

from icon_tpu.models.pymaf.geometry import rot6d_to_rotmat
from icon_tpu.models.pymaf.resnet import ResNetBackbone
from icon_tpu.models.pixie.hrnet import PixieHRNet

# ImageNet normalization both encoder types apply to [0,1] inputs
# (encoders.py MEAN/STD buffers)
IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


@dataclass(frozen=True)
class PixieConfig:
    """Parameter-space sizes (reference pixielib config cfg.model.n_*) and
    network widths; defaults are the deployed PIXIE. Small values make
    torch-parity twins cheap."""

    n_shape: int = 200
    n_exp: int = 50
    n_tex: int = 50
    n_light: int = 27
    feat_dim: int = 2048
    hr_width: int = 48
    hr_stem: int = 64
    resnet_width: int = 64
    resnet_layers: Sequence[int] = (3, 4, 6, 3)
    reg_channels: Sequence[int] = (1024,)          # body/head/hand regressor
    share_channels: Sequence[int] = (1024, 1024)   # *_share regressors
    mod_channels: Sequence[int] = (1024, 1024)     # moderator hidden

    @property
    def body_layout(self):
        return {"body_cam": 3, "global_pose": 6, "partbody_pose": 17 * 6,
                "neck_pose": 6}

    @property
    def head_layout(self):
        return {"head_cam": 3, "tex": self.n_tex, "light": self.n_light}

    @property
    def head_share_layout(self):
        return {"shape": self.n_shape, "exp": self.n_exp, "head_pose": 6,
                "jaw_pose": 3}

    @property
    def hand_layout(self):
        return {"hand_cam": 3}

    @property
    def hand_share_layout(self):
        return {"right_wrist_pose": 6, "right_hand_pose": 15 * 6}


def _split(vec: jnp.ndarray, layout: Dict[str, int]) -> Dict[str, jnp.ndarray]:
    out, i = {}, 0
    for k, d in layout.items():
        out[k] = vec[:, i:i + d]
        i += d
    return out


class TorchMLP(nn.Module):
    """Reference ``encoders.MLP``: Linear/ReLU Sequential. Dense layers are
    named ``layers_{torch Sequential index}`` so checkpoints map 1:1."""

    channels: Sequence[int]          # hidden+output dims (input inferred)

    @nn.compact
    def __call__(self, x):
        for i, c in enumerate(self.channels):
            x = nn.Dense(c, name=f"layers_{2 * i}")(x)
            if i != len(self.channels) - 1:
                x = nn.relu(x)
        return x


class TempSoftmaxFusion(nn.Module):
    """Moderator (models/moderators.py:14-58): an MLP on [x, y] emits two
    logits; w = softmax(logits * temperature); fused = w0*x + w1*y."""

    channels: Sequence[int] = (1024, 1024)

    @nn.compact
    def __call__(self, x, y):
        f = jnp.concatenate([x, y], axis=-1)
        logits = TorchMLP(tuple(self.channels) + (2,), name="layers")(f)
        temp = self.param("temperature", nn.initializers.ones, (1,))
        w = jax.nn.softmax(logits * temp, axis=-1)
        return x * w[:, 0:1] + y * w[:, 1:2], w


def _normalize(img):
    mean = jnp.asarray(IMAGENET_MEAN)
    std = jnp.asarray(IMAGENET_STD)
    return (img - mean) / std


class PIXIE(nn.Module):
    """Weights-bearing PIXIE graph. Methods mirror the reference's encode
    stages so the estimator can run coarse -> crop -> fused passes."""

    cfg: PixieConfig = field(default_factory=PixieConfig)

    def setup(self):
        c = self.cfg
        self.encoder_body = PixieHRNet(
            width=c.hr_width, stem=c.hr_stem, feat_dim=c.feat_dim,
            name="encoder_body")
        self.encoder_head = ResNetBackbone(
            layers=tuple(c.resnet_layers), width=c.resnet_width,
            name="encoder_head")
        self.encoder_hand = ResNetBackbone(
            layers=tuple(c.resnet_layers), width=c.resnet_width,
            name="encoder_hand")
        reg = tuple(c.reg_channels)
        share = tuple(c.share_channels)
        self.regressor_body = TorchMLP(
            reg + (sum(c.body_layout.values()),), name="regressor_body")
        self.regressor_head = TorchMLP(
            reg + (sum(c.head_layout.values()),), name="regressor_head")
        self.regressor_head_share = TorchMLP(
            share + (sum(c.head_share_layout.values()),),
            name="regressor_head_share")
        self.regressor_hand = TorchMLP(
            reg + (sum(c.hand_layout.values()),), name="regressor_hand")
        self.regressor_hand_share = TorchMLP(
            share + (sum(c.hand_share_layout.values()),),
            name="regressor_hand_share")
        self.extractor_head_share = TorchMLP(
            (c.feat_dim,), name="extractor_head_share")
        self.extractor_left_hand_share = TorchMLP(
            (c.feat_dim,), name="extractor_left_hand_share")
        self.extractor_right_hand_share = TorchMLP(
            (c.feat_dim,), name="extractor_right_hand_share")
        self.moderator_head_share = TempSoftmaxFusion(
            tuple(c.mod_channels), name="moderator_head_share")
        self.moderator_hand_share = TempSoftmaxFusion(
            tuple(c.mod_channels), name="moderator_hand_share")

    def encode_body(self, image, train: bool = False):
        """image [B, 224, 224, 3] in [0,1] -> (f_body, part-share feats)."""
        f_body = self.encoder_body(_normalize(image), train)
        shares = {
            "head": self.extractor_head_share(f_body),
            "left_hand": self.extractor_left_hand_share(f_body),
            "right_hand": self.extractor_right_hand_share(f_body),
        }
        return f_body, shares

    def coarse_params(self, f_body, shares):
        """Body-only estimate from the body feature (pixie.py:244-267):
        share regressors run directly on the extracted features."""
        c = self.cfg
        body = _split(self.regressor_body(f_body), c.body_layout)
        head_share = _split(self.regressor_head_share(shares["head"]),
                            c.head_share_layout)
        rh = _split(self.regressor_hand_share(shares["right_hand"]),
                    c.hand_share_layout)
        lh = _split(self.regressor_hand_share(shares["left_hand"]),
                    c.hand_share_layout)
        return {**body, **head_share,
                "right_wrist_pose": rh["right_wrist_pose"],
                "right_hand_pose": rh["right_hand_pose"],
                "left_wrist_pose": lh["right_wrist_pose"],
                "left_hand_pose": lh["right_hand_pose"]}

    def fused_params(self, f_body, shares, head_image, left_hand_image,
                     right_hand_image, train: bool = False):
        """Full estimate with part crops (pixie.py:287-355). Crop images
        are [B, 224, 224, 3] in [0,1]; the left-hand crop is flipped here.
        Returns (params, moderator weights)."""
        c = self.cfg
        crops = {"head": head_image,
                 "left_hand": left_hand_image[:, :, ::-1],
                 "right_hand": right_hand_image}
        fused, weights, local = {}, {}, {}
        for part_name, crop in crops.items():
            part = "head" if part_name == "head" else "hand"
            enc = self.encoder_head if part == "head" else self.encoder_hand
            _, f_part = enc(_normalize(crop), train)
            share_reg = (self.regressor_head_share if part == "head"
                         else self.regressor_hand_share)
            layout = (c.head_share_layout if part == "head"
                      else c.hand_share_layout)
            local[part_name] = _split(share_reg(f_part), layout)
            if part == "head":
                local[part_name].update(_split(
                    self.regressor_head(f_part), c.head_layout))
            else:
                local[part_name].update(_split(
                    self.regressor_hand(f_part), c.hand_layout))
            mod = (self.moderator_head_share if part == "head"
                   else self.moderator_hand_share)
            f_out, w = mod(shares[part_name], f_part)
            if part == "hand":
                # confident experts win outright (pixie.py:308-313)
                part_w = w[:, 1:2]
                part_w = jnp.where(part_w > 0.7, 1.0, part_w)
                f_out = shares[part_name] * (1.0 - part_w) + f_part * part_w
            fused[part_name] = f_out
            weights[part_name] = w

        body = _split(self.regressor_body(f_body), c.body_layout)
        head_share = _split(self.regressor_head_share(fused["head"]),
                            c.head_share_layout)
        rh = _split(self.regressor_hand_share(fused["right_hand"]),
                    c.hand_share_layout)
        lh = _split(self.regressor_hand_share(fused["left_hand"]),
                    c.hand_share_layout)
        params = {**body, **head_share,
                  "right_wrist_pose": rh["right_wrist_pose"],
                  "right_hand_pose": rh["right_hand_pose"],
                  "left_wrist_pose": lh["right_wrist_pose"],
                  "left_hand_pose": lh["right_hand_pose"],
                  "tex": local["head"]["tex"],
                  "light": local["head"]["light"]}
        # keep_local: trust experts for expression + finger articulation
        params["exp"] = local["head"]["exp"]
        params["right_hand_pose"] = local["right_hand"]["right_hand_pose"]
        params["left_hand_pose"] = local["left_hand"]["right_hand_pose"]
        return params, weights

    def __call__(self, image, head_image=None, left_hand_image=None,
                 right_hand_image=None, train: bool = False):
        """Single entry for init/jit: coarse params without crops, fused
        with."""
        f_body, shares = self.encode_body(image, train)
        if head_image is None:
            return self.coarse_params(f_body, shares)
        params, _ = self.fused_params(f_body, shares, head_image,
                                      left_hand_image, right_hand_image,
                                      train)
        return params


# ---------------------------------------------------------------------------
# pose math (pure jnp, reference pixie.py convert_pose/decode)
# ---------------------------------------------------------------------------


def euler_to_rotmat(r: jnp.ndarray) -> jnp.ndarray:
    """[B, 3] intrinsic-xyz euler -> [B, 3, 3]
    (rotation_converter.batch_euler2matrix: quaternion qx*qy*qz)."""
    x, y, z = r[:, 0] / 2, r[:, 1] / 2, r[:, 2] / 2
    cx, sx = jnp.cos(x), jnp.sin(x)
    cy, sy = jnp.cos(y), jnp.sin(y)
    cz, sz = jnp.cos(z), jnp.sin(z)
    w = cx * cy * cz - sx * sy * sz
    qx = cx * sy * sz + cy * cz * sx
    qy = cx * cz * sy - sx * cy * sz
    qz = cx * cy * sz + sx * cz * sy
    q = jnp.stack([w, qx, qy, qz], -1)
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    w, qx, qy, qz = q[:, 0], q[:, 1], q[:, 2], q[:, 3]
    return jnp.stack([
        w * w + qx * qx - qy * qy - qz * qz, 2 * (qx * qy - w * qz),
        2 * (w * qy + qx * qz),
        2 * (w * qz + qx * qy), w * w - qx * qx + qy * qy - qz * qz,
        2 * (qy * qz - w * qx),
        2 * (qx * qz - w * qy), 2 * (w * qx + qy * qz),
        w * w - qx * qx - qy * qy + qz * qz], -1).reshape(-1, 3, 3)


def rotmat_to_euler_xyz(R: jnp.ndarray) -> jnp.ndarray:
    """[B, 3, 3] -> intrinsic-xyz euler [B, 3]: R = Rx(a) Ry(b) Rz(c)."""
    b = jnp.arcsin(jnp.clip(R[:, 0, 2], -1.0, 1.0))
    a = jnp.arctan2(-R[:, 1, 2], R[:, 2, 2])
    c = jnp.arctan2(-R[:, 0, 1], R[:, 0, 0])
    return jnp.stack([a, b, c], -1)


def cont_to_rotmat(p6d: jnp.ndarray) -> jnp.ndarray:
    """[B, n*6] -> [B, n, 3, 3] (rotation_converter.batch_cont2matrix)."""
    B = p6d.shape[0]
    return rot6d_to_rotmat(p6d.reshape(-1, 6)).reshape(B, -1, 3, 3)


def pose_abs2rel(global_pose: jnp.ndarray, body_pose: jnp.ndarray,
                 abs_joint: str) -> jnp.ndarray:
    """Absolute joint rotation -> relative (SMPLX.pose_abs2rel,
    models/SMPLX.py:296-345). global_pose [B,1,3,3], body_pose [B,21,3,3]."""
    kin_chain = {
        "head": [15, 12, 9, 6, 3, 0],
        "neck": [12, 9, 6, 3, 0],
        "right_wrist": [21, 19, 17, 14, 9, 6, 3, 0],
        "left_wrist": [20, 18, 16, 13, 9, 6, 3, 0],
    }[abs_joint]
    full = jnp.concatenate([global_pose, body_pose], axis=1)
    rel = jnp.broadcast_to(jnp.eye(3), (body_pose.shape[0], 3, 3))
    for idx in kin_chain[1:]:
        rel = jnp.einsum("bij,bjk->bik", full[:, idx], rel)
    abs_joint_pose = body_pose[:, kin_chain[0] - 1]
    rel_joint = jnp.einsum("bji,bjk->bik", rel, abs_joint_pose)
    return body_pose.at[:, kin_chain[0] - 1].set(rel_joint)


def flip_rotmat(R: jnp.ndarray) -> jnp.ndarray:
    """Mirror a rotation across the sagittal plane
    (util.flip_pose rot-mat: flat indices [1,2,3,6] negate)."""
    flat = R.reshape(*R.shape[:-2], 9)
    sign = jnp.array([1, -1, -1, -1, 1, 1, -1, 1, 1], flat.dtype)
    return (flat * sign).reshape(R.shape)


def clamp_head_pose(body_pose: jnp.ndarray) -> jnp.ndarray:
    """check_pose (pixie.py:464-474): zero any head euler component outside
    [-20, 70, 10] degrees (pitch/yaw/roll), joint index 14 in body_pose."""
    head = body_pose[:, 14]
    eul = rotmat_to_euler_xyz(head)
    lim = jnp.array([20.0, 70.0, 10.0]) * jnp.pi / 180.0
    eul = jnp.where(jnp.abs(eul) > lim, 0.0, eul)
    return body_pose.at[:, 14].set(euler_to_rotmat(eul))


def compose_body_pose(params: Dict[str, jnp.ndarray],
                      check_pose: bool = True
                      ) -> Dict[str, jnp.ndarray]:
    """6D/euler params -> rotation-matrix pose dict with the reference's
    composition + abs2rel chain (pixie.py decode, 443-474). Returns
    global_pose [B,1,3,3], body_pose [B,21,3,3], jaw [B,1,3,3], hand poses
    [B,15,3,3] each."""
    B = params["global_pose"].shape[0]
    glob = cont_to_rotmat(params["global_pose"])             # [B,1,3,3]
    partbody = cont_to_rotmat(params["partbody_pose"])       # [B,17,3,3]
    neck = cont_to_rotmat(params["neck_pose"])
    head = cont_to_rotmat(params["head_pose"])
    lwrist = cont_to_rotmat(params["left_wrist_pose"])
    rwrist = cont_to_rotmat(params["right_wrist_pose"])
    lhand = cont_to_rotmat(params["left_hand_pose"])         # [B,15,3,3]
    rhand = cont_to_rotmat(params["right_hand_pose"])
    jaw = euler_to_rotmat(params["jaw_pose"]).reshape(B, 1, 3, 3)

    # left-side params come from the right-hand regressor on flipped
    # features; mirror them back (pixie.py:326-334 + convert_pose:454-461)
    lwrist = flip_rotmat(lwrist)
    lhand = flip_rotmat(lhand)

    body_pose = jnp.concatenate([
        partbody[:, :11], neck, partbody[:, 11:13], head,
        partbody[:, 13:17], lwrist, rwrist], axis=1)         # [B,21,3,3]
    body_pose = pose_abs2rel(glob, body_pose, "head")
    body_pose = pose_abs2rel(glob, body_pose, "left_wrist")
    body_pose = pose_abs2rel(glob, body_pose, "right_wrist")
    if check_pose:
        body_pose = clamp_head_pose(body_pose)
    return {"global_pose": glob, "body_pose": body_pose, "jaw_pose": jaw,
            "left_hand_pose": lhand, "right_hand_pose": rhand}


def batch_orth_proj(X: jnp.ndarray, cam: jnp.ndarray) -> jnp.ndarray:
    """util.batch_orth_proj: X [B,N,3], cam [B,3] (scale, tx, ty)."""
    trans = X[:, :, :2] + cam[:, None, 1:]
    return cam[:, None, 0:1] * jnp.concatenate([trans, X[:, :, 2:]], -1)


# ---------------------------------------------------------------------------
# part cropping from the coarse body estimate (pixie.py part_from_body +
# utils/tensor_cropper; scale = (scale_min+scale_max)/2 per part)
# ---------------------------------------------------------------------------

# SMPL-X 55-joint indices used to locate parts when cropping from the body
# estimate. The reference indexes its 145-point keypoint set
# (models/SMPLX.py part_indices); restricted to the shared 55 model joints:
# head via the face region around the head joint + eyes, hands via wrist +
# finger joints.
PART_JOINTS = {
    "head": (12, 15, 22, 23, 24),
    "left_hand": (20, 25, 26, 27, 28, 29, 30, 31, 32, 33, 34, 35, 36, 37,
                  38, 39),
    "right_hand": (21, 40, 41, 42, 43, 44, 45, 46, 47, 48, 49, 50, 51, 52,
                   53, 54),
}
PART_SCALE = {"head": 2.0, "left_hand": 2.4, "right_hand": 2.4}


def crop_part_boxes(joints2d: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    """[B, 55, 2] projected joints (image-normalized [-1,1]) -> per-part
    [B, 3] (cx, cy, half_size) crop boxes, tensor_cropper.points2bbox
    semantics (bbox_size = max extent * scale / 2)."""
    out = {}
    for part, idx in PART_JOINTS.items():
        pts = joints2d[:, jnp.asarray(idx)]
        lo = pts.min(axis=1)
        hi = pts.max(axis=1)
        center = 0.5 * (lo + hi)
        half = 0.5 * (hi - lo).max(axis=-1) * PART_SCALE[part]
        half = jnp.maximum(half, 1e-3)
        out[part] = jnp.concatenate([center, half[:, None]], axis=-1)
    return out


def crop_resize(image: jnp.ndarray, box: jnp.ndarray,
                out_size: int = 224) -> jnp.ndarray:
    """Differentiable crop: image [B, H, W, 3], box [B, 3] in [-1,1]
    normalized coords -> [B, out, out, 3] bilinear resample (the reference
    warps with a similarity tform through torch grid_sample,
    tensor_cropper.py)."""
    from icon_tpu.ops.grid_sample import grid_sample_2d
    B = image.shape[0]
    lin = jnp.linspace(-1.0, 1.0, out_size)
    gy, gx = jnp.meshgrid(lin, lin, indexing="ij")
    grid = jnp.stack([gx, gy], -1).reshape(1, -1, 2)         # [1,o*o,2]
    center = box[:, None, :2]
    half = box[:, None, 2:3]
    pts = center + grid * half                               # [B,o*o,2]
    out = grid_sample_2d(image, pts)
    return out.reshape(B, out_size, out_size, image.shape[-1])


# ---------------------------------------------------------------------------
# estimator: the runnable PIXIE (coarse -> crop -> fused -> SMPL-X decode)
# ---------------------------------------------------------------------------


class PixieEstimator:
    """Drives the PIXIE graph end-to-end the way the reference demo does
    (pixie.py forward: encode(body image) -> decode). Returns the output
    dict lib/dataset/TestDataset.py:247-254 consumes: vertices, body_pose /
    global_pose rotmats, shape, exp, jaw/hand poses, cam."""

    def __init__(self, cfg: Optional[PixieConfig] = None, variables=None,
                 rng_seed: int = 0):
        from icon_tpu.models.smplx.assets import get_smpl_model
        self.cfg = cfg or PixieConfig()
        self.net = PIXIE(cfg=self.cfg)
        self.body = get_smpl_model("smplx", "neutral")
        if variables is None:
            dummy = jnp.zeros((1, 224, 224, 3))
            variables = jax.jit(
                lambda k, d: self.net.init(k, d, d, d, d,
                                           train=False))(
                jax.random.PRNGKey(rng_seed), dummy)
        self.variables = variables

        def _coarse(v, img):
            f_body, shares = self.net.apply(
                v, img, train=False, method=PIXIE.encode_body)
            params = self.net.apply(v, f_body, shares,
                                    method=PIXIE.coarse_params)
            return f_body, shares, params

        def _fused(v, f_body, shares, crops):
            params, w = self.net.apply(
                v, f_body, shares, crops["head"], crops["left_hand"],
                crops["right_hand"], method=PIXIE.fused_params)
            return params

        self._coarse = jax.jit(_coarse)
        self._fused = jax.jit(_fused)
        self._decode = jax.jit(self.decode_params)

    def decode_params(self, params):
        """6D/euler params -> SMPL-X vertices/joints + rotmat poses."""
        from icon_tpu.models.pymaf.geometry import rotmat_to_angle_axis
        c = self.cfg
        rots = compose_body_pose(params)
        B = params["shape"].shape[0]

        def aa(R):
            n = R.shape[1]
            return rotmat_to_angle_axis(
                R.reshape(B * n, 3, 3)).reshape(B, n * 3)

        betas = params["shape"][:, :self.body.num_betas]
        nexp = (self.body.expr_dirs.shape[-1]
                if self.body.expr_dirs is not None else 0)
        exp = params["exp"][:, :nexp] if nexp else None
        lhand = aa(rots["left_hand_pose"])
        rhand = aa(rots["right_hand_pose"])
        # PIXIE's SMPLX consumes per-joint rotations directly (no hand
        # mean); cancel the mean our BodyModel adds for aa hand input
        if not self.body.flat_hand_mean:
            if self.body.hands_mean_l is not None:
                lhand = lhand - self.body.hands_mean_l[None]
            if self.body.hands_mean_r is not None:
                rhand = rhand - self.body.hands_mean_r[None]
        verts, joints = self.body.forward(
            betas=betas,
            global_orient=aa(rots["global_pose"]),
            body_pose=aa(rots["body_pose"]),
            jaw_pose=aa(rots["jaw_pose"]),
            expression=exp,
            left_hand_pose=lhand, right_hand_pose=rhand)
        return {
            "vertices": verts,
            "joints": joints,
            "global_pose": rots["global_pose"],
            "body_pose": rots["body_pose"],
            "jaw_pose": rots["jaw_pose"],
            "left_hand_pose": rots["left_hand_pose"],
            "right_hand_pose": rots["right_hand_pose"],
            "shape": params["shape"],
            "exp": params["exp"],
            "cam": params["body_cam"],
        }

    def __call__(self, image, image_hd=None):
        """image [B, 224, 224, 3] in [0,1]; image_hd optionally higher-res
        for part crops (reference resizes body input to 1024,
        pixie.py:277-279)."""
        f_body, shares, coarse = self._coarse(self.variables, image)
        decoded = self._decode(coarse)
        # part crops from the coarse estimate's projected joints
        j2d = batch_orth_proj(decoded["joints"][:, :55],
                              decoded["cam"])[..., :2]
        boxes = crop_part_boxes(j2d)
        src = image_hd if image_hd is not None else image
        crops = {p: crop_resize(src, boxes[p]) for p in boxes}
        fused = self._fused(self.variables, f_body, shares, crops)
        out = self._decode(fused)
        out["crop_boxes"] = boxes
        return out


def build_pixie(cfg: Optional[PixieConfig] = None):
    """PIXIE estimator + SMPL-X body model (real assets when installed,
    synthetic stand-in otherwise). Returns (estimator, body_model)."""
    est = PixieEstimator(cfg)
    return est, est.body
