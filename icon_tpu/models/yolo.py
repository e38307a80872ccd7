"""YOLOv3-tiny person detector (the reference's trained-detector role).

The reference crops with a trained person detector before matting
(lib/pymaf/utils/imutils.py:34-47 ``get_bbox`` via the external
``human_det`` pip package; lib/dataset/TestDataset.py:60). That package is
a thin wrapper over a pretrained single-pass detector; rather than depend
on pip, this module ports the canonical published person detector whose
weight file format is fully specified and universally mirrored:
YOLOv3-tiny trained on COCO (class 0 = person), loaded directly from the
darknet ``yolov3-tiny.weights`` binary.

Install ``yolov3-tiny.weights`` (the 33 MB darknet release file) at
``data/HPS/yolov3-tiny.weights`` and RGB photos get a trained person box;
without it the weight-free saliency fallback in models/detector.py is used
(with a loud warning).

TPU notes: the graph is 13 convs at a fixed 416x416 input — one jit, all
static shapes, BN folded into the conv weights at load time (exact
algebra, eps=1e-5 matching the standard torch ports of darknet BN).
Box decode runs in the same jit; only thresholding/NMS are host-side.
"""

from __future__ import annotations

import struct as _struct
from typing import Dict, List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

# darknet yolov3-tiny.cfg layer table: (darknet layer idx, in_ch, out_ch,
# ksize, batchnorm). Non-conv layers (maxpool/route/upsample/yolo) carry no
# weights and are hard-wired in the forward below; in_ch follows the graph
# (conv18 reads the 256-ch l13 route; conv21 the 128+256 concat).
CONV_LAYERS: List[Tuple[int, int, int, int, bool]] = [
    (0, 3, 16, 3, True), (2, 16, 32, 3, True), (4, 32, 64, 3, True),
    (6, 64, 128, 3, True), (8, 128, 256, 3, True), (10, 256, 512, 3, True),
    (12, 512, 1024, 3, True), (13, 1024, 256, 1, True),
    (14, 256, 512, 3, True), (15, 512, 255, 1, False),
    (18, 256, 128, 1, True), (21, 384, 256, 3, True),
    (22, 256, 255, 1, False),
]

# anchors in net-input pixels; first head (13x13) uses mask 3,4,5 and the
# second (26x26) uses mask 1,2,3 (the yolov3-tiny cfg quirk)
ANCHORS = np.array([(10, 14), (23, 27), (37, 58),
                    (81, 82), (135, 169), (344, 319)], np.float32)
MASKS = ((3, 4, 5), (1, 2, 3))
NET_SIZE = 416
N_CLASSES = 80
BN_EPS = 1e-5


class YoloTiny(nn.Module):
    """YOLOv3-tiny forward, channel-last, BN pre-folded into conv params.

    Returns the two raw heads [N, 13, 13, 255] and [N, 26, 26, 255].
    """

    @nn.compact
    def __call__(self, x: jnp.ndarray
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        def conv(idx: int, h, act=True):
            _, _, ch, k, _ = next(c for c in CONV_LAYERS if c[0] == idx)
            h = nn.Conv(ch, (k, k), padding=k // 2, name=f"conv{idx}")(h)
            return jax.nn.leaky_relu(h, 0.1) if act else h

        pool = lambda h: nn.max_pool(h, (2, 2), strides=(2, 2))
        h = conv(0, x)
        h = conv(2, pool(h))
        h = conv(4, pool(h))
        h = conv(6, pool(h))
        l8 = conv(8, pool(h))                       # 26x26x256 route point
        h = conv(10, pool(l8))
        # maxpool size 2 stride 1: zero-pad right/bottom (the standard torch
        # port of darknet's same-size pool), then VALID
        h = jnp.pad(h, ((0, 0), (0, 1), (0, 1), (0, 0)))
        h = nn.max_pool(h, (2, 2), strides=(1, 1))
        h = conv(12, h)
        l13 = conv(13, h)                           # 13x13x256 route point
        head1 = conv(15, conv(14, l13), act=False)  # 13x13x255
        h = conv(18, l13)
        h = jnp.repeat(jnp.repeat(h, 2, axis=1), 2, axis=2)  # nearest x2
        h = jnp.concatenate([h, l8], axis=-1)       # route -1,8
        head2 = conv(22, conv(21, h), act=False)    # 26x26x255
        return head1, head2


def decode_head(head: jnp.ndarray, mask: Tuple[int, int, int]
                ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """[N, G, G, 255] -> (boxes [N, G*G*3, 4] cxcywh in [0,1] of the net
    input, person_score [N, G*G*3]) — sigmoid offsets + anchor exp sizes
    (standard yolov3 decode; person = COCO class 0)."""
    N, G = head.shape[0], head.shape[1]
    p = head.reshape(N, G, G, 3, 5 + N_CLASSES)
    gy, gx = jnp.meshgrid(jnp.arange(G), jnp.arange(G), indexing="ij")
    cx = (jax.nn.sigmoid(p[..., 0]) + gx[None, :, :, None]) / G
    cy = (jax.nn.sigmoid(p[..., 1]) + gy[None, :, :, None]) / G
    anc = jnp.asarray(ANCHORS[list(mask)]) / NET_SIZE
    bw = anc[:, 0] * jnp.exp(p[..., 2])
    bh = anc[:, 1] * jnp.exp(p[..., 3])
    score = jax.nn.sigmoid(p[..., 4]) * jax.nn.sigmoid(p[..., 5])
    boxes = jnp.stack([cx, cy, bw, bh], axis=-1)
    return boxes.reshape(N, -1, 4), score.reshape(N, -1)


def _decode_all(heads) -> Tuple[jnp.ndarray, jnp.ndarray]:
    parts = [decode_head(h, m) for h, m in zip(heads, MASKS)]
    return (jnp.concatenate([b for b, _ in parts], axis=1),
            jnp.concatenate([s for _, s in parts], axis=1))


# ---------------------------------------------------------------------------
# darknet .weights parsing


def parse_darknet_weights(blob: bytes) -> Dict[str, Dict[str, np.ndarray]]:
    """Raw darknet buffer -> per-conv arrays in file order.

    Format: header (3 x int32 version; seen as int64 for version >= 0.2),
    then for each conv layer, in cfg order: [bn_beta, bn_gamma, bn_mean,
    bn_var] (or conv_bias when no BN), then conv weights [out, in, k, k]."""
    major, minor = _struct.unpack("<ii", blob[:8])
    off = 12 + (8 if major * 10 + minor >= 2 else 4)
    data = np.frombuffer(blob, np.float32, offset=off)
    pos = 0

    def take(n):
        nonlocal pos
        out = data[pos:pos + n]
        if len(out) != n:
            raise ValueError("darknet weights file truncated")
        pos += n
        return out.copy()

    out: Dict[str, Dict[str, np.ndarray]] = {}
    for idx, cin, ch, k, bn in CONV_LAYERS:
        d: Dict[str, np.ndarray] = {}
        if bn:
            d["beta"] = take(ch)
            d["gamma"] = take(ch)
            d["mean"] = take(ch)
            d["var"] = take(ch)
        else:
            d["bias"] = take(ch)
        d["weight"] = take(ch * cin * k * k).reshape(ch, cin, k, k)
        out[f"conv{idx}"] = d
    if pos != len(data):
        raise ValueError(
            f"darknet weights length mismatch: {len(data) - pos} floats left")
    return out


def fold_to_params(raw: Dict[str, Dict[str, np.ndarray]]) -> Dict:
    """Fold BN into each conv (scale = gamma/sqrt(var+eps), exact algebra)
    and convert [out, in, k, k] -> flax [k, k, in, out]."""
    params = {}
    for name, d in raw.items():
        w = d["weight"].astype(np.float32)
        if "gamma" in d:
            scale = d["gamma"] / np.sqrt(d["var"] + BN_EPS)
            w = w * scale[:, None, None, None]
            b = d["beta"] - d["mean"] * scale
        else:
            b = d["bias"]
        params[name] = {"kernel": w.transpose(2, 3, 1, 0),
                        "bias": b.astype(np.float32)}
    return params


def load_darknet(path: str) -> Dict:
    with open(path, "rb") as f:
        return fold_to_params(parse_darknet_weights(f.read()))


# ---------------------------------------------------------------------------
# detection front end


def _letterbox(rgb: np.ndarray) -> Tuple[np.ndarray, float, int, int]:
    """[H, W, 3] in [0,1] -> ([416, 416, 3], scale, pad_y, pad_x)."""
    from PIL import Image
    H, W = rgb.shape[:2]
    s = NET_SIZE / max(H, W)
    nh, nw = int(round(H * s)), int(round(W * s))
    im = Image.fromarray((np.clip(rgb, 0, 1) * 255).astype(np.uint8))
    small = np.asarray(im.resize((nw, nh), Image.BILINEAR),
                       np.float32) / 255.0
    out = np.full((NET_SIZE, NET_SIZE, 3), 0.5, np.float32)
    py, px = (NET_SIZE - nh) // 2, (NET_SIZE - nw) // 2
    out[py:py + nh, px:px + nw] = small
    return out, s, py, px


def _nms(boxes: np.ndarray, scores: np.ndarray, iou: float = 0.45
         ) -> List[int]:
    order = np.argsort(-scores)
    keep: List[int] = []
    x0 = boxes[:, 0] - boxes[:, 2] / 2
    y0 = boxes[:, 1] - boxes[:, 3] / 2
    x1 = boxes[:, 0] + boxes[:, 2] / 2
    y1 = boxes[:, 1] + boxes[:, 3] / 2
    area = (x1 - x0) * (y1 - y0)
    while len(order):
        i = order[0]
        keep.append(int(i))
        if len(order) == 1:
            break
        rest = order[1:]
        iw = np.maximum(0, np.minimum(x1[i], x1[rest])
                        - np.maximum(x0[i], x0[rest]))
        ih = np.maximum(0, np.minimum(y1[i], y1[rest])
                        - np.maximum(y0[i], y0[rest]))
        inter = iw * ih
        order = rest[inter / (area[i] + area[rest] - inter + 1e-9) <= iou]
    return keep


class PersonDetector:
    """Trained person detection: RGB frame -> boxes.

    ``__call__(rgb)`` returns (boxes [K, 4] as (y0, x0, y1, x1) in original
    pixels, scores [K]) after threshold + NMS, best first. The reference's
    ``get_bbox`` prob-weight-averages all detections into one box
    (imutils.py:34-47) — correct for its single-person assumption but wrong
    with bystanders; we keep per-person boxes and crop to the best."""

    def __init__(self, weights_path: str, thresh: float = 0.25):
        self.params = load_darknet(weights_path)
        self.thresh = thresh
        net = YoloTiny()
        self._fwd = jax.jit(
            lambda p, x: _decode_all(net.apply({"params": p}, x)))

    def __call__(self, rgb: np.ndarray
                 ) -> Tuple[np.ndarray, np.ndarray]:
        H, W = rgb.shape[:2]
        inp, s, py, px = _letterbox(rgb)
        boxes, scores = jax.device_get(
            self._fwd(self.params, jnp.asarray(inp)[None]))
        boxes, scores = boxes[0], scores[0]
        sel = scores > self.thresh
        boxes, scores = boxes[sel] * NET_SIZE, scores[sel]
        if not len(boxes):
            return np.zeros((0, 4), np.float32), np.zeros(0, np.float32)
        keep = _nms(boxes, scores)
        boxes, scores = boxes[keep], scores[keep]
        # undo letterbox -> original pixels, clamp
        cx = (boxes[:, 0] - px) / s
        cy = (boxes[:, 1] - py) / s
        bw, bh = boxes[:, 2] / s, boxes[:, 3] / s
        out = np.stack([np.clip(cy - bh / 2, 0, H),
                        np.clip(cx - bw / 2, 0, W),
                        np.clip(cy + bh / 2, 0, H),
                        np.clip(cx + bw / 2, 0, W)], -1)
        return out.astype(np.float32), scores


def person_bbox(detector: PersonDetector, rgb: np.ndarray,
                margin: float = 0.1
                ) -> Optional[Tuple[int, int, int, int]]:
    """Best-person (y0, x0, y1, x1) with margin, or None when nobody is
    detected (caller falls back to saliency)."""
    boxes, scores = detector(rgb)
    if not len(boxes):
        return None
    y0, x0, y1, x1 = boxes[0]
    my, mx = (y1 - y0) * margin, (x1 - x0) * margin
    H, W = rgb.shape[:2]
    return (int(max(y0 - my, 0)), int(max(x0 - mx, 0)),
            int(min(y1 + my, H)), int(min(x1 + mx, W)))
