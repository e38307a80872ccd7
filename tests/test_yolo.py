"""YOLOv3-tiny darknet-port parity (the reference's trained-detector role,
lib/pymaf/utils/imutils.py:34-47 via the human_det package).

A random darknet-format .weights buffer is parsed into (a) the flax
YoloTiny via the production loader (BN folded) and (b) a hand-built torch
twin with darknet load semantics (BatchNorm2d eval with loaded running
stats). Head outputs must agree, proving both the byte-order parsing and
the folded-BN algebra; NMS and the bbox front end are exercised on a
synthetic detection map.
"""

import numpy as np
import pytest
import torch
import torch.nn as nn

from icon_tpu.models.yolo import (ANCHORS, BN_EPS, CONV_LAYERS, MASKS,
                                  NET_SIZE, YoloTiny, _nms, decode_head,
                                  fold_to_params, parse_darknet_weights)

import jax.numpy as jnp


class TorchConv(nn.Module):
    def __init__(self, cin, ch, k, bn):
        super().__init__()
        self.conv = nn.Conv2d(cin, ch, k, padding=k // 2, bias=not bn)
        self.bn = nn.BatchNorm2d(ch, eps=BN_EPS) if bn else None

    def forward(self, x):
        x = self.conv(x)
        if self.bn is not None:
            x = torch.nn.functional.leaky_relu(self.bn(x), 0.1)
        return x


class TorchYoloTiny(nn.Module):
    """Darknet cfg order: convs + pools + route/upsample, heads at 15/22."""

    def __init__(self):
        super().__init__()
        self.convs = nn.ModuleDict(
            {str(i): TorchConv(cin, ch, k, bn)
             for i, cin, ch, k, bn in CONV_LAYERS})
        self.pool = nn.MaxPool2d(2, 2)
        self.pool_s1 = nn.Sequential(nn.ZeroPad2d((0, 1, 0, 1)),
                                     nn.MaxPool2d(2, 1))

    def forward(self, x):
        c = self.convs
        h = c["0"](x)
        h = c["2"](self.pool(h))
        h = c["4"](self.pool(h))
        h = c["6"](self.pool(h))
        l8 = c["8"](self.pool(h))
        h = c["10"](self.pool(l8))
        h = c["12"](self.pool_s1(h))
        l13 = c["13"](h)
        head1 = c["15"](c["14"](l13))
        h = c["18"](l13)
        h = torch.nn.functional.interpolate(h, scale_factor=2,
                                            mode="nearest")
        h = torch.cat([h, l8], dim=1)
        head2 = c["22"](c["21"](h))
        return head1, head2

    def load_darknet(self, raw):
        for i, _, _, _, bn in CONV_LAYERS:
            d, m = raw[f"conv{i}"], self.convs[str(i)]
            m.conv.weight.data = torch.from_numpy(d["weight"].copy())
            if bn:
                m.bn.bias.data = torch.from_numpy(d["beta"].copy())
                m.bn.weight.data = torch.from_numpy(d["gamma"].copy())
                m.bn.running_mean = torch.from_numpy(d["mean"].copy())
                m.bn.running_var = torch.from_numpy(d["var"].copy())
            else:
                m.conv.bias.data = torch.from_numpy(d["bias"].copy())


def _random_darknet_blob(seed=0) -> bytes:
    """Bytes in the published yolov3-tiny.weights layout (header with
    version 0.2 -> int64 seen counter, then per-conv arrays)."""
    rs = np.random.RandomState(seed)
    parts = [np.array([0, 2, 0], np.int32).tobytes(),
             np.array([0], np.int64).tobytes()]
    for _, cin, ch, k, bn in CONV_LAYERS:
        n = (4 * ch if bn else ch) + ch * cin * k * k
        arr = (rs.randn(n) * 0.1).astype(np.float32)
        if bn:  # variances must be positive
            arr[2 * ch:3 * ch] = np.abs(arr[2 * ch:3 * ch])
            arr[3 * ch:4 * ch] = np.abs(arr[3 * ch:4 * ch]) + 0.5
        parts.append(arr.tobytes())
    return b"".join(parts)


@pytest.fixture(scope="module")
def twins():
    raw = parse_darknet_weights(_random_darknet_blob())
    tnet = TorchYoloTiny()
    tnet.load_darknet(raw)
    tnet.eval()
    return tnet, fold_to_params(raw)


def test_heads_parity(twins):
    tnet, params = twins
    rs = np.random.RandomState(1)
    x = rs.rand(1, 96, 96, 3).astype(np.float32)
    with torch.no_grad():
        r1, r2 = tnet(torch.from_numpy(x).permute(0, 3, 1, 2))
    h1, h2 = YoloTiny().apply({"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(h1),
                               r1.permute(0, 2, 3, 1).numpy(),
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(h2),
                               r2.permute(0, 2, 3, 1).numpy(),
                               rtol=1e-3, atol=1e-4)


def test_blob_length_checked():
    blob = _random_darknet_blob()
    with pytest.raises(ValueError):
        parse_darknet_weights(blob[:-8])
    with pytest.raises(ValueError):
        parse_darknet_weights(blob + b"\x00" * 8)


def test_decode_places_known_box():
    """A head forced to one hot cell decodes to that cell's anchor box."""
    G, mask = 13, MASKS[0]
    head = np.full((1, G, G, 255), -12.0, np.float32)
    # anchor 1 of the coarse head at cell (6, 3): centered offsets,
    # tw=th=0 -> box = anchor size; obj and person logits high
    base = 85
    head[0, 6, 3, base + 0] = 0.0     # tx -> sigmoid 0.5
    head[0, 6, 3, base + 1] = 0.0
    head[0, 6, 3, base + 2] = 0.0
    head[0, 6, 3, base + 3] = 0.0
    head[0, 6, 3, base + 4] = 12.0    # objectness
    head[0, 6, 3, base + 5] = 12.0    # person class
    boxes, scores = decode_head(jnp.asarray(head), mask)
    i = int(np.argmax(np.asarray(scores)[0]))
    cx, cy, bw, bh = np.asarray(boxes)[0, i]
    assert np.isclose(cx, 3.5 / G) and np.isclose(cy, 6.5 / G)
    aw, ah = ANCHORS[mask[1]] / NET_SIZE
    assert np.isclose(bw, aw) and np.isclose(bh, ah)
    assert np.asarray(scores)[0, i] > 0.99


def test_nms_suppresses_overlaps():
    boxes = np.array([[100, 100, 50, 80], [104, 102, 52, 78],
                      [300, 300, 40, 40]], np.float32)
    keep = _nms(boxes, np.array([0.9, 0.8, 0.7], np.float32))
    assert keep == [0, 2]
