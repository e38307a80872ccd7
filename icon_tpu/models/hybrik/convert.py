"""HybrIK torch-checkpoint -> flax variables conversion.

Maps the published ``pretrained_w_cam.pth`` state dict (reference
lib/hybrik/models/simple3dpose.py:42-125: ``preact.*`` torchvision-style
ResNet-34, ``deconv_layers.{0,3,6}`` ConvTranspose + ``.{1,4,7}`` BN,
``final_layer`` 1x1 conv, ``fc1/fc2/decshape/decphi/deccam`` Linears,
``init_shape`` mean-beta buffer) onto
``icon_tpu.models.hybrik.net.HybrIK``'s parameter/batch_stats trees by
explicit name rules. Validated against a reference-named torch twin
forward in tests/test_hybrik_port.py.
"""

from __future__ import annotations

import re
from typing import Any, Dict, Tuple

import numpy as np

from icon_tpu.utils.torch_port import (convert_conv2d,
                                       convert_conv_transpose2d)


def _bn(path, what: str):
    return {
        "weight": ("params", path + ("scale",), "raw"),
        "bias": ("params", path + ("bias",), "raw"),
        "running_mean": ("batch_stats", path + ("mean",), "raw"),
        "running_var": ("batch_stats", path + ("var",), "raw"),
        "num_batches_tracked": None,
    }[what]


def _map_name(tk: str):
    # backbone (BasicBlock resnet, torchvision naming under 'preact.')
    m = re.match(r"preact\.conv1\.weight$", tk)
    if m:
        return "params", ("preact", "conv1", "kernel"), "conv"
    m = re.match(r"preact\.bn1\.(\w+)$", tk)
    if m:
        return _bn(("preact", "bn1"), m.group(1))
    m = re.match(r"preact\.layer(\d)\.(\d+)\.conv(\d)\.weight$", tk)
    if m:
        s, i, c = m.groups()
        return "params", ("preact", f"layer{s}_{i}", f"conv{c}",
                          "kernel"), "conv"
    m = re.match(r"preact\.layer(\d)\.(\d+)\.bn(\d)\.(\w+)$", tk)
    if m:
        s, i, c, what = m.groups()
        return _bn(("preact", f"layer{s}_{i}", f"bn{c}"), what)
    m = re.match(r"preact\.layer(\d)\.(\d+)\.downsample\.0\.weight$", tk)
    if m:
        s, i = m.groups()
        return "params", ("preact", f"layer{s}_{i}", "downsample_conv",
                          "kernel"), "conv"
    m = re.match(r"preact\.layer(\d)\.(\d+)\.downsample\.1\.(\w+)$", tk)
    if m:
        s, i, what = m.groups()
        return _bn(("preact", f"layer{s}_{i}", "downsample_bn"), what)
    # deconv pyramid: Sequential 0/3/6 = tconv, 1/4/7 = bn
    m = re.match(r"deconv_layers\.(\d)\.(\w+)$", tk)
    if m:
        idx, what = int(m.group(1)), m.group(2)
        stage, role = divmod(idx, 3)
        if role == 0 and what == "weight":
            return "params", (f"deconv{stage}", "kernel"), "tconv"
        if role == 1:
            return _bn((f"deconv_bn{stage}",), what)
        return None
    m = re.match(r"final_layer\.(weight|bias)$", tk)
    if m:
        if m.group(1) == "weight":
            return "params", ("final_layer", "kernel"), "conv"
        return "params", ("final_layer", "bias"), "raw"
    m = re.match(r"(fc1|fc2|decshape|decphi|deccam)\.(weight|bias)$", tk)
    if m:
        layer, what = m.groups()
        if what == "weight":
            return "params", (layer, "kernel"), "dense"
        return "params", (layer, "bias"), "raw"
    if tk == "init_shape":
        return "params", ("init_shape",), "raw"
    return None      # smpl buffers, init_cam (hardcoded), joint tables


def _convert(kind: str, v: np.ndarray) -> np.ndarray:
    if kind == "conv":
        return convert_conv2d(v)
    if kind == "tconv":
        return convert_conv_transpose2d(v)
    if kind == "dense":
        return np.transpose(v)
    return v


def port_hybrik(torch_state: Dict[str, np.ndarray],
                variables: Dict[str, Any]) -> Tuple[Dict[str, Any], list]:
    """Returns (new variables, mapping log). Raises on shape mismatch for
    any mapped tensor; unmapped entries (SMPL-layer buffers etc.) skip."""
    def to_mutable(t):
        if hasattr(t, "items"):
            return {k: to_mutable(v) for k, v in t.items()}
        return np.asarray(t)

    new = {"params": to_mutable(variables["params"]),
           "batch_stats": to_mutable(variables.get("batch_stats", {}))}
    log, skipped = [], []
    for tk, tv in torch_state.items():
        mapped = _map_name(tk.replace("module.", ""))
        if mapped is None:
            skipped.append(tk)
            continue
        coll, path, kind = mapped
        node = new[coll]
        try:
            for p in path[:-1]:
                node = node[p]
            target = node[path[-1]]
        except KeyError:
            skipped.append(tk)
            continue
        w = _convert(kind, np.asarray(tv))
        if w.shape != np.asarray(target).shape:
            raise ValueError(f"{tk} {w.shape} -> {'/'.join(path)} "
                             f"{np.asarray(target).shape}")
        node[path[-1]] = w.astype(np.asarray(target).dtype)
        log.append(f"{tk} -> {coll}/{'/'.join(path)}")
    return new, log


def load_hybrik_checkpoint(net_variables: Dict[str, Any],
                           ckpt_path: str) -> Dict[str, Any]:
    from icon_tpu.utils.torch_port import load_torch_state
    state = load_torch_state(ckpt_path)
    new, _ = port_hybrik(state, net_variables)
    return new
