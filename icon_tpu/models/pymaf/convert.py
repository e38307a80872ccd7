"""PyMAF torch-checkpoint -> flax variables conversion.

Maps the reference's PyMAF state dict (lib/pymaf/models/pymaf_net.py module
names; checkpoint from fetch_hps.sh ``pymaf_data/PyMAF_model_checkpoint.pt``)
onto icon_tpu.models.pymaf.net.PyMAF's parameter/batch_stats trees by
explicit name rules — not order matching — so partial checkpoints fail
loudly on the exact tensor that mismatches.
"""

from __future__ import annotations

import re
from typing import Any, Dict, Tuple

import numpy as np

from icon_tpu.utils.torch_port import (convert_conv1d_to_dense,
                                       convert_conv2d,
                                       convert_conv_transpose2d)


def _map_name(tk: str):
    """torch name -> (collection, flax path tuple, kind).

    kind in {conv, tconv, dense, conv1d, scale, bias, mean, var, skip}.
    """
    tk = tk.replace("module.", "")
    # backbone stem
    m = re.match(r"feature_extractor\.conv1\.weight$", tk)
    if m:
        return "params", ("feature_extractor", "conv1", "kernel"), "conv"
    m = re.match(r"feature_extractor\.bn1\.(\w+)$", tk)
    if m:
        return _bn(("feature_extractor", "bn1"), m.group(1))
    # backbone blocks
    m = re.match(r"feature_extractor\.layer(\d)\.(\d+)\.conv(\d)\.weight$",
                 tk)
    if m:
        s, i, c = m.groups()
        return "params", ("feature_extractor", f"layer{s}_{i}", f"conv{c}",
                          "kernel"), "conv"
    m = re.match(r"feature_extractor\.layer(\d)\.(\d+)\.bn(\d)\.(\w+)$", tk)
    if m:
        s, i, c, what = m.groups()
        return _bn(("feature_extractor", f"layer{s}_{i}", f"bn{c}"), what)
    m = re.match(
        r"feature_extractor\.layer(\d)\.(\d+)\.downsample\.0\.weight$", tk)
    if m:
        s, i = m.groups()
        return "params", ("feature_extractor", f"layer{s}_{i}",
                          "downsample_conv", "kernel"), "conv"
    m = re.match(
        r"feature_extractor\.layer(\d)\.(\d+)\.downsample\.1\.(\w+)$", tk)
    if m:
        s, i, what = m.groups()
        return _bn(("feature_extractor", f"layer{s}_{i}", "downsample_bn"),
                   what)
    # deconv pyramid: Sequential indices 0/3/6 = tconv, 1/4/7 = bn
    m = re.match(r"deconv_layers\.(\d)\.(\w+)$", tk)
    if m:
        idx, what = int(m.group(1)), m.group(2)
        stage, role = divmod(idx, 3)
        if role == 0 and what == "weight":
            return "params", (f"deconv{stage}_tconv", "kernel"), "tconv"
        if role == 1:
            return _bn((f"deconv{stage}_bn",), what)
        return None
    # MAF extractors (Conv1d k=1 -> Dense)
    m = re.match(r"maf_extractor\.(\d)\.conv(\d)\.(weight|bias)$", tk)
    if m:
        i, l, what = m.groups()
        if what == "weight":
            return "params", (f"maf_{i}", f"conv{l}", "kernel"), "conv1d"
        return "params", (f"maf_{i}", f"conv{l}", "bias"), "bias"
    # regressors
    m = re.match(
        r"regressor\.(\d)\.(fc1|fc2|decpose|decshape|deccam)\.(weight|bias)$",
        tk)
    if m:
        i, layer, what = m.groups()
        if what == "weight":
            return "params", (f"regressor_{i}", layer, "kernel"), "dense"
        return "params", (f"regressor_{i}", layer, "bias"), "bias"
    return None


def _bn(path, what: str):
    return {
        "weight": ("params", path + ("scale",), "scale"),
        "bias": ("params", path + ("bias",), "bias"),
        "running_mean": ("batch_stats", path + ("mean",), "mean"),
        "running_var": ("batch_stats", path + ("var",), "var"),
        "num_batches_tracked": None,
    }[what]


def _convert(kind: str, v: np.ndarray) -> np.ndarray:
    if kind == "conv":
        return convert_conv2d(v)
    if kind == "tconv":
        return convert_conv_transpose2d(v)
    if kind == "conv1d":
        return convert_conv1d_to_dense(v)
    if kind == "dense":
        return np.transpose(v)
    return v


def port_pymaf(torch_state: Dict[str, np.ndarray],
               variables: Dict[str, Any]) -> Tuple[Dict[str, Any], list]:
    """Returns (new variables dict, mapping log). Raises on any tensor the
    checkpoint provides that exists in our tree but mismatches in shape;
    ignores torch entries with no counterpart (smpl buffers, IUV aux head)."""
    def to_mutable(t):
        if hasattr(t, "items"):
            return {k: to_mutable(v) for k, v in t.items()}
        return np.asarray(t)

    new = {"params": to_mutable(variables["params"]),
           "batch_stats": to_mutable(variables.get("batch_stats", {}))}
    log, skipped = [], []
    for tk, tv in torch_state.items():
        mapped = _map_name(tk)
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
            raise ValueError(
                f"{tk} {w.shape} -> {'/'.join(path)} "
                f"{np.asarray(target).shape}")
        node[path[-1]] = w.astype(np.asarray(target).dtype)
        log.append(f"{tk} -> {coll}/{'/'.join(path)}")
    return new, log


def load_pymaf_checkpoint(net_variables: Dict[str, Any],
                          ckpt_path: str) -> Dict[str, Any]:
    from icon_tpu.utils.torch_port import load_torch_state
    state = load_torch_state(ckpt_path)
    # the reference checkpoint nests under 'model'
    state = {k[6:] if k.startswith("model.") else k: v
             for k, v in state.items()}
    new, log = port_pymaf(state, net_variables)
    return new
