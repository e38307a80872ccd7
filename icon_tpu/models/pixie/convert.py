"""PIXIE torch-checkpoint -> flax variables conversion.

The published ``pixie_model.tar`` (reference lib/pixielib/pixie.py:125-133)
is a dict of per-module state dicts keyed ``Encoder_body``,
``Encoder_head``, ``Encoder_hand``, ``Regressor_{body,head,head_share,
hand,hand_share}``, ``Extractor_{head,left_hand,right_hand}_share``,
``Moderator_{head,hand}_share``. This maps every tensor onto
``icon_tpu.models.pixie.net.PIXIE``'s parameter/batch_stats trees by
explicit name rules so partial checkpoints fail loudly on the exact tensor
that mismatches. Validated against a reference-named torch twin forward in
tests/test_pixie_port.py.
"""

from __future__ import annotations

import re
from typing import Any, Dict, Tuple

import numpy as np

from icon_tpu.utils.torch_port import convert_conv2d
from icon_tpu.models.pare.convert import _map_backbone as _map_hr_trunk


def _bn(path, what: str):
    return {
        "weight": ("params", path + ("scale",), "raw"),
        "bias": ("params", path + ("bias",), "raw"),
        "running_mean": ("batch_stats", path + ("mean",), "raw"),
        "running_var": ("batch_stats", path + ("var",), "raw"),
        "num_batches_tracked": None,
    }[what]


def _map_hrnet(tk: str):
    """PIXIE HRNet-W48 names -> flax paths under ``encoder_body``. Trunk
    rules shared with PARE's backbone mapper; the subsample/conv_layers
    'concat' head is PIXIE-specific (ref hrnet.py:368-395, 470-490)."""
    # subsample_{4,3,2}: Sequential period 3 (conv(bias), bn, relu)
    m = re.match(r"subsample_(\d)\.(\d+)\.(\w+)$", tk)
    if m:
        s, idx, what = m.group(1), int(m.group(2)), m.group(3)
        step, role = divmod(idx, 3)
        if role == 0:
            return ("params", ("encoder_body", f"subsample{s}_conv{step}",
                               "kernel" if what == "weight" else "bias"),
                    "conv" if what == "weight" else "raw")
        if role == 1:
            return _bn(("encoder_body", f"subsample{s}_bn{step}"), what)
        return None
    # conv_layers: 5 bottlenecks with a bare downsample conv
    m = re.match(r"conv_layers\.(\d)\.conv(\d)\.weight$", tk)
    if m:
        i, c = m.groups()
        return "params", ("encoder_body", f"convlayers_{i}", f"conv{c}",
                          "kernel"), "conv"
    m = re.match(r"conv_layers\.(\d)\.bn(\d)\.(\w+)$", tk)
    if m:
        i, c, what = m.groups()
        return _bn(("encoder_body", f"convlayers_{i}", f"bn{c}"), what)
    m = re.match(r"conv_layers\.(\d)\.downsample\.weight$", tk)
    if m:
        return "params", ("encoder_body", f"convlayers_{m.group(1)}",
                          "downsample_conv", "kernel"), "conv"
    mapped = _map_hr_trunk(tk)
    if mapped is None:
        return None
    coll, path, kind = mapped
    return coll, ("encoder_body",) + path[1:], kind


def _map_resnet(tk: str, prefix: str):
    """torchvision ResNet-50 names -> flax paths under ``prefix``
    (icon_tpu.models.pymaf.resnet naming)."""
    m = re.match(r"conv1\.weight$", tk)
    if m:
        return "params", (prefix, "conv1", "kernel"), "conv"
    m = re.match(r"bn1\.(\w+)$", tk)
    if m:
        return _bn((prefix, "bn1"), m.group(1))
    m = re.match(r"layer(\d)\.(\d+)\.conv(\d)\.weight$", tk)
    if m:
        s, i, c = m.groups()
        return "params", (prefix, f"layer{s}_{i}", f"conv{c}",
                          "kernel"), "conv"
    m = re.match(r"layer(\d)\.(\d+)\.bn(\d)\.(\w+)$", tk)
    if m:
        s, i, c, what = m.groups()
        return _bn((prefix, f"layer{s}_{i}", f"bn{c}"), what)
    m = re.match(r"layer(\d)\.(\d+)\.downsample\.0\.weight$", tk)
    if m:
        s, i = m.groups()
        return "params", (prefix, f"layer{s}_{i}", "downsample_conv",
                          "kernel"), "conv"
    m = re.match(r"layer(\d)\.(\d+)\.downsample\.1\.(\w+)$", tk)
    if m:
        s, i, what = m.groups()
        return _bn((prefix, f"layer{s}_{i}", "downsample_bn"), what)
    return None    # fc.* (unused classifier head), MEAN/STD buffers


def _map_mlp(tk: str, prefix: Tuple[str, ...]):
    """``layers.{i}.weight/bias`` (Linear) -> TorchMLP ``layers_{i}``."""
    m = re.match(r"layers\.(\d+)\.(weight|bias)$", tk)
    if m:
        i, what = m.groups()
        if what == "weight":
            return "params", prefix + (f"layers_{i}", "kernel"), "dense"
        return "params", prefix + (f"layers_{i}", "bias"), "raw"
    return None


_MODULE_TO_FLAX = {
    "Regressor_body": "regressor_body",
    "Regressor_head": "regressor_head",
    "Regressor_head_share": "regressor_head_share",
    "Regressor_hand": "regressor_hand",
    "Regressor_hand_share": "regressor_hand_share",
    "Extractor_head_share": "extractor_head_share",
    "Extractor_left_hand_share": "extractor_left_hand_share",
    "Extractor_right_hand_share": "extractor_right_hand_share",
}


def _map_name(module: str, tk: str):
    if module == "Encoder_body":
        if tk.startswith("encoder."):
            return _map_hrnet(tk[len("encoder."):])
        return None                      # MEAN/STD buffers
    if module in ("Encoder_head", "Encoder_hand"):
        if tk.startswith("encoder."):
            return _map_resnet(tk[len("encoder."):],
                               "encoder_" + module.split("_")[1].lower())
        return None
    if module in _MODULE_TO_FLAX:
        return _map_mlp(tk, (_MODULE_TO_FLAX[module],))
    m = re.match(r"Moderator_(head|hand)_share$", module)
    if m:
        prefix = (f"moderator_{m.group(1)}_share",)
        if tk == "temperature":
            return "params", prefix + ("temperature",), "raw"
        return _map_mlp(tk, prefix + ("layers",))
    return None


def _convert(kind: str, v: np.ndarray) -> np.ndarray:
    if kind == "conv":
        return convert_conv2d(v)
    if kind == "dense":
        return np.transpose(v)
    return v


def port_pixie(torch_modules: Dict[str, Dict[str, np.ndarray]],
               variables: Dict[str, Any]) -> Tuple[Dict[str, Any], list]:
    """torch_modules: {module_name: state_dict}. Returns (new variables,
    mapping log). Raises on shape mismatch for any mapped tensor."""
    def to_mutable(t):
        if hasattr(t, "items"):
            return {k: to_mutable(v) for k, v in t.items()}
        return np.asarray(t)

    new = {"params": to_mutable(variables["params"]),
           "batch_stats": to_mutable(variables.get("batch_stats", {}))}
    log, skipped = [], []
    for module, state in torch_modules.items():
        if not hasattr(state, "items"):
            continue
        for tk, tv in state.items():
            mapped = _map_name(module, tk.replace("module.", ""))
            if mapped is None:
                skipped.append(f"{module}.{tk}")
                continue
            coll, path, kind = mapped
            node = new[coll]
            try:
                for p in path[:-1]:
                    node = node[p]
                target = node[path[-1]]
            except KeyError:
                skipped.append(f"{module}.{tk}")
                continue
            w = _convert(kind, np.asarray(tv))
            if w.shape != np.asarray(target).shape:
                raise ValueError(f"{module}.{tk} {w.shape} -> "
                                 f"{'/'.join(path)} "
                                 f"{np.asarray(target).shape}")
            node[path[-1]] = w.astype(np.asarray(target).dtype)
            log.append(f"{module}.{tk} -> {coll}/{'/'.join(path)}")
    return new, log


def load_pixie_checkpoint(net_variables: Dict[str, Any],
                          ckpt_path: str) -> Dict[str, Any]:
    import torch
    ckpt = torch.load(ckpt_path, map_location="cpu", weights_only=False)
    modules = {k: {n: t.numpy() if hasattr(t, "numpy") else np.asarray(t)
                   for n, t in v.items()}
               for k, v in ckpt.items() if hasattr(v, "items")}
    new, _ = port_pixie(modules, net_variables)
    return new
