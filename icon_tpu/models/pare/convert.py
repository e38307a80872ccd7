"""PARE torch-checkpoint -> flax variables conversion.

Maps the published PARE checkpoint's state dict (lib/pare/pare/models/
pare.py: ``backbone.*`` = PoseHighResolutionNet hrnet_w32-conv,
``head.*`` = PareHead with part_segm heatmaps + keypoint attention) onto
``icon_tpu.models.pare.net.PARE``'s parameter/batch_stats trees by explicit
name rules, so partial checkpoints fail loudly on the exact tensor that
mismatches. Validated against a reference-named torch twin forward in
tests/test_pare_port.py.
"""

from __future__ import annotations

import re
from typing import Any, Dict, Tuple

import numpy as np

from icon_tpu.utils.torch_port import convert_conv2d


def _bn(path, what: str):
    return {
        "weight": ("params", path + ("scale",), "raw"),
        "bias": ("params", path + ("bias",), "raw"),
        "running_mean": ("batch_stats", path + ("mean",), "raw"),
        "running_var": ("batch_stats", path + ("var",), "raw"),
        "num_batches_tracked": None,
    }[what]


def _map_backbone(tk: str):
    """``backbone.``-stripped torch name -> mapping triple or None."""
    m = re.match(r"(conv[12])\.weight$", tk)
    if m:
        return "params", ("backbone", m.group(1), "kernel"), "conv"
    m = re.match(r"(bn[12])\.(\w+)$", tk)
    if m:
        return _bn(("backbone", m.group(1)), m.group(2))
    m = re.match(r"layer1\.(\d)\.conv(\d)\.weight$", tk)
    if m:
        k, c = m.groups()
        return "params", ("backbone", f"layer1_{k}", f"conv{c}",
                          "kernel"), "conv"
    m = re.match(r"layer1\.(\d)\.bn(\d)\.(\w+)$", tk)
    if m:
        k, c, what = m.groups()
        return _bn(("backbone", f"layer1_{k}", f"bn{c}"), what)
    m = re.match(r"layer1\.(\d)\.downsample\.0\.weight$", tk)
    if m:
        return "params", ("backbone", f"layer1_{m.group(1)}",
                          "downsample_conv", "kernel"), "conv"
    m = re.match(r"layer1\.(\d)\.downsample\.1\.(\w+)$", tk)
    if m:
        k, what = m.groups()
        return _bn(("backbone", f"layer1_{k}", "downsample_bn"), what)
    # transitions: 1 -> (t1_conv0, t1_conv1); 2/3 -> single new-branch conv
    m = re.match(r"transition1\.0\.0\.weight$", tk)
    if m:
        return "params", ("backbone", "t1_conv0", "kernel"), "conv"
    m = re.match(r"transition1\.0\.1\.(\w+)$", tk)
    if m:
        return _bn(("backbone", "t1_bn0"), m.group(1))
    m = re.match(r"transition1\.1\.0\.0\.weight$", tk)
    if m:
        return "params", ("backbone", "t1_conv1", "kernel"), "conv"
    m = re.match(r"transition1\.1\.0\.1\.(\w+)$", tk)
    if m:
        return _bn(("backbone", "t1_bn1"), m.group(1))
    m = re.match(r"transition(\d)\.(\d)\.0\.0\.weight$", tk)
    if m:
        t = m.group(1)
        return "params", ("backbone", f"t{t}_conv", "kernel"), "conv"
    m = re.match(r"transition(\d)\.(\d)\.0\.1\.(\w+)$", tk)
    if m:
        return _bn(("backbone", f"t{m.group(1)}_bn"), m.group(3))
    # stages: branches + fuse layers
    m = re.match(r"stage(\d)\.(\d+)\.branches\.(\d)\.(\d)\.conv(\d)\.weight$",
                 tk)
    if m:
        s, mod, b, k, c = m.groups()
        return "params", ("backbone", f"stage{s}_{mod}",
                          f"branch{b}_block{k}", f"conv{c}", "kernel"), "conv"
    m = re.match(r"stage(\d)\.(\d+)\.branches\.(\d)\.(\d)\.bn(\d)\.(\w+)$",
                 tk)
    if m:
        s, mod, b, k, c, what = m.groups()
        return _bn(("backbone", f"stage{s}_{mod}", f"branch{b}_block{k}",
                    f"bn{c}"), what)
    # fuse j > i: Sequential(conv1x1, bn, Upsample)
    m = re.match(r"stage(\d)\.(\d+)\.fuse_layers\.(\d)\.(\d)\.0\.weight$", tk)
    if m:
        s, mod, i, j = m.groups()
        return "params", ("backbone", f"stage{s}_{mod}",
                          f"fuse{i}_{j}_conv", "kernel"), "conv"
    m = re.match(r"stage(\d)\.(\d+)\.fuse_layers\.(\d)\.(\d)\.1\.(\w+)$", tk)
    if m:
        s, mod, i, j, what = m.groups()
        return _bn(("backbone", f"stage{s}_{mod}", f"fuse{i}_{j}_bn"), what)
    # fuse j < i: Sequential of Sequential(conv3x3 s2, bn[, relu])
    m = re.match(
        r"stage(\d)\.(\d+)\.fuse_layers\.(\d)\.(\d)\.(\d)\.0\.weight$", tk)
    if m:
        s, mod, i, j, step = m.groups()
        return "params", ("backbone", f"stage{s}_{mod}",
                          f"fuse{i}_{j}_conv{step}", "kernel"), "conv"
    m = re.match(
        r"stage(\d)\.(\d+)\.fuse_layers\.(\d)\.(\d)\.(\d)\.1\.(\w+)$", tk)
    if m:
        s, mod, i, j, step, what = m.groups()
        return _bn(("backbone", f"stage{s}_{mod}", f"fuse{i}_{j}_bn{step}"),
                   what)
    # -conv aggregation tail: upsample_stage_S, Sequential period 4
    # (Upsample, conv, bn, relu); branch index b = S - 1
    m = re.match(r"upsample_stage_(\d)\.(\d+)\.(\w+)$", tk)
    if m:
        s, idx, what = int(m.group(1)), int(m.group(2)), m.group(3)
        step, role = divmod(idx - 1, 4)
        b = s - 1
        if role == 0 and what == "weight":
            return "params", ("backbone", f"up{b}_conv{step}",
                              "kernel"), "conv"
        if role == 1:
            return _bn(("backbone", f"up{b}_bn{step}"), what)
        return None
    return None


def _map_head(tk: str):
    m = re.match(r"(keypoint|smpl)_deconv_layers\.(\d)\.(\w+)$", tk)
    if m:
        branch, idx, what = m.group(1), int(m.group(2)), m.group(3)
        stage, role = divmod(idx, 3)
        if role == 0 and what == "weight":
            return "params", ("head", f"{branch}_deconv_conv{stage}",
                              "kernel"), "conv"
        if role == 1:
            return _bn(("head", f"{branch}_deconv_bn{stage}"), what)
        return None
    m = re.match(r"(keypoint|smpl)_final_layer\.(weight|bias)$", tk)
    if m:
        branch, what = m.groups()
        if what == "weight":
            return "params", ("head", f"{branch}_final", "kernel"), "conv"
        return "params", ("head", f"{branch}_final", "bias"), "raw"
    if tk == "pose_mlp.weight":
        return "params", ("head", "pose_mlp", "weight"), "lc2d"
    m = re.match(r"(shape|cam)_mlp\.(weight|bias)$", tk)
    if m:
        which, what = m.groups()
        if what == "weight":
            return "params", ("head", f"{which}_mlp", "kernel"), "dense"
        return "params", ("head", f"{which}_mlp", "bias"), "raw"
    return None


def _convert(kind: str, v: np.ndarray) -> np.ndarray:
    if kind == "conv":
        return convert_conv2d(v)
    if kind == "dense":
        return np.transpose(v)
    if kind == "lc2d":
        # LocallyConnected2d [1, out, in, J, 1, k^2=1] -> [J, in, out]
        return np.transpose(v[0, :, :, :, 0, 0], (2, 1, 0))
    return v


def port_pare(torch_state: Dict[str, np.ndarray],
              variables: Dict[str, Any]) -> Tuple[Dict[str, Any], list]:
    """Returns (new variables, mapping log). Raises on shape mismatch for
    any mapped tensor; unmapped torch entries (smpl buffers, final_layer
    pose-pretraining head, init_* buffers) are skipped."""
    def to_mutable(t):
        if hasattr(t, "items"):
            return {k: to_mutable(v) for k, v in t.items()}
        return np.asarray(t)

    new = {"params": to_mutable(variables["params"]),
           "batch_stats": to_mutable(variables.get("batch_stats", {}))}
    log, skipped = [], []
    for tk, tv in torch_state.items():
        tk0 = tk.replace("module.", "")
        if tk0.startswith("backbone."):
            mapped = _map_backbone(tk0[len("backbone."):])
        elif tk0.startswith("head."):
            mapped = _map_head(tk0[len("head."):])
        else:
            mapped = None
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


def load_pare_checkpoint(net_variables: Dict[str, Any],
                         ckpt_path: str) -> Dict[str, Any]:
    from icon_tpu.utils.torch_port import load_torch_state
    state = load_torch_state(ckpt_path)
    # PARE checkpoints nest under 'state_dict' with 'model.' prefixes
    state = {k[6:] if k.startswith("model.") else k: v
             for k, v in state.items()}
    new, _ = port_pare(state, net_variables)
    return new
