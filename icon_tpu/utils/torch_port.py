"""Torch-checkpoint -> flax-params conversion.

The reference ships torch checkpoints (normal.ckpt, icon-filter.ckpt,
pymaf_data ...). This module converts their state dicts into this framework's
parameter trees.

Two mechanisms:

- **name mapping** for modules we mirrored structurally (HGFilter, MLP,
  ConvBlock): per-layer rules translate torch names and transpose kernels
  (Conv2d ``[O, I, kh, kw]`` -> ``[kh, kw, I, O]``, Conv1d ``[O, I, 1]`` ->
  Dense ``[I, O]``, ConvTranspose2d ``[I, O, kh, kw]`` -> transpose-kernel
  layout ``[kh, kw, O, I]``).
- **ordered matching** for torch ``nn.Sequential`` blobs (pix2pixHD
  GlobalGenerator): parameterized layers are enumerated in forward order on
  both sides and zipped by shape — robust to the reference's anonymous
  ``model.{i}`` indices.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np


def convert_conv2d(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 3, 1, 0))


def convert_conv1d_to_dense(w: np.ndarray) -> np.ndarray:
    return np.transpose(w[..., 0], (1, 0))


def convert_conv_transpose2d(w: np.ndarray) -> np.ndarray:
    # torch [I, O, kh, kw] -> flax transpose_kernel=True wants [kh, kw, O, I]
    return np.transpose(w, (2, 3, 1, 0))


def convert_conv3d(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 3, 4, 1, 0))


def _flatten(tree: Any, prefix: str = "") -> Dict[str, np.ndarray]:
    out = {}
    if isinstance(tree, dict) or hasattr(tree, "items"):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}{k}/"))
    else:
        out[prefix[:-1]] = np.asarray(tree)
    return out


def _unflatten(flat: Dict[str, np.ndarray]) -> Dict[str, Any]:
    out: Dict[str, Any] = {}
    for k, v in flat.items():
        node = out
        parts = k.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return out


def _is_kernel(name: str) -> bool:
    return name.endswith("/kernel")


def pix2pix_forward_order(key: str):
    """Forward-order sort key for GlobalGenerator param paths
    (``conv_in`` -> ``down{i}`` -> ``res{i}/conv{j}`` -> ``up{i}`` ->
    ``conv_out``).

    Needed because a params tree that round-tripped through a jax pytree
    (e.g. ``jax.jit(net.init)``) has its dict keys re-sorted alphabetically,
    so dict insertion order no longer reflects module creation order.
    """
    import re
    parts = key.split("/")
    head, _, rep = parts[0].partition("#")   # res_stack#3 -> (res_stack, 3)
    m = re.match(r"([a-z_]+?)(\d+)?$", head)
    stage = {"conv_in": 0, "down": 1, "res": 2, "res_stack": 2,
             "up": 3, "conv_out": 4}
    return (stage[m.group(1)], int(m.group(2) or rep or 0), parts[1:])


def port_by_order(torch_state: Dict[str, np.ndarray],
                  flax_params: Any,
                  torch_prefix: str = "",
                  flax_order=None,
                  verbose: bool = False,
                  stacked_prefixes: Sequence[str] = ("res_stack",),
                  ) -> Tuple[Any, List[str]]:
    """Zip torch weight tensors with flax kernels in declaration order.

    Torch entries are taken in the state-dict's insertion order (module
    definition order == forward order for the reference's Sequentials).
    Weight layouts are inferred from tensor rank:
      4D -> Conv2d (or ConvTranspose2d when O-dim mismatch suggests it),
      5D -> Conv3d, 2D -> Dense/Linear, 1D -> bias/scale.

    ``flax_order``: optional key-function giving the flax params' forward
    order (e.g. ``pix2pix_forward_order``). Without it the flax dict's
    insertion order is used, which is only correct for trees fresh out of an
    un-jitted ``net.init``.

    ``stacked_prefixes``: path components holding ``nn.scan``-stacked params
    (leading axis = scan length, e.g. the pix2pixHD ``res_stack`` of 9
    resblocks). Each stacked leaf is expanded into per-iteration virtual
    leaves (``res_stack#k/...``) before matching — so N consecutive torch
    blocks zip against them one-to-one — then re-stacked on return.

    Returns (new_params, log of mappings). Raises on shape mismatch.
    """
    t_items = [(k, v) for k, v in torch_state.items()
               if k.startswith(torch_prefix) and "num_batches_tracked" not in k]

    # expand scan-stacked subtrees into per-iteration virtual leaves,
    # iteration-major (block0's leaves, then block1's, ...) at the position
    # the stacked subtree occupied — so plain insertion order stays forward
    # order and torch's per-block tensors zip one-to-one
    raw = list(_flatten(flax_params).items())
    flat: Dict[str, np.ndarray] = {}
    stack_meta: Dict[str, List[str]] = {}
    i = 0
    while i < len(raw):
        k, v = raw[i]
        parts = k.split("/")
        hit = next((idx for idx, p in enumerate(parts)
                    if p in stacked_prefixes), None)
        if hit is None:
            flat[k] = v
            i += 1
            continue
        root = "/".join(parts[:hit + 1])
        group = []                       # contiguous: _flatten is depth-first
        while i < len(raw) and raw[i][0].startswith(root + "/"):
            group.append(raw[i])
            i += 1
        for j in range(group[0][1].shape[0]):
            for gk, gv in group:
                gparts = gk.split("/")
                gparts[hit] = f"{gparts[hit]}#{j}"
                kj = "/".join(gparts)
                flat[kj] = gv[j]
                stack_meta.setdefault(gk, []).append(kj)

    # pair sequentially by tensor role
    t_weights = [(k, v) for k, v in t_items if v.ndim >= 2]
    t_vectors = [(k, v) for k, v in t_items if v.ndim == 1]

    log = []
    flat_ordered = list(flat.items())
    if flax_order is not None:
        flat_ordered.sort(key=lambda kv: flax_order(kv[0]))
    fk_ordered = [k for k, v in flat_ordered if v.ndim >= 2]
    fv_ordered = [k for k, v in flat_ordered if v.ndim == 1]

    if len(t_weights) != len(fk_ordered):
        raise ValueError(f"kernel count mismatch: torch {len(t_weights)} vs "
                         f"flax {len(fk_ordered)}")

    new_flat = dict(flat)
    for (tk, tv), fk in zip(t_weights, fk_ordered):
        target = flat[fk]
        if tv.ndim == 4:
            w = convert_conv2d(tv)
            if w.shape != target.shape:
                w = convert_conv_transpose2d(tv)
        elif tv.ndim == 5:
            w = convert_conv3d(tv)
        elif tv.ndim == 3:
            w = convert_conv1d_to_dense(tv)
        else:
            w = tv.T if tv.shape[::-1] == target.shape else tv
        if w.shape != target.shape:
            raise ValueError(f"{tk} {tv.shape} -> {fk} {target.shape}")
        new_flat[fk] = w.astype(target.dtype)
        log.append(f"{tk} -> {fk}")

    for (tk, tv), fk in zip(t_vectors, fv_ordered):
        target = flat[fk]
        if tv.shape != target.shape:
            raise ValueError(f"{tk} {tv.shape} -> {fk} {target.shape}")
        new_flat[fk] = tv.astype(target.dtype)
        log.append(f"{tk} -> {fk}")

    # collapse virtual per-iteration leaves back to stacked [N, ...] arrays
    for k, keys in stack_meta.items():
        new_flat[k] = np.stack([np.asarray(new_flat.pop(kj)) for kj in keys])

    return _unflatten(new_flat), log


def load_torch_state(path: str) -> Dict[str, np.ndarray]:
    """Load a torch checkpoint to numpy (CPU, weights only)."""
    import torch
    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    state = ckpt.get("state_dict", ckpt)
    return {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v)
            for k, v in state.items()}


# ---------------------------------------------------------------------------
# Published ICON checkpoints (icon-filter.ckpt / normal.ckpt / pifu.ckpt /
# pamir.ckpt) -> flax HGPIFuNet variables.
#
# The reference loads these via lib/dataset/mesh_util.py:187-237: the geometry
# checkpoint's ``netG.{F_filter,if_regressor,ve}.*`` entries load directly
# (``normal_filter``/``voxelization``/``reconEngine`` keys are filtered out),
# and the normal checkpoint's ``netG.netF/netB`` entries load after the
# ``netG -> netG.normal_filter`` rename (apps/train.py:201-218).
#
# Our HGFilter/MLP mirror the reference's module names exactly
# (models/hourglass.py, models/mlp.py), so the geometry net converts by NAME;
# the pix2pixHD normal net and the pamir VolumeEncoder are anonymous torch
# Sequentials, so they convert by ORDER (port_by_order, twin-proven).
# ---------------------------------------------------------------------------

# torch ConvBlock registers bn4 even when unused and aliases it as
# downsample.0 (net_util.py:224-257); skip the aliases / unused entries.
_SKIP_SUBSTR = ("num_batches_tracked",)


def _map_hgfilter_key(rel: str, ndim: int) -> Tuple[str, str]:
    """torch ``m0.b1_2.conv1.weight`` -> (flax path, collection).

    Returns ("", "") for keys to skip (downsample.0 aliases). collection is
    "params" or "batch_stats"."""
    parts = rel.split(".")
    leaf = parts[-1]
    mods = parts[:-1]
    if len(mods) >= 2 and mods[-2] == "downsample":
        if mods[-1] == "0":          # alias of bn4
            return "", ""
        mods = mods[:-1]             # downsample.2 -> downsample
    if leaf == "weight":
        leaf = "kernel" if ndim >= 2 else "scale"
    elif leaf == "running_mean":
        return "/".join(mods + ["mean"]), "batch_stats"
    elif leaf == "running_var":
        return "/".join(mods + ["var"]), "batch_stats"
    return "/".join(mods + [leaf]), "params"


def _map_mlp_key(rel: str, ndim: int) -> Tuple[str, str]:
    """torch MLP ``filters.0.weight`` / ``norms.0.weight`` -> flax
    ``conv0/kernel`` / ``norm0/scale`` (models/mlp.py naming)."""
    parts = rel.split(".")
    leaf = parts[-1]
    if parts[0] == "filters":
        name = f"conv{parts[1]}"
        leaf = "kernel" if leaf == "weight" else leaf
    elif parts[0] == "norms":
        name = f"norm{parts[1]}"
        if leaf == "weight":
            leaf = "scale"
        elif leaf == "running_mean":
            return f"{name}/mean", "batch_stats"
        elif leaf == "running_var":
            return f"{name}/var", "batch_stats"
    else:
        return "", ""
    return f"{name}/{leaf}", "params"


def _convert_tensor(tv: np.ndarray, target_shape) -> np.ndarray:
    if tv.ndim == 4:
        w = convert_conv2d(tv)
        if w.shape != tuple(target_shape):
            w = convert_conv_transpose2d(tv)
        return w
    if tv.ndim == 5:
        return convert_conv3d(tv)
    if tv.ndim == 3:
        return convert_conv1d_to_dense(tv)
    if tv.ndim == 2 and tv.shape[::-1] == tuple(target_shape):
        return tv.T
    return tv


def _subtree(tree: Any, path: str) -> Any:
    node = tree
    for p in path.split("/"):
        node = node[p]
    return node


def _set_subtree(tree: Dict[str, Any], path: str, value: Any) -> None:
    parts = path.split("/")
    node = tree
    for p in parts[:-1]:
        node = node[p]
    node[parts[-1]] = value


def port_icon_checkpoint(flax_params: Any,
                         icon_state: Optional[Dict[str, np.ndarray]] = None,
                         normal_state: Optional[Dict[str, np.ndarray]] = None,
                         allow_unknown: Sequence[str] = (),
                         ) -> Tuple[Dict[str, Any], Dict[str, Any], List[str]]:
    """Convert published reference checkpoints into HGPIFuNet variables.

    Args:
      flax_params: the ``variables["params"]`` tree of an initialized
        ``icon_tpu.models.hgpifu.HGPIFuNet``.
      icon_state: torch state dict of the geometry checkpoint
        (icon-filter.ckpt / pifu.ckpt / pamir.ckpt — ``netG.*`` keys).
      normal_state: torch state dict of normal.ckpt (``netG.netF/netB.*``).
      allow_unknown: key prefixes the caller explicitly permits the port to
        drop. Any OTHER unrecognized ``netG.*`` tensor raises — a published
        checkpoint whose module tree we do not fully understand must not
        load silently (VERDICT r4 #10; reference load semantics
        lib/dataset/mesh_util.py:187-237 keep every netG weight).

    Returns (new_params, batch_stats_updates, log). Raises if any flax
    parameter in a ported scope is left unassigned (silent partial loads are
    how quality bugs hide)."""
    flat = _flatten(flax_params)
    new_flat = dict(flat)
    stats_updates: Dict[str, np.ndarray] = {}
    log: List[str] = []
    assigned = set()

    def assign(fk: str, tv: np.ndarray, tk: str, collection: str) -> None:
        if collection == "batch_stats":
            stats_updates[fk] = tv
            log.append(f"{tk} -> batch_stats/{fk}")
            return
        if fk not in flat:
            raise KeyError(f"{tk}: mapped flax param {fk!r} does not exist")
        w = _convert_tensor(tv, flat[fk].shape)
        if w.shape != flat[fk].shape:
            raise ValueError(
                f"{tk} {tv.shape} -> {fk} {flat[fk].shape}: layout mismatch")
        new_flat[fk] = w.astype(flat[fk].dtype)
        assigned.add(fk)
        log.append(f"{tk} -> {fk}")

    unrecognized: List[str] = []
    if icon_state is not None:
        for tk, tv in icon_state.items():
            if any(s in tk for s in _SKIP_SUBSTR):
                continue
            if tk.startswith("netG.F_filter."):
                rel = tk[len("netG.F_filter."):]
                fk, coll = _map_hgfilter_key(rel, tv.ndim)
                if not fk:
                    continue
                fk = f"F_filter/{fk}"
                # unused bn4 in equal-channel ConvBlocks has no flax target
                if coll == "params" and fk not in flat and \
                        rel.split(".")[-2] == "bn4":
                    log.append(f"{tk} -> (skipped: unused bn4)")
                    continue
                assign(fk, tv, tk, coll)
            elif tk.startswith("netG.if_regressor."):
                rel = tk[len("netG.if_regressor."):]
                fk, coll = _map_mlp_key(rel, tv.ndim)
                if fk:
                    assign(f"if_regressor/{fk}", tv, tk, coll)
            elif tk.startswith(("netG.normal_filter.", "netG.reconEngine.",
                                "netG.voxelization.", "reconEngine.",
                                "voxelization.")):
                continue                     # mesh_util.py:200-205 filtering
            elif tk.startswith("netG.ve."):
                pass                         # ordered-matched below
            elif tk.startswith("netG.") and \
                    not any(tk.startswith(p) for p in allow_unknown):
                unrecognized.append(tk)
            else:
                # non-netG keys (optimizer moments, lr schedules, Lightning
                # bookkeeping) are not model weights — safe to drop
                log.append(f"{tk} -> (ignored)")
        if unrecognized:
            raise ValueError(
                f"geometry checkpoint holds {len(unrecognized)} netG "
                f"tensors this port does not recognize, e.g. "
                f"{unrecognized[:5]} — refusing to load a checkpoint "
                "whose module tree is not fully understood. Pass "
                "allow_unknown=(prefix, ...) to drop them explicitly.")
        if any(k.startswith("netG.ve.") for k in icon_state):
            # VE converts by NAME: our module names mirror lib/net/VE.py
            # (conv1/bn1/conv2/bn2, res{i}/{conv1,bn1,conv2,bn2,conv4}).
            # The torch side also registers modules its forward never uses
            # (conv_out1/conv_out2, per-block bn + conv3) — skip those.
            _VE_DEAD = ("conv_out1", "conv_out2", "conv3")
            for tk, tv in icon_state.items():
                if not tk.startswith("netG.ve."):
                    continue
                if any(s in tk for s in _SKIP_SUBSTR):
                    continue
                parts = tk[len("netG.ve."):].split(".")
                mods, leaf = parts[:-1], parts[-1]
                if any(m in _VE_DEAD for m in mods) or mods[-1] == "bn":
                    log.append(f"{tk} -> (skipped: unused torch module)")
                    continue
                if leaf == "running_mean":
                    stats_updates["/".join(["ve"] + mods + ["mean"])] = tv
                    continue
                if leaf == "running_var":
                    stats_updates["/".join(["ve"] + mods + ["var"])] = tv
                    continue
                if leaf == "weight":
                    leaf = "kernel" if tv.ndim >= 2 else "scale"
                assign("/".join(["ve"] + mods + [leaf]), tv, tk, "params")

        # completeness: every flax param in a ported scope must be hit
        scopes = ["F_filter/", "if_regressor/"]
        if any(k.startswith("netG.ve.") for k in icon_state):
            scopes.append("ve/")
        missing = [k for k in flat
                   if any(k.startswith(s) for s in scopes)
                   and k not in assigned]
        if missing:
            raise ValueError(
                f"geometry checkpoint left {len(missing)} flax params "
                f"unassigned, e.g. {missing[:5]}")

    if normal_state is not None:
        for side in ("netF", "netB"):
            sub = _subtree(flax_params, f"normal_filter/{side}")
            new_sub, sub_log = port_by_order(
                normal_state, sub, torch_prefix=f"netG.{side}.",
                flax_order=pix2pix_forward_order)
            for k, v in _flatten(new_sub).items():
                new_flat[f"normal_filter/{side}/{k}"] = v
            log += sub_log

    return _unflatten(new_flat), _unflatten(stats_updates), log


def scope_summary(params: Any, depth: int = 2) -> List[str]:
    """Per-scope tensor-count / weight-norm lines for a (ported) param tree —
    the at-a-glance check that all 200+ published tensors landed with sane
    magnitudes (a scope still at its init norm after a port is a red flag).
    ``depth`` path components group the scopes."""
    flat = _flatten(params)
    groups: Dict[str, List[np.ndarray]] = {}
    for k, v in flat.items():
        scope = "/".join(k.split("/")[:depth])
        groups.setdefault(scope, []).append(np.asarray(v))
    lines = []
    for scope in sorted(groups):
        vs = groups[scope]
        sq = sum(float((v.astype(np.float64) ** 2).sum()) for v in vs)
        n_el = sum(v.size for v in vs)
        lines.append(f"{scope}: {len(vs)} tensors, {n_el} params, "
                     f"L2={np.sqrt(sq):.3f}")
    return lines
