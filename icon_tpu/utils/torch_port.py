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

from typing import Any, Dict, List, Sequence, Tuple

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


def port_by_order(torch_state: Dict[str, np.ndarray],
                  flax_params: Any,
                  torch_prefix: str = "",
                  verbose: bool = False) -> Tuple[Any, List[str]]:
    """Zip torch weight tensors with flax kernels in declaration order.

    Torch entries are taken in the state-dict's insertion order (module
    definition order == forward order for the reference's Sequentials).
    Weight layouts are inferred from tensor rank:
      4D -> Conv2d (or ConvTranspose2d when O-dim mismatch suggests it),
      5D -> Conv3d, 2D -> Dense/Linear, 1D -> bias/scale.

    Returns (new_params, log of mappings). Raises on shape mismatch.
    """
    t_items = [(k, v) for k, v in torch_state.items()
               if k.startswith(torch_prefix) and "num_batches_tracked" not in k]
    flat = _flatten(flax_params)
    f_keys = sorted(flat.keys())

    # order flax params: group by module path in name order; kernels first
    # within a layer is torch's convention (weight then bias)
    def sort_key(k):
        parts = k.split("/")
        return (parts[:-1], 0 if parts[-1] in ("kernel", "scale") else 1)

    # pair sequentially by tensor role
    t_weights = [(k, v) for k, v in t_items if v.ndim >= 2]
    t_vectors = [(k, v) for k, v in t_items if v.ndim == 1]
    f_kernels = [k for k in f_keys if flat[k].ndim >= 2]
    f_vectors = [k for k in f_keys if flat[k].ndim == 1]

    if len(t_weights) != len(f_kernels):
        raise ValueError(f"kernel count mismatch: torch {len(t_weights)} vs "
                         f"flax {len(f_kernels)}")

    log = []
    # flax param order must follow definition order; flax dict iteration is
    # insertion-ordered from module init, so use the unsorted flat order
    flat_ordered = list(_flatten(flax_params).items())
    fk_ordered = [k for k, v in flat_ordered if v.ndim >= 2]
    fv_ordered = [k for k, v in flat_ordered if v.ndim == 1]

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

    return _unflatten(new_flat), log


def load_torch_state(path: str) -> Dict[str, np.ndarray]:
    """Load a torch checkpoint to numpy (CPU, weights only)."""
    import torch
    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    state = ckpt.get("state_dict", ckpt)
    return {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v)
            for k, v in state.items()}
