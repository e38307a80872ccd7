"""Checkpointing with partial warm-start (reference apps/train.py:30-61,
177-229 + mesh_util.py:187-237).

The reference's policy, reproduced on orbax:
- saving strips the frozen submodules (normal_filter / voxelization /
  reconEngine) from the state dict (train.py:37-45);
- resuming supports (a) full resume, (b) *partial* warm-start that keeps only
  name-and-shape-matching entries (train.py:191-229), and (c) loading the
  separately-trained normal net under the ``normal_filter`` scope
  (train.py:201-218's netG -> netG.normal_filter renaming).
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional, Sequence

import numpy as np
import jax
import orbax.checkpoint as ocp

STRIP_SCOPES = ("normal_filter",)


def _flatten(tree: Any, prefix: str = "") -> Dict[str, np.ndarray]:
    out = {}
    if isinstance(tree, dict) or hasattr(tree, "items"):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}{k}/"))
    else:
        out[prefix[:-1]] = np.asarray(tree)
    return out


def save_checkpoint(ckpt_dir: str, step: int, state: Any,
                    strip_frozen: bool = True) -> str:
    """Save (params, batch_stats, opt_state, step); frozen normal-net weights
    are dropped when strip_frozen (they ship in their own checkpoint)."""
    path = os.path.join(os.path.abspath(ckpt_dir), f"ckpt_{step}")
    payload = {
        "step": np.asarray(state.step),
        "params": jax.device_get(state.params),
        "batch_stats": jax.device_get(getattr(state, "batch_stats", {})),
    }
    if strip_frozen:
        payload["params"] = {
            k: v for k, v in payload["params"].items()
            if k not in STRIP_SCOPES
        }
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(path, payload, force=True)
    return path


def load_checkpoint(path: str) -> Dict[str, Any]:
    ckptr = ocp.PyTreeCheckpointer()
    return ckptr.restore(os.path.abspath(path))


def partial_warm_start(init_params: Any, loaded_params: Any,
                       rename: Optional[Dict[str, str]] = None) -> Any:
    """Merge loaded entries into init_params keeping only name+shape matches
    (the reference's filtered load, train.py:191-229). ``rename`` maps
    loaded top-level scopes to target scopes (e.g. {"netG": "normal_filter"}
    for the normal checkpoint)."""
    from flax.core import unfreeze, freeze

    init_flat = _flatten(unfreeze(init_params) if hasattr(
        init_params, "unfreeze") else init_params)
    loaded_flat = _flatten(loaded_params)
    if rename:
        renamed = {}
        for k, v in loaded_flat.items():
            for src, dst in rename.items():
                if k.startswith(src + "/"):
                    k = dst + k[len(src):]
                    break
            renamed[k] = v
        loaded_flat = renamed

    merged = dict(init_flat)
    n_hit = 0
    for k, v in loaded_flat.items():
        if k in merged and merged[k].shape == v.shape:
            merged[k] = v
            n_hit += 1

    # unflatten
    out: Dict[str, Any] = {}
    for k, v in merged.items():
        node = out
        parts = k.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return out
