"""Checkpointing with partial warm-start and true resume (reference
apps/train.py:30-61, 90-98, 166-229 + mesh_util.py:187-237).

The reference's policy, reproduced on orbax:
- saving strips the frozen submodules (normal_filter / voxelization /
  reconEngine) from the state dict (train.py:37-45);
- resuming supports (a) **full resume** — params, batch_stats, optimizer
  state, and step all restore, so the loss curve continues where it stopped
  (Lightning's resume_from_checkpoint, train.py:166-176); (b) *partial*
  warm-start that keeps only name-and-shape-matching entries
  (train.py:191-229); and (c) loading the separately-trained normal net under
  the ``normal_filter`` scope (train.py:201-218's netG -> netG.normal_filter
  renaming).
- ``CheckpointManager`` retains the top-k checkpoints by validation loss
  (the reference's ModelCheckpoint(save_top_k=3, monitor='val/avgloss'),
  train.py:90-98) plus the most recent one for resuming.
"""

from __future__ import annotations

import json
import os
import shutil
from typing import Any, Dict, List, Optional, Sequence, Tuple

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
    """Save params, batch_stats, optimizer state, and step. Frozen normal-net
    weights are dropped when strip_frozen (they ship in their own
    checkpoint); the optimizer state is kept whole so resume continues the
    schedule exactly."""
    path = os.path.join(os.path.abspath(ckpt_dir), f"ckpt_{step}")
    payload = {
        "step": np.asarray(state.step),
        "params": jax.device_get(state.params),
        "batch_stats": jax.device_get(getattr(state, "batch_stats", {})),
        "opt_state": jax.device_get(getattr(state, "opt_state", ())),
    }
    if strip_frozen:
        payload["params"] = {
            k: v for k, v in payload["params"].items()
            if k not in STRIP_SCOPES
        }
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(path, payload, force=True)
    return path


def load_checkpoint(path: str, target: Optional[Any] = None
                    ) -> Dict[str, Any]:
    """Restore a checkpoint; pass ``target`` (a matching pytree) to recover
    exact container types (optax namedtuple states restore as dicts
    otherwise)."""
    ckptr = ocp.PyTreeCheckpointer()
    if target is None:
        return ckptr.restore(os.path.abspath(path))
    return ckptr.restore(os.path.abspath(path), item=target)


def restore_state(state: Any, path: str) -> Any:
    """Full resume: restore params/batch_stats/opt_state/step into an
    existing TrainState (shapes must match — same config)."""
    import jax.numpy as jnp
    params_t = dict(jax.device_get(state.params))
    for scope in STRIP_SCOPES:       # saved checkpoints omit frozen scopes
        params_t.pop(scope, None)
    target = {
        "step": np.asarray(state.step),
        "params": params_t,
        "batch_stats": jax.device_get(getattr(state, "batch_stats", {})),
        "opt_state": jax.device_get(state.opt_state),
    }
    loaded = load_checkpoint(path, target=target)
    # params may have been saved stripped (frozen scopes): merge name+shape
    params = partial_warm_start(state.params, loaded["params"])
    kwargs = dict(
        step=jnp.asarray(loaded["step"]),
        params=params,
        opt_state=jax.tree_util.tree_map(jnp.asarray,
                                         loaded["opt_state"]))
    if hasattr(state, "batch_stats"):   # NormalTrainState has none
        kwargs["batch_stats"] = (loaded.get("batch_stats")
                                 or state.batch_stats)
    return state.replace(**kwargs)


class CheckpointManager:
    """Top-k on a monitored metric + always-keep-latest
    (reference ModelCheckpoint(save_top_k=3), train.py:90-98)."""

    def __init__(self, ckpt_dir: str, top_k: int = 3, mode: str = "min"):
        self.dir = os.path.abspath(ckpt_dir)
        self.top_k = top_k
        self.mode = mode
        self.records: List[Tuple[float, str]] = []
        self.latest: Optional[str] = None
        os.makedirs(self.dir, exist_ok=True)
        self._index = os.path.join(self.dir, "index.json")
        if os.path.exists(self._index):
            with open(self._index) as f:
                data = json.load(f)
            self.records = [tuple(r) for r in data.get("records", [])]
            self.latest = data.get("latest")

    def save(self, step: int, state: Any, metric: float) -> str:
        path = save_checkpoint(self.dir, step, state)
        prev_latest = self.latest
        self.latest = path
        self.records.append((float(metric), path))
        key = (lambda r: r[0]) if self.mode == "min" else (lambda r: -r[0])
        self.records.sort(key=key)
        keep = {p for _, p in self.records[:self.top_k]} | {self.latest}
        for _, p in self.records[self.top_k:]:
            if p not in keep and os.path.exists(p):
                shutil.rmtree(p, ignore_errors=True)
        self.records = self.records[:self.top_k]
        if prev_latest and prev_latest not in keep and \
                os.path.exists(prev_latest):
            shutil.rmtree(prev_latest, ignore_errors=True)
        with open(self._index, "w") as f:
            json.dump({"records": self.records, "latest": self.latest}, f)
        return path

    @property
    def best(self) -> Optional[str]:
        return self.records[0][1] if self.records else None


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
