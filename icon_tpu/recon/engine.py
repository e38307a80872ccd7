"""Coarse-to-fine occupancy reconstruction engine.

Re-design of the reference ``Seg3dLossless`` in "faster" mode
(lib/common/seg3d_lossless.py:152-265) with XLA-static shapes:

- resolutions 33 -> 65 -> 129 -> ... -> (mcube_res + 1), dense eval at the
  coarsest, then per level: trilinear align_corners upsample of both the
  occupancy and the >0.5 indicator, boundary voxels = indicator in (0, 1)
  dilated by a box filter (9/7/3 by level), minus already-evaluated voxels.
- The reference's data-dependent ``nonzero`` becomes a cumsum-compaction into
  a **fixed per-level point budget** (SURVEY.md §5 "Hard parts" #1): indices
  of boundary voxels pack into a static buffer, padded slots evaluate at a
  dummy coordinate and scatter with mode='drop'. Budget overflow is reported
  per level so callers can bump budgets instead of silently losing detail.
- In faster mode the final level is interpolation-only (the reference's
  "last step no examine"), matching its 4.88 -> 6.56 fps trade.

The world box is b_min=(-1, 1, -1), b_max=(1, -1, 1) (y flipped), matching
apps/ICON.py:78-90.
"""

from __future__ import annotations

import functools
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from icon_tpu.ops.resize import resize3d_trilinear_align_corners
from icon_tpu.ops.voxelize import smooth_conv3d

B_MIN = (-1.0, 1.0, -1.0)
B_MAX = (1.0, -1.0, 1.0)


def reconstruction_resolutions(mcube_res: int) -> Tuple[int, ...]:
    """Reference resolution ladder (apps/ICON.py:62-73): logspace powers of
    two from 32 to mcube_res, plus one (odd for align_corners)."""
    n = int(np.log2(mcube_res) - 4)
    res = np.logspace(5, np.log2(mcube_res), base=2, num=n, endpoint=True)
    return tuple(int(r) + 1 for r in res)


def default_budgets(resolutions: Sequence[int]) -> Tuple[int, ...]:
    """Per-level re-evaluation budgets (levels 1..n-1; faster mode never uses
    the last entry).

    Sized from measured dilated-boundary voxel counts: an ellipsoid body
    shell measures ~(4.3, 3.3, 1.7) * r^2 at the (9, 7, 3) dilation kernels;
    a clothed human has ~3x that surface area (limbs, folds), and a further
    ~1.3x headroom gives (18, 14, 7) * r^2. Padded budget slots still pay
    full query compute, so oversizing directly costs time; the engine
    reports per-level overflow so callers can raise budgets when a scan
    exceeds them (stats['levelN_overflow'])."""
    out = []
    for lv, r in enumerate(resolutions[1:], start=1):
        k = 9 if lv == 1 else (7 if lv == 2 else 3)
        mult = {9: 18, 7: 14, 3: 7}[k]
        out.append(min(r ** 3, mult * r * r))
    return tuple(out)


def _compact(mask_flat: jnp.ndarray, budget: int):
    """First ``budget`` true indices in linear order, via top_k over index
    keys — measured 2.2x faster than the cumsum+scatter formulation on v5e
    (70 ms vs 155 ms at 16.7M elements; TPU scatters serialize)."""
    n = mask_flat.shape[0]
    key = jnp.where(mask_flat, jnp.arange(n, dtype=jnp.int32),
                    jnp.int32(2 ** 31 - 1))
    k = min(budget, n)
    neg = jax.lax.top_k(-key, k)[0]
    idx = jnp.minimum(-neg, n - 1)          # padded slots clamp in-range
    if k < budget:
        idx = jnp.concatenate(
            [idx, jnp.full((budget - k,), n - 1, jnp.int32)])
    total = jnp.sum(mask_flat.astype(jnp.int32))
    return idx, jnp.minimum(total, budget), total


def _grid_to_world(coords01: jnp.ndarray) -> jnp.ndarray:
    """[..., 3] in [0,1] grid space (x,y,z) -> world (align_corners)."""
    bmin = jnp.asarray(B_MIN)
    bmax = jnp.asarray(B_MAX)
    return coords01 * (bmax - bmin) + bmin


class ReconEngine:
    """Occupancy-field evaluator. ``query_fn(points [1,N,3]) -> [1,N,1]``."""

    def __init__(self,
                 resolutions: Sequence[int],
                 budgets: Optional[Sequence[int]] = None,
                 balance: float = 0.5,
                 faster: bool = True,
                 exact: bool = False,
                 conflict_rounds: int = 2,
                 pad_multiple: int = 1,
                 auto_budget: bool = False,
                 auto_headroom: float = 1.5,
                 virtual_final: bool = False):
        """``exact`` adds the reference's conflict-resolution refinement
        (seg3d_lossless.py:267-471): evaluated points whose value flips the
        interpolated occupancy's side re-examine their unevaluated 3^3
        neighborhood, for ``conflict_rounds`` static rounds per level (the
        reference loops until empty; two rounds absorb >99% of flips on
        human shapes — stats report the residual). Exact mode also evaluates
        the final level (implies faster=False there)."""
        self.resolutions = tuple(resolutions)
        for r in self.resolutions:
            assert r % 2 == 1, "resolutions must be odd (align_corners)"
        budgets = tuple(budgets) if budgets is not None \
            else default_budgets(self.resolutions)
        m = max(pad_multiple, 1)
        self.pad_multiple = m
        # round budgets up so sharded queries split evenly across devices
        self.budgets = tuple(-(-b // m) * m for b in budgets)
        self.balance = balance
        self.faster = faster and not exact
        self.exact = exact
        self.conflict_rounds = conflict_rounds
        # auto_budget: steady-state budget autotuning — each frame sizes its
        # per-level point buffers from the latest LANDED boundary count x
        # headroom (counts ride an async d2h; _bucket never blocks on the
        # device), snapped to a geometric bucket ladder (one executable per
        # bucket, compile-cached). First frame and any frame after an
        # overflow use the configured (safe) budgets, so a scene change
        # degrades for the one-or-two frames the count fetch is in flight
        # before re-upsizing.
        self.auto_budget = auto_budget
        self.auto_headroom = auto_headroom
        # virtual_final (faster mode only): skip materializing the final
        # trilinear upsample — return the penultimate grid and let the
        # caller march its VIRTUAL 2x upsample on the fly
        # (recon.marching.marching_lattice_virtual / AutoMarcher(virtual=
        # True)). A MEMORY option for very high final resolutions (the
        # 1025^3 grid alone is 4.3 GB); at 257^3 the dense upsample is a
        # ~0.1 ms fused bandwidth op and the materialized path is faster —
        # see marching_lattice_virtual's docstring for the measurements.
        self.virtual_final = virtual_final and self.faster
        self._last_counts: Dict[int, jnp.ndarray] = {}
        self._last_hosts: Dict[int, int] = {}
        self._bucket_used: Dict[int, int] = {}
        self._jit_cache: Dict = {}

    def _bucket(self, lv: int) -> int:
        """Current budget bucket for level lv (1-based).

        Never blocks: the previous frame's boundary count is consumed only
        once its async d2h copy has landed (``.is_ready()``); until then the
        last chosen bucket is reused. A blocking ``int()`` here would chain
        each frame's Python dispatch to the previous frame's device
        execution — measured ~6 ms/frame of serialized dispatch at 257^3 on
        a tunneled v5e (engine 16.7 -> 18.5 fps with the lazy read)."""
        cap = self.budgets[lv - 1]
        if not self.auto_budget:
            return cap
        arr = self._last_counts.get(lv)
        if arr is not None:
            try:
                # First count ever for this level: BLOCK on it (one startup
                # sync) — otherwise a fully-pipelined serving loop that never
                # fetches to host would dispatch every frame at cap budgets
                # (measured: engine 17.0 -> 13.6 fps when the read stays lazy
                # forever, level-2 runs 232974 instead of ~90k points).
                # Steady-state reads stay lazy and reuse the last landed
                # bucket until the async copy completes.
                if lv not in self._last_hosts or \
                        getattr(arr, "is_ready", lambda: True)():
                    self._last_hosts[lv] = int(arr)
                    del self._last_counts[lv]
            except Exception:
                return cap
        if lv not in self._last_hosts:
            return self._bucket_used.get(lv, cap)
        need = self._last_hosts[lv]
        if need <= 0 or need > cap:       # overflow last frame -> reset
            self._bucket_used[lv] = cap
            return cap
        want = int(need * self.auto_headroom)
        # geometric ladder with ratio 1.25 quantized to 4096: padded budget
        # slots still pay full query compute, so a power-of-two ladder wastes
        # up to 2x headroom (e.g. 25k boundary points -> 65536 bucket); the
        # finer ladder caps the waste at ~1.25x while keeping the bucket set
        # small enough that stable fields reuse one executable per level.
        b = 4096
        while b < want:
            b = -(-int(b * 1.25) // 4096) * 4096
        # buckets must stay multiples of pad_multiple (sharded queries split
        # the point axis evenly), which 4096 alone does not guarantee for a
        # 3- or 6-device mesh
        m = self.pad_multiple
        b = -(-b // m) * m
        b = min(b, cap)
        self._bucket_used[lv] = b
        return b

    # ------------------------------------------------------------------
    # Level bodies. Each is pure so the caller (or __call__ in jit_levels
    # mode) can jit them separately — at mcube_res 256+ a single monolithic
    # graph (engine + network queries + marching) takes many minutes to
    # compile; per-level executables compile in parallel-friendly chunks and
    # are reused across frames.

    def _level0(self, query_fn, query_args=()):
        r0 = self.resolutions[0]
        g = jnp.linspace(0.0, 1.0, r0)
        zz, yy, xx = jnp.meshgrid(g, g, g, indexing="ij")
        pts01 = jnp.stack([xx, yy, zz], axis=-1).reshape(1, -1, 3)
        n = pts01.shape[1]
        pad = (-n) % self.pad_multiple
        if pad:
            pts01 = jnp.concatenate(
                [pts01, jnp.zeros((1, pad, 3), pts01.dtype)], axis=1)
        occ = query_fn(_grid_to_world(pts01),
                       *query_args)[:, :n].reshape(r0, r0, r0)
        evaluated = jnp.ones((r0, r0, r0), bool)
        return occ, evaluated

    def _upsample(self, occ, r):
        return resize3d_trilinear_align_corners(
            occ[None, ..., None], (r, r, r))[0, ..., 0]

    def _level_step(self, lv, occ, evaluated, query_fn, budget=None,
                    query_args=()):
        r = self.resolutions[lv]
        occ_up = self._upsample(occ, r)
        valid = resize3d_trilinear_align_corners(
            (occ > self.balance).astype(jnp.float32)[None, ..., None],
            (r, r, r))[0, ..., 0]
        boundary = (valid > 0.0) & (valid < 1.0)

        k = 9 if lv == 1 else (7 if lv == 2 else 3)
        boundary = smooth_conv3d(
            boundary.astype(jnp.float32)[None, ..., None], k)[0, ..., 0] > 0

        # exclude voxels already evaluated exactly at coarser levels
        # (reference coords_accum, seg3d_lossless.py:236-238): coarse
        # voxel (i,j,k) lands at fine (2i, 2j, 2k)
        ev = jnp.zeros((r, r, r), bool).at[::2, ::2, ::2].set(evaluated)
        boundary = boundary & ~ev

        budget = budget or self.budgets[lv - 1]
        idx, n_sel, n_total = _compact(boundary.reshape(-1), budget)

        def eval_at(idx, alive):
            cz = idx // (r * r)
            cy = (idx // r) % r
            cx = idx % r
            pts01 = jnp.stack([cx, cy, cz], -1).astype(jnp.float32) / (r - 1)
            vals = query_fn(_grid_to_world(pts01[None]),
                            *query_args)[0, :, 0]
            return vals

        vals = eval_at(idx, None)
        alive = jnp.arange(budget) < n_sel
        safe_idx = jnp.where(alive, idx, r ** 3)
        occ_up_flat = occ_up.reshape(-1)
        occ = occ_up_flat.at[safe_idx].set(
            vals, mode="drop").reshape(r, r, r)
        evaluated = ev.reshape(-1).at[safe_idx].set(
            True, mode="drop").reshape(r, r, r)

        n_conflicts = jnp.zeros((), jnp.int32)
        n_residual = jnp.zeros((), jnp.int32)
        if self.exact:
            # conflict resolution (reference seg3d_lossless.py:388-471):
            # where the fresh evaluation flips the interpolated side, the
            # 3^3 neighborhood must be examined too — interpolation there
            # was anchored on a wrong corner.
            bal = self.balance
            m = self.pad_multiple
            cbudget = -(-max(budget // 2, 1024) // m) * m
            cur_idx, cur_vals, cur_alive = idx, vals, alive
            for _ in range(self.conflict_rounds):
                interp = occ_up_flat[jnp.where(cur_alive, cur_idx, 0)]
                conflict = cur_alive & \
                    ((cur_vals - bal) * (interp - bal) < 0)
                n_conflicts = n_conflicts + jnp.sum(conflict)
                cz = cur_idx // (r * r)
                cy = (cur_idx // r) % r
                cx = cur_idx % r
                flags = jnp.zeros((r * r * r,), bool)
                for dz in (-1, 0, 1):
                    for dy in (-1, 0, 1):
                        for dx in (-1, 0, 1):
                            nx = jnp.clip(cx + dx, 0, r - 1)
                            ny = jnp.clip(cy + dy, 0, r - 1)
                            nz = jnp.clip(cz + dz, 0, r - 1)
                            nidx = (nz * r + ny) * r + nx
                            nidx = jnp.where(conflict, nidx, r ** 3)
                            flags = flags.at[nidx].set(True, mode="drop")
                flags = flags & ~evaluated.reshape(-1)
                idx2, n2, _ = _compact(flags, cbudget)
                vals2 = eval_at(idx2, None)
                alive2 = jnp.arange(cbudget) < n2
                safe2 = jnp.where(alive2, idx2, r ** 3)
                occ = occ.reshape(-1).at[safe2].set(
                    vals2, mode="drop").reshape(r, r, r)
                evaluated = evaluated.reshape(-1).at[safe2].set(
                    True, mode="drop").reshape(r, r, r)
                cur_idx, cur_vals, cur_alive = idx2, vals2, alive2
            # residual: side flips among the FINAL round's evaluations whose
            # 3^3 neighborhoods were never examined — the quantity the
            # reference's loop-until-empty drives to zero
            # (seg3d_lossless.py:388-471). Zero residual == converged.
            interp = occ_up_flat[jnp.where(cur_alive, cur_idx, 0)]
            n_residual = jnp.sum(
                cur_alive & ((cur_vals - self.balance) *
                             (interp - self.balance) < 0))
        return occ, evaluated, n_total, (n_conflicts, n_residual)

    def __call__(self, query_fn: Callable[..., jnp.ndarray],
                 jit_levels: bool = False, query_args: tuple = ()):
        """Returns (occ [R, R, R] float32 in [z, y, x] layout, stats dict).

        With ``jit_levels`` each level becomes its own cached executable
        (key: id-stable self + lv); pass False when the whole call is
        already inside an outer jit.

        ``query_args``: per-frame tensors for ``query_fn(pts, *query_args)``,
        passed through the cached executables as REAL jit arguments. Any
        tensor a serving loop swaps between frames (per-body crossing
        columns, refreshed image features) MUST ride here: values merely
        captured in query_fn's closure are baked into the executable as
        constants at first trace and silently go stale on later frames.
        """
        res = self.resolutions
        stats: Dict[str, jnp.ndarray] = {}

        def wrap(key, fn):
            if not jit_levels:
                return fn
            cache_key = (key, id(query_fn))
            if cache_key not in self._jit_cache:
                self._jit_cache[cache_key] = jax.jit(fn)
            return self._jit_cache[cache_key]

        occ, evaluated = wrap("l0", lambda *qa: self._level0(
            query_fn, qa))(*query_args)

        n_levels = len(res)
        for lv in range(1, n_levels):
            is_last = lv == n_levels - 1
            if is_last and self.faster:
                # expose the pre-upsample grid: marching can derive its
                # active cells from the coarse mixed cells (trilinear
                # upsampling cannot create crossings outside them)
                stats["coarse_occ"] = occ
                if self.virtual_final:
                    # caller marches the virtual upsample directly; the
                    # dense final grid is never written
                    stats["final_res"] = res[lv]
                    break
                occ = wrap(("up", lv),
                           lambda o, r=res[lv]: self._upsample(o, r))(occ)
                break
            budget = self._bucket(lv)
            step = wrap(("step", lv, budget),
                        lambda o, e, *qa, lv=lv, b=budget: self._level_step(
                            lv, o, e, query_fn, budget=b, query_args=qa))
            occ, evaluated, n_total, n_conf = step(occ, evaluated,
                                                   *query_args)
            if self.auto_budget:
                self._last_counts[lv] = n_total   # read lazily next frame
                try:    # overlap the scalar d2h with remaining levels —
                        # a blocking fetch on the tunneled device costs
                        # ~15-30 ms per round trip
                    n_total.copy_to_host_async()
                except Exception:
                    pass
            stats[f"level{lv}_points"] = n_total
            stats[f"level{lv}_overflow"] = jnp.maximum(n_total - budget, 0)
            if self.exact:
                stats[f"level{lv}_conflicts"] = n_conf[0]
                stats[f"level{lv}_residual"] = n_conf[1]
        return occ, stats
