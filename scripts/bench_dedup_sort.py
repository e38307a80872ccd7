"""Microbench: marching dedup sort formulations at production sizes.

(a) 5-operand lax.sort carrying x/y/z/order payloads through the sort network
(b) 2-operand lax.sort (key, order) + payload gathers at max_verts size
    (gathers shrink from M=3*max_tris to max_verts ~ M/6)
"""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
from icon_tpu.utils.jax_cache import enable; enable()
import numpy as np, jax, jax.numpy as jnp

MT = 393216            # autotuned bucket at 256^3 clothed human
MV = 196608
M = MT * 3

rng = np.random.RandomState(0)
# realistic keys: ~50% duplicated edge ids in sorted-cluster order + padding tail
eids = rng.randint(0, 2 ** 27, size=M // 2).astype(np.int32)
keys_np = np.concatenate([eids, eids[rng.randint(0, len(eids), M - len(eids))]])
keys_np[-M // 8:] = 2 ** 31 - 1          # padded slots
keys = jnp.asarray(keys_np)
x = jnp.asarray(rng.rand(M).astype(np.float32))
y = jnp.asarray(rng.rand(M).astype(np.float32))
z = jnp.asarray(rng.rand(M).astype(np.float32))


def compact(first, budget):
    n = first.shape[0]
    key = jnp.where(first, jnp.arange(n, dtype=jnp.int32), jnp.int32(2**31 - 1))
    neg = jax.lax.top_k(-key, budget)[0]
    return jnp.minimum(-neg, n - 1)


@jax.jit
def dedup5(keys, x, y, z):
    sk, sx, sy, sz, order = jax.lax.sort(
        (keys, x, y, z, jnp.arange(M, dtype=jnp.int32)), num_keys=1)
    first = jnp.concatenate([jnp.array([True]), sk[1:] != sk[:-1]])
    first = first & (sk != 2**31 - 1)
    vid = jnp.cumsum(first.astype(jnp.int32)) - 1
    vpos = compact(first, MV)
    vx, vy, vz = sx[vpos], sy[vpos], sz[vpos]
    soup = jnp.zeros((M,), jnp.int32).at[order].set(vid, unique_indices=True)
    return vx, vy, vz, soup


@jax.jit
def dedup2(keys, x, y, z):
    sk, order = jax.lax.sort((keys, jnp.arange(M, dtype=jnp.int32)), num_keys=1)
    first = jnp.concatenate([jnp.array([True]), sk[1:] != sk[:-1]])
    first = first & (sk != 2**31 - 1)
    vid = jnp.cumsum(first.astype(jnp.int32)) - 1
    vpos = compact(first, MV)
    src = order[vpos]                     # [MV] soup slot of each unique vert
    vx, vy, vz = x[src], y[src], z[src]
    soup = jnp.zeros((M,), jnp.int32).at[order].set(vid, unique_indices=True)
    return vx, vy, vz, soup


for name, fn in (("5-operand sort", dedup5), ("2-op sort + MV gathers", dedup2)):
    out = fn(keys, x, y, z); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(10):
        out = fn(keys, x, y, z)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / 10
    print(f"{name:28s} {dt*1e3:8.2f} ms")

# parity
a = [np.asarray(v) for v in dedup5(keys, x, y, z)]
b = [np.asarray(v) for v in dedup2(keys, x, y, z)]
for i, (u, v) in enumerate(zip(a, b)):
    assert (u == v).all(), f"mismatch operand {i}"
print("parity ok")
