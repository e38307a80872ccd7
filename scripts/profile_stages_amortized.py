"""Amortized per-stage device cost of the serving frame (no per-call sync
tax): each stage runs 8x back-to-back with one final block, so the tunneled
link's ~15-25 ms round-trip latency is not billed to the stage."""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
import time, numpy as np, jax, jax.numpy as jnp
from icon_tpu.utils.jax_cache import enable; enable()
from icon_tpu.config import Config, NetConfig
from icon_tpu.models.hgpifu import HGPIFuNet
from icon_tpu.recon.engine import ReconEngine, reconstruction_resolutions
from icon_tpu.recon.marching import AutoMarcher
from icon_tpu.utils.synthetic import synthetic_icon_batch, clothed_human_occ
from icon_tpu.ops.sdf_fast import (build_vertex_face_table, build_column_bins,
                                   build_crossing_columns_blocked)

cfg = Config(test_mode=False, net=NetConfig(
    mlp_dim=(256,512,256,128,1), res_layers=(2,3,4), num_stack=2,
    prior_type="icon", use_filter=True,
    in_geo=(("normal_F",3),("normal_B",3)),
    in_nml=(("image",3),("T_normal_F",3),("T_normal_B",3)),
    smpl_feats=("sdf","norm","vis","cmap"), norm_mlp="batch",
    hourglass_dim=6, smpl_dim=7))
net = HGPIFuNet(cfg)
rng = np.random.RandomState(0)
batch = synthetic_icon_batch(rng, B=1, image_size=512, n_samples=64, subdiv=5)
batch = {k: jnp.asarray(v) for k,v in batch.items()}
variables = jax.jit(lambda k, b: net.init(k, b, train=False))(
    jax.random.PRNGKey(0), batch)
res = reconstruction_resolutions(256)
eng = ReconEngine(res, faster=True, auto_budget=True, auto_headroom=1.3)
smpl_feat = {k: batch[k] for k in ("smpl_verts","smpl_faces","smpl_cmap","smpl_vis")}
smpl_feat["smpl_vf_table"] = jnp.asarray(build_vertex_face_table(
    np.asarray(batch["smpl_faces"]), batch["smpl_verts"].shape[1]))
_cx = np.linspace(-1.0, 1.0, 257, dtype=np.float32)
_cy = np.linspace(1.0, -1.0, 257, dtype=np.float32)
_cb, _cm = build_column_bins(np.asarray(batch["smpl_verts"][0]),
                             np.asarray(batch["smpl_faces"]), _cx, _cy)
_cb, _cm = jnp.asarray(_cb), jnp.asarray(_cm)
_cxj, _cyj = jnp.asarray(_cx), jnp.asarray(_cy)
columns_jit = jax.jit(lambda v: build_crossing_columns_blocked(
    v, smpl_feat["smpl_faces"], _cb, _cm, _cxj, _cyj))
smpl_feat["smpl_cross_meta"] = jnp.asarray(
    [-1.0, 1.0, 128.0, -128.0, 257.0, 257.0], jnp.float32)
filter_jit = jax.jit(lambda v,t: net.apply(v,t,train=False,method=net.filter))
in_t = {k: batch[k] for k in ("image","normal_F","normal_B")}
features = filter_jit(variables, in_t)

def query_fn(pts, cross_z):
    smpl = dict(smpl_feat, smpl_cross_z=cross_z)
    preds = net.apply(variables, features, pts, batch["calib"], smpl, False,
                      method=net.query)[-1]
    return preds*1e-6 + clothed_human_occ(pts)[..., None]

marcher = AutoMarcher(max_cells=1<<18, max_tris=1<<19, max_verts=1<<19,
                      slice_one=True)

# warm everything (3x so auto buckets settle)
for _ in range(3):
    cz = columns_jit(smpl_feat["smpl_verts"][0])[0]
    occ, stats = eng(query_fn, jit_levels=True, query_args=(cz,))
    mesh = marcher(occ, coarse_occ=stats["coarse_occ"])
    v, fc = marcher.unpack(marcher.pack(mesh))
cz = columns_jit(smpl_feat["smpl_verts"][0])[0]
occ, stats = eng(query_fn, jit_levels=True, query_args=(cz,))
mesh = marcher(occ, coarse_occ=stats["coarse_occ"])

R = 8
def amortize(name, fn, out_of):
    o = fn()
    jax.block_until_ready(out_of(o))
    t0 = time.perf_counter()
    for _ in range(R):
        o = fn()
    jax.block_until_ready(out_of(o))
    print(f"{name:34s} {(time.perf_counter()-t0)/R*1e3:8.2f} ms")
    return o

amortize("columns (257^2 raster)", lambda: columns_jit(smpl_feat["smpl_verts"][0]), lambda o: o[0])
amortize("filter (hourglass 512^2 x2)", lambda: filter_jit(variables, in_t), lambda o: o)
amortize("engine (3 levels + upsample)", lambda: eng(query_fn, jit_levels=True, query_args=(cz,))[0], lambda o: o)
# engine per level
l0 = eng._jit_cache[[k for k in eng._jit_cache if k[0]=="l0"][0]]
amortize("  level0 33^3 dense", lambda: l0(cz), lambda o: o[0])
occ0, ev0 = l0(cz)
by_level = {}
for k in eng._jit_cache:
    if isinstance(k[0], tuple) and k[0][0] == "step":
        by_level[k[0][1]] = k         # last-inserted bucket per level wins
steps = [by_level[lv] for lv in sorted(by_level)]
state = (occ0, ev0)
for k in steps:
    fn = eng._jit_cache[k]
    cur = state
    o = amortize(f"  step lv{k[0][1]} budget {k[0][2]}", lambda fn=fn, cur=cur: fn(cur[0], cur[1], cz), lambda o: o[0])
    state = (o[0], o[1])
ups = [k for k in eng._jit_cache if isinstance(k[0], tuple) and k[0][0]=="up"]
if ups:
    fn = eng._jit_cache[ups[0]]
    amortize("  final upsample -> 257^3", lambda: fn(state[0]), lambda o: o)
amortize("march (tables+compact+sort)", lambda: marcher(occ, coarse_occ=stats["coarse_occ"]), lambda o: o.faces)
amortize("pack", lambda: marcher.pack(mesh)[0][0], lambda o: o)

# lattice-codec march + pack (the serving path)
lat = AutoMarcher(max_cells=1<<18, max_tris=1<<19, max_verts=1<<19,
                  slice_one=True, codec="lattice")
for _ in range(3):
    out = lat(occ, coarse_occ=stats["coarse_occ"])
    v, fc = lat.unpack(lat.pack(out))
outl = lat(occ, coarse_occ=stats["coarse_occ"])
amortize("march lattice", lambda: lat(occ, coarse_occ=stats["coarse_occ"]), lambda o: o.vert_eid)
amortize("pack lattice", lambda: lat.pack(outl)[0][0], lambda o: o)
import time as _t
t0=_t.perf_counter()
for _ in range(5):
    v, fc = lat.unpack(lat.pack(outl))
print(f"{'pack+fetch+decode lattice':34s} {(_t.perf_counter()-t0)/5*1e3:8.2f} ms   ({len(fc)} faces)")
