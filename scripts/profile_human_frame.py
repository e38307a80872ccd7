import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
import time, numpy as np, jax, jax.numpy as jnp
from icon_tpu.utils.jax_cache import enable; enable()
from icon_tpu.config import Config, NetConfig
from icon_tpu.models.hgpifu import HGPIFuNet
from icon_tpu.recon.engine import ReconEngine, reconstruction_resolutions
from icon_tpu.recon.marching import AutoMarcher
from icon_tpu.utils.synthetic import synthetic_icon_batch, clothed_human_occ
from icon_tpu.ops.sdf_fast import build_vertex_face_table

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
variables = net.init(jax.random.PRNGKey(0), batch, train=False)
res = reconstruction_resolutions(256)
eng = ReconEngine(res, faster=True, auto_budget=True, auto_headroom=1.3)
smpl_feat = {k: batch[k] for k in ("smpl_verts","smpl_faces","smpl_cmap","smpl_vis")}
smpl_feat["smpl_vf_table"] = jnp.asarray(build_vertex_face_table(np.asarray(batch["smpl_faces"]), batch["smpl_verts"].shape[1]))
from icon_tpu.ops.sdf_fast import build_column_bins, build_crossing_columns_blocked
_cx = np.linspace(-1.0, 1.0, 257, dtype=np.float32)
_cy = np.linspace(1.0, -1.0, 257, dtype=np.float32)
# compact tiles (the bench/infer serving configuration): only occupied
# lattice tiles run the crossing math
_cb, _cm, _tids = build_column_bins(np.asarray(batch["smpl_verts"][0]),
                                    np.asarray(batch["smpl_faces"]),
                                    _cx, _cy, compact=True)
_cb, _cm, _tids = jnp.asarray(_cb), jnp.asarray(_cm), jnp.asarray(_tids)
_cxj, _cyj = jnp.asarray(_cx), jnp.asarray(_cy)
columns_jit = jax.jit(lambda v: build_crossing_columns_blocked(
    v, smpl_feat["smpl_faces"], _cb, _cm, _cxj, _cyj, tile_ids=_tids))
smpl_feat["smpl_cross_meta"] = jnp.asarray([-1.0, 1.0, 128.0, -128.0, 257.0, 257.0], jnp.float32)
filter_jit = jax.jit(lambda v,t: net.apply(v,t,train=False,method=net.filter))
in_t = {k: batch[k] for k in ("image","normal_F","normal_B")}
features = filter_jit(variables, in_t)

def query_fn(pts, cross_z):
    smpl = dict(smpl_feat, smpl_cross_z=cross_z)
    preds = net.apply(variables, features, pts, batch["calib"], smpl, False, method=net.query)[-1]
    return preds*1e-6 + clothed_human_occ(pts)[..., None]

marcher = AutoMarcher(max_cells=1<<18, max_tris=1<<19, max_verts=1<<19, slice_one=True,
                      codec="lattice")
march_jit = lambda occ, coarse: marcher(occ, coarse_occ=coarse)

def sync(x): jax.block_until_ready(x)
for _ in range(2):
    cz = columns_jit(smpl_feat["smpl_verts"][0])[0]
    f = filter_jit(variables, in_t); sync(f)
    occ, stats = eng(query_fn, jit_levels=True, query_args=(cz,)); sync(occ)
    mesh = march_jit(occ, stats["coarse_occ"]); sync(mesh.n_cells)
    v, fc = marcher.unpack(marcher.pack(mesh))

for it in range(3):
    tc0=time.perf_counter()
    cz = columns_jit(smpl_feat["smpl_verts"][0])[0]; sync(cz)
    t0=time.perf_counter(); f=filter_jit(variables,in_t); sync(f); t1=time.perf_counter()
    occ, stats = eng(query_fn, jit_levels=True, query_args=(cz,)); sync(occ); t2=time.perf_counter()
    mesh = march_jit(occ, stats["coarse_occ"]); sync(mesh.n_cells); t3=time.perf_counter()
    token = marcher.pack(mesh); sync(token[0][0]); t35=time.perf_counter()
    v, fc = marcher.unpack(token); t4=time.perf_counter()
    print(f"columns {t0-tc0:.3f}  filter {t1-t0:.3f}  engine {t2-t1:.3f}  march {t3-t2:.3f}  pack {t35-t3:.3f}  fetch {t4-t35:.3f}  total {t4-tc0:.3f}  ntris {len(fc)} nverts {len(v)}")
print("levels:", {k:int(vv) for k,vv in stats.items() if k.endswith("_points")}, "buckets:", [eng._bucket(l) for l in (1,2)])

# pipelined throughput: enqueue next frame before blocking on fetch
def compute():
    cz = columns_jit(smpl_feat["smpl_verts"][0])[0]
    f = filter_jit(variables, in_t)
    occ, stats = eng(query_fn, jit_levels=True, query_args=(cz,))
    mesh = march_jit(occ, stats["coarse_occ"])
    return marcher.pack(mesh)
pending = compute()
t0 = time.perf_counter(); N=5
for _ in range(N):
    nxt = compute()            # enqueued (async dispatch)
    v, fc = marcher.unpack(pending)   # blocks on previous frame's copy
    pending = nxt
dt = (time.perf_counter()-t0)/N
print(f"pipelined: {dt:.3f} s/image  ({1/dt:.2f} images/s)")

# amortized engine-only fps: 5 consecutive evals, one final sync
cz = columns_jit(smpl_feat["smpl_verts"][0])[0]
occ, _ = eng(query_fn, jit_levels=True, query_args=(cz,)); sync(occ)
t0 = time.perf_counter()
for _ in range(5):
    occ, _ = eng(query_fn, jit_levels=True, query_args=(cz,))
sync(occ)
dt = (time.perf_counter()-t0)/5
print(f"engine amortized: {dt:.3f} s ({1/dt:.2f} fps)")
