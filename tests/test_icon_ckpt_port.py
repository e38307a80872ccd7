"""Published-checkpoint ingestion parity (the reference's trained weights).

The reference demo loads two torch checkpoints (lib/dataset/mesh_util.py:
187-237): the geometry net (``netG.F_filter.* / netG.if_regressor.*`` from
icon-filter.ckpt / pifu.ckpt) and the normal net (``netG.netF/netB.*`` from
normal.ckpt, renamed ``netG -> netG.normal_filter``). These tests build torch
twins with the reference's exact module names (HGFilters.py / MLP.py /
net_util.py ConvBlock / FBNet.py define_G), save a state dict with the
published key layout, convert via ``port_icon_checkpoint``, and assert the
flax ``filter()`` + ``query()`` forwards match the torch composition to
<=1e-4 — i.e. the demo reproduces reference-quality outputs when pointed at
the published files.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

from icon_tpu.config import load_config
from icon_tpu.models.hgpifu import HGPIFuNet, channel_split, mlp_first_dim
from icon_tpu.utils.torch_port import load_torch_state, port_icon_checkpoint

ICON_CFG = "/root/reference/configs/icon-filter.yaml"
PIFU_CFG = "/root/reference/configs/pifu.yaml"


# ---------------------------------------------------------------------------
# torch twins with the reference's exact module names (state-dict layout of
# the published checkpoints; lib/net/HGFilters.py + net_util.py + MLP.py)
# ---------------------------------------------------------------------------

def _gn(c):
    return nn.GroupNorm(32, c)


class TorchConvBlock(nn.Module):
    def __init__(self, inp, outp):
        super().__init__()
        self.conv1 = nn.Conv2d(inp, outp // 2, 3, padding=1, bias=False)
        self.conv2 = nn.Conv2d(outp // 2, outp // 4, 3, padding=1, bias=False)
        self.conv3 = nn.Conv2d(outp // 4, outp // 4, 3, padding=1, bias=False)
        self.bn1, self.bn2 = _gn(inp), _gn(outp // 2)
        self.bn3, self.bn4 = _gn(outp // 4), _gn(inp)
        if inp != outp:
            self.downsample = nn.Sequential(
                self.bn4, nn.ReLU(True),
                nn.Conv2d(inp, outp, 1, bias=False))
        else:
            self.downsample = None

    def forward(self, x):
        o1 = self.conv1(F.relu(self.bn1(x)))
        o2 = self.conv2(F.relu(self.bn2(o1)))
        o3 = self.conv3(F.relu(self.bn3(o2)))
        out = torch.cat([o1, o2, o3], 1)
        res = x if self.downsample is None else self.downsample(x)
        return out + res


class TorchHourGlass(nn.Module):
    def __init__(self, depth, feats):
        super().__init__()
        self.depth = depth
        for lv in range(depth, 0, -1):
            self.add_module(f"b1_{lv}", TorchConvBlock(feats, feats))
            self.add_module(f"b2_{lv}", TorchConvBlock(feats, feats))
            if lv == 1:
                self.add_module(f"b2_plus_{lv}", TorchConvBlock(feats, feats))
            self.add_module(f"b3_{lv}", TorchConvBlock(feats, feats))

    def _fwd(self, lv, x):
        up1 = self._modules[f"b1_{lv}"](x)
        low1 = self._modules[f"b2_{lv}"](F.avg_pool2d(x, 2, stride=2))
        if lv > 1:
            low2 = self._fwd(lv - 1, low1)
        else:
            low2 = self._modules[f"b2_plus_{lv}"](low1)
        low3 = self._modules[f"b3_{lv}"](low2)
        up2 = F.interpolate(low3, scale_factor=2, mode="bicubic",
                            align_corners=True)
        return up1 + up2

    def forward(self, x):
        return self._fwd(self.depth, x)


class TorchHGFilter(nn.Module):
    def __init__(self, in_dim, num_stack, depth, hg_dim):
        super().__init__()
        self.num_stack = num_stack
        self.conv1 = nn.Conv2d(in_dim, 64, 7, stride=2, padding=3)
        self.bn1 = _gn(64)
        self.conv2 = TorchConvBlock(64, 128)
        self.conv3 = TorchConvBlock(128, 128)
        self.conv4 = TorchConvBlock(128, 256)
        for i in range(num_stack):
            self.add_module(f"m{i}", TorchHourGlass(depth, 256))
            self.add_module(f"top_m_{i}", TorchConvBlock(256, 256))
            self.add_module(f"conv_last{i}", nn.Conv2d(256, 256, 1))
            self.add_module(f"bn_end{i}", _gn(256))
            self.add_module(f"l{i}", nn.Conv2d(256, hg_dim, 1))
            if i < num_stack - 1:
                self.add_module(f"bl{i}", nn.Conv2d(256, 256, 1))
                self.add_module(f"al{i}", nn.Conv2d(hg_dim, 256, 1))

    def forward(self, x):
        x = F.relu(self.bn1(self.conv1(x)), True)
        x = F.avg_pool2d(self.conv2(x), 2, stride=2)
        x = self.conv4(self.conv3(x))
        prev, outs = x, []
        for i in range(self.num_stack):
            hg = self._modules[f"m{i}"](prev)
            ll = self._modules[f"top_m_{i}"](hg)
            ll = F.relu(self._modules[f"bn_end{i}"](
                self._modules[f"conv_last{i}"](ll)), True)
            tmp = self._modules[f"l{i}"](ll)
            outs.append(tmp)
            if i < self.num_stack - 1:
                prev = prev + self._modules[f"bl{i}"](ll) + \
                    self._modules[f"al{i}"](tmp)
        return outs


class TorchMLP(nn.Module):
    def __init__(self, channels, res_layers, norm="batch", sigmoid=True):
        super().__init__()
        self.filters = nn.ModuleList()
        self.norms = nn.ModuleList()
        self.res_layers = res_layers
        self.sigmoid = sigmoid
        for l in range(len(channels) - 1):
            cin = channels[l] + (channels[0] if l in res_layers else 0)
            self.filters.append(nn.Conv1d(cin, channels[l + 1], 1))
            if l != len(channels) - 2:
                self.norms.append(nn.BatchNorm1d(channels[l + 1])
                                  if norm == "batch"
                                  else nn.GroupNorm(32, channels[l + 1]))

    def forward(self, y):
        tmpy = y
        for i, f in enumerate(self.filters):
            y = f(y if i not in self.res_layers else torch.cat([y, tmpy], 1))
            if i != len(self.filters) - 1:
                y = F.leaky_relu(self.norms[i](y), 0.01)
        return torch.sigmoid(y) if self.sigmoid else y


def _build_twins(cfg, seed=0):
    """Torch geometry twin + state dict keyed like the published ckpt."""
    torch.manual_seed(seed)
    net = cfg.net
    in_dim = len(channel_split(cfg)[0])
    hg = TorchHGFilter(in_dim, net.num_stack, net.num_hourglass,
                       net.hourglass_dim)
    mlp_ch = (mlp_first_dim(cfg),) + tuple(net.mlp_dim[1:])
    mlp = TorchMLP(mlp_ch, list(net.res_layers), norm=net.norm_mlp,
                   sigmoid=not cfg.test_mode)
    # push the BatchNorm running stats off their init so eval mode actually
    # exercises the ported statistics
    mlp.train()
    with torch.no_grad():
        for _ in range(3):
            mlp(torch.randn(2, mlp_ch[0], 64))
    hg.eval(), mlp.eval()

    state = {}
    for k, v in hg.state_dict().items():
        state[f"netG.F_filter.{k}"] = v
    for k, v in mlp.state_dict().items():
        state[f"netG.if_regressor.{k}"] = v
    # published ckpts may carry stripped-scope stragglers; must be ignored
    state["netG.normal_filter.netF.model.dummy.weight"] = torch.zeros(1)
    return hg, mlp, state


def _init_flax(cfg, rng=0):
    net = HGPIFuNet(cfg)
    small = jnp.zeros((1, 64, 64, 3))
    # no normal_F/B in the init batch: get_normal must trace normal_filter
    # so the params tree has the scope the normal.ckpt port targets
    batch = {"image": small, "T_normal_F": small, "T_normal_B": small,
             "sample": jnp.zeros((1, 8, 3)), "calib": jnp.eye(4)[None]}
    if cfg.net.prior_type == "icon":
        batch.update({
            "smpl_verts": jnp.zeros((1, 32, 3)),
            "smpl_faces": jnp.zeros((16, 3), jnp.int32),
            "smpl_cmap": jnp.zeros((1, 32, 3)),
            "smpl_vis": jnp.zeros((1, 32, 1)),
        })
    elif cfg.net.prior_type == "pamir":
        batch.update({
            "voxel_verts": jnp.zeros((1, 500, 3)),
            "voxel_codes": jnp.zeros((500, 3)),
        })
    # jit the init like the demo does: the pytree round-trip re-sorts dict
    # keys alphabetically, so the port must NOT depend on insertion order
    variables = jax.jit(lambda k, b: net.init(k, b, train=False))(
        jax.random.PRNGKey(rng), batch)
    return net, variables


def _port(variables, state_dict, tmp_path, normal_state=None):
    ckpt = str(tmp_path / "geo.ckpt")
    torch.save({"state_dict": state_dict}, ckpt)
    tstate = load_torch_state(ckpt)
    params, stats, log = port_icon_checkpoint(
        variables["params"], icon_state=tstate, normal_state=normal_state)
    new_vars = dict(variables)
    new_vars["params"] = params
    if stats:
        from icon_tpu.training.checkpoints import partial_warm_start
        new_vars["batch_stats"] = partial_warm_start(
            variables.get("batch_stats", {}), stats)
    return new_vars, log


@pytest.mark.slow
@pytest.mark.nightly
def test_icon_filter_ckpt_port(tmp_path):
    """icon-filter.ckpt layout: filter() parity on the icon prior (dual
    F_filter over channel splits + concat) and MLP parity on the ported
    if_regressor incl. BatchNorm running stats."""
    cfg = load_config(ICON_CFG).replace(test_mode=False)
    hg, mlp, state = _build_twins(cfg)
    net, variables = _init_flax(cfg)
    new_vars, log = _port(variables, state, tmp_path)
    assert any("F_filter" in l for l in log)

    rs = np.random.RandomState(1)
    nF = rs.randn(1, 64, 64, 3).astype(np.float32)
    nB = rs.randn(1, 64, 64, 3).astype(np.float32)
    with torch.no_grad():
        fF = hg(torch.from_numpy(nF).permute(0, 3, 1, 2))
        fB = hg(torch.from_numpy(nB).permute(0, 3, 1, 2))
        ref = torch.cat([fF[-1], fB[-1]], 1).permute(0, 2, 3, 1).numpy()

    feats = net.apply(new_vars, {"normal_F": jnp.asarray(nF),
                                 "normal_B": jnp.asarray(nB)},
                      False, method=net.filter)
    np.testing.assert_allclose(np.asarray(feats[-1]), ref,
                               rtol=1e-3, atol=1e-4)

    # if_regressor parity (BatchNorm eval-mode running stats)
    c0 = mlp.filters[0].in_channels
    pf = rs.randn(1, 128, c0).astype(np.float32)
    with torch.no_grad():
        ref_mlp = mlp(torch.from_numpy(pf).permute(0, 2, 1))
    ref_mlp = ref_mlp.permute(0, 2, 1).numpy()
    out = net.apply(new_vars, jnp.asarray(pf), False,
                    method=lambda m, f, t: m.if_regressor(f, t))
    np.testing.assert_allclose(np.asarray(out), ref_mlp,
                               rtol=1e-3, atol=1e-4)


@pytest.mark.slow
def test_pifu_ckpt_port_full_query(tmp_path):
    """pifu.ckpt layout: full filter()+query() parity — grid sample + z
    feature + in-cube masking + sigmoid MLP, all with ported weights."""
    cfg = load_config(PIFU_CFG).replace(test_mode=False)
    torch.manual_seed(3)
    hg = TorchHGFilter(cfg.net.in_geo_dim, cfg.net.num_stack,
                       cfg.net.num_hourglass, cfg.net.hourglass_dim)
    mlp_ch = (mlp_first_dim(cfg),) + tuple(cfg.net.mlp_dim[1:])
    mlp = TorchMLP(mlp_ch, list(cfg.net.res_layers), norm=cfg.net.norm_mlp)
    mlp.train()
    with torch.no_grad():
        for _ in range(3):
            mlp(torch.randn(2, mlp_ch[0], 64))
    hg.eval(), mlp.eval()
    state = {}
    for k, v in hg.state_dict().items():
        state[f"netG.F_filter.{k}"] = v
    for k, v in mlp.state_dict().items():
        state[f"netG.if_regressor.{k}"] = v

    net = HGPIFuNet(cfg)
    small = jnp.zeros((1, 64, 64, 3))
    batch = {"image": small, "T_normal_F": small, "T_normal_B": small,
             "normal_F": small, "normal_B": small,
             "sample": jnp.zeros((1, 8, 3)), "calib": jnp.eye(4)[None]}
    variables = net.init(jax.random.PRNGKey(0), batch, train=False)
    new_vars, _ = _port(variables, state, tmp_path)

    rs = np.random.RandomState(2)
    img = rs.randn(1, 64, 64, 3).astype(np.float32)
    nF = rs.randn(1, 64, 64, 3).astype(np.float32)
    nB = rs.randn(1, 64, 64, 3).astype(np.float32)
    pts = rs.uniform(-1.2, 1.2, (1, 96, 3)).astype(np.float32)
    calib = np.eye(4, dtype=np.float32)[None]

    with torch.no_grad():
        in_filter = torch.from_numpy(
            np.concatenate([img, nF, nB], -1)).permute(0, 3, 1, 2)
        feat = hg(in_filter)[-1]
        xy = torch.from_numpy(pts[..., :2]).view(1, -1, 1, 2)
        pf = F.grid_sample(feat, xy, align_corners=True)[..., 0]  # [B,C,N]
        z = torch.from_numpy(pts[..., 2:3]).permute(0, 2, 1)
        pred = mlp(torch.cat([pf, z], 1))
        in_cube = torch.from_numpy(
            np.all((pts > -1) & (pts < 1), -1, keepdims=True)
            .astype(np.float32)).permute(0, 2, 1)
        ref = (pred * in_cube).permute(0, 2, 1).numpy()

    in_t = {"image": jnp.asarray(img), "normal_F": jnp.asarray(nF),
            "normal_B": jnp.asarray(nB)}
    feats = net.apply(new_vars, in_t, False, method=net.filter)
    preds = net.apply(new_vars, feats, jnp.asarray(pts), jnp.asarray(calib),
                      None, False, method=net.query)
    np.testing.assert_allclose(np.asarray(preds[-1]), ref,
                               rtol=1e-3, atol=1e-4)


class TorchVEResidual(nn.Module):
    """Residual3D twin incl. the modules lib/net/VE.py registers but never
    uses in forward (bn, conv3) — present in pamir.ckpt, must be skipped."""

    def __init__(self, nin, nout):
        super().__init__()
        self.bn = nn.BatchNorm3d(nin)                       # dead
        self.conv1 = nn.Conv3d(nin, nout, 3, padding=2, dilation=2)
        self.bn1 = nn.BatchNorm3d(nout)
        self.conv2 = nn.Conv3d(nout, nout, 3, padding=1)
        self.bn2 = nn.BatchNorm3d(nout)
        self.conv3 = nn.Conv3d(nout, nout, 3, padding=1)    # dead
        if nin != nout:
            self.conv4 = nn.Conv3d(nin, nout, 1)

    def forward(self, x):
        out = self.bn2(self.conv2(F.relu(self.bn1(self.conv1(x)))))
        res = self.conv4(x) if hasattr(self, "conv4") else x
        return out + res


class TorchVE(nn.Module):
    def __init__(self, nout, stacks):
        super().__init__()
        self.stacks = stacks
        self.conv1 = nn.Conv3d(3, 8, 5, stride=2, padding=4, dilation=2)
        self.bn1 = nn.BatchNorm3d(8)
        self.conv2 = nn.Conv3d(8, nout, 5, stride=2, padding=4, dilation=2)
        self.bn2 = nn.BatchNorm3d(nout)
        self.conv_out1 = nn.Conv3d(nout, nout, 3, padding=1)  # dead
        self.conv_out2 = nn.Conv3d(nout, nout, 3, padding=1)  # dead
        for i in range(stacks):
            self.add_module(f"res{i}", TorchVEResidual(nout, nout))

    def forward(self, x):
        out = F.relu(self.bn2(self.conv2(F.relu(self.bn1(self.conv1(x))))))
        outs = []
        for i in range(self.stacks):
            out = self._modules[f"res{i}"](out)
            outs.append(out)
        return outs


@pytest.mark.slow
def test_pamir_ckpt_port_ve(tmp_path):
    """pamir.ckpt layout: the netG.ve.* entries port by NAME into the
    VolumeEncoder scope (the torch side's dead bn/conv3/conv_out* entries
    are skipped) and the eval-mode VE forward matches incl. BatchNorm
    running stats."""
    from icon_tpu.models.volume_encoder import VolumeEncoder

    cfg = load_config("/root/reference/configs/pamir.yaml").replace(
        test_mode=False)
    net, variables = _init_flax(cfg)

    torch.manual_seed(9)
    tve = TorchVE(cfg.net.voxel_dim, cfg.net.num_stack)
    tve.train()
    with torch.no_grad():
        for _ in range(3):
            tve(torch.randn(1, 3, 32, 32, 32))
    tve.eval()

    hg, mlp, state = _build_twins(cfg, seed=10)
    for k, v in tve.state_dict().items():
        state[f"netG.ve.{k}"] = v
    new_vars, log = _port(variables, state, tmp_path)
    assert any("skipped: unused torch module" in l for l in log)

    rs = np.random.RandomState(4)
    vol = rs.randn(1, 32, 32, 32, 3).astype(np.float32)
    with torch.no_grad():
        ref = tve(torch.from_numpy(vol).permute(0, 4, 1, 2, 3))[-1]
    ref = ref.permute(0, 2, 3, 4, 1).numpy()

    ve = VolumeEncoder(num_out=cfg.net.voxel_dim,
                       num_stacks=cfg.net.num_stack)
    out = ve.apply({"params": new_vars["params"]["ve"],
                    "batch_stats": new_vars["batch_stats"]["ve"]},
                   jnp.asarray(vol), False)[-1]
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-3, atol=1e-4)


@pytest.mark.slow
@pytest.mark.nightly
def test_normal_ckpt_port_into_hgpifu(tmp_path):
    """normal.ckpt layout (netG.netF/netB) ports into the normal_filter
    scope and predict_normals matches the torch forward (unit-normalize +
    foreground mask; NormalNet.py:74-99)."""
    from test_torch_port import torch_global_generator

    cfg = load_config(ICON_CFG).replace(test_mode=False)
    net, variables = _init_flax(cfg)

    torch.manual_seed(5)
    tF = torch_global_generator(input_nc=6, ngf=64, n_down=4, n_blocks=9)
    tB = torch_global_generator(input_nc=6, ngf=64, n_down=4, n_blocks=9)
    tF.eval(), tB.eval()
    nstate = {}
    for k, v in tF.state_dict().items():
        nstate[f"netG.netF.model.{k}"] = v
    for k, v in tB.state_dict().items():
        nstate[f"netG.netB.model.{k}"] = v
    ckpt = str(tmp_path / "normal.ckpt")
    torch.save({"state_dict": nstate}, ckpt)

    params, _, log = port_icon_checkpoint(
        variables["params"], normal_state=load_torch_state(ckpt))
    assert any("netF" in l for l in log)
    new_vars = dict(variables)
    new_vars["params"] = params

    rs = np.random.RandomState(7)
    img = rs.randn(1, 64, 64, 3).astype(np.float32)
    img[:, :8] = 0.0                                   # background rows
    tnF = rs.randn(1, 64, 64, 3).astype(np.float32)
    tnB = rs.randn(1, 64, 64, 3).astype(np.float32)

    def tfwd(gen, a, b):
        x = torch.from_numpy(np.concatenate([a, b], -1)).permute(0, 3, 1, 2)
        with torch.no_grad():
            y = gen(x)
        y = y / torch.norm(y, dim=1, keepdim=True)
        m = (torch.from_numpy(img).permute(0, 3, 1, 2).abs().sum(
            1, keepdim=True) != 0).float()
        return (y * m).permute(0, 2, 3, 1).numpy()

    refF = tfwd(tF, img, tnF)
    refB = tfwd(tB, img, tnB)

    outF, outB = net.apply(new_vars,
                           {"image": jnp.asarray(img),
                            "T_normal_F": jnp.asarray(tnF),
                            "T_normal_B": jnp.asarray(tnB)},
                           False, method=net.predict_normals)
    np.testing.assert_allclose(np.asarray(outF), refF, rtol=1e-3, atol=2e-4)
    np.testing.assert_allclose(np.asarray(outB), refB, rtol=1e-3, atol=2e-4)


# ---------------------------------------------------------------------------
# full-chain ICON-prior twin (VERDICT r4 #4): torch grid_sample + the
# reference's cal_sdf math + feat_select + the ported MLP, composed exactly
# as HGPIFuNet.query does for prior_type=icon (HGPIFuNet.py:268-367,
# mesh_util.py:266-396), vs our net.query with ported weights — including
# the sdf-clip outlier branch.
# ---------------------------------------------------------------------------


def _torch_point_tri_features(points, verts, faces, cmaps, vis):
    """Reference cal_sdf_batch in plain torch (mesh_util.py:357-396) on a
    SPHERE body so check_sign is analytic: brute-force closest triangle,
    Heidrich barycentric projection weights, PyTorch3D-style area-weighted
    vertex normals, dist/sqrt(3), sign positive inside."""
    P, V, F = len(points), len(verts), len(faces)
    tri = verts[faces]                                   # [F, 3, 3]

    # closest point on each triangle (plane projection or nearest edge)
    v0, v1, v2 = tri[:, 0], tri[:, 1], tri[:, 2]
    n = torch.cross(v1 - v0, v2 - v0, dim=-1)            # [F, 3]
    p = points[:, None]                                  # [P, 1, 3]
    w = p - v0[None]
    n2 = (n * n).sum(-1).clamp_min(1e-12)[None]
    b2 = ((torch.cross(v1[None] - v0[None], w, dim=-1) * n[None]).sum(-1)
          / n2)
    b1 = ((torch.cross(w, v2[None] - v0[None], dim=-1) * n[None]).sum(-1)
          / n2)
    b0 = 1.0 - b1 - b2
    inside = (b0 >= 0) & (b1 >= 0) & (b2 >= 0) & \
        (b0 <= 1) & (b1 <= 1) & (b2 <= 1)
    pn = (w * n[None]).sum(-1) / n2
    proj = p - pn[..., None] * n[None]                   # [P, F, 3]
    d_in = ((p - proj) ** 2).sum(-1)

    def seg(a, b):
        e = (b - a)[None]
        t = (((p - a[None]) * e).sum(-1) /
             (e * e).sum(-1).clamp_min(1e-12)).clamp(0, 1)
        q = a[None] + t[..., None] * e
        return ((p - q) ** 2).sum(-1)

    d_edge = torch.minimum(torch.minimum(seg(v0, v1), seg(v1, v2)),
                           seg(v2, v0))
    d2 = torch.where(inside, d_in, d_edge)               # [P, F]
    residues, pts_ind = d2.min(dim=1)

    # PyTorch3D verts_normals semantics: accumulate unnormalized face cross
    # products, then normalize
    vn = torch.zeros(V, 3)
    for k in range(3):
        vn.index_add_(0, faces[:, k], n)
    vn = torch.nn.functional.normalize(vn, dim=-1)

    closest = tri[pts_ind]                               # [P, 3, 3]
    # Heidrich barycentric coordinates of the projection (mesh_util.py:319)
    u_ = closest[:, 1] - closest[:, 0]
    v_ = closest[:, 2] - closest[:, 0]
    nn_ = torch.cross(u_, v_, dim=-1)
    s = (nn_ * nn_).sum(-1)
    s[s == 0] = 1e-6
    w_ = points - closest[:, 0]
    bb2 = (torch.cross(u_, w_, dim=-1) * nn_).sum(-1) / s
    bb1 = (torch.cross(w_, v_, dim=-1) * nn_).sum(-1) / s
    bw = torch.stack([1 - bb1 - bb2, bb1, bb2], -1)      # [P, 3]

    fidx = faces[pts_ind]                                # [P, 3]
    pts_cmap = (cmaps[fidx] * bw[..., None]).sum(1)
    pts_vis = ((vis[fidx] * bw[..., None]).sum(1) >= 1e-1).float()
    pts_norm = (vn[fidx] * bw[..., None]).sum(1) * \
        torch.tensor([-1.0, 1.0, -1.0])
    pts_dist = residues.sqrt() / np.sqrt(3.0)
    return pts_dist, pts_norm, pts_cmap, pts_vis, pts_ind


@pytest.mark.slow
def test_icon_full_query_chain_twin(tmp_path):
    """End-to-end icon-prior query parity with ported published-layout
    weights: filter -> grid_sample -> cal_sdf features (incl. the +-5 cm
    outlier clip writing sdf into cmap) -> feat_select by visibility ->
    concat order -> MLP -> in_cube mask."""
    cfg = load_config(ICON_CFG).replace(test_mode=False)
    assert cfg.net.prior_type == "icon"
    hg, mlp, state = _build_twins(cfg)

    from icon_tpu.utils.synthetic import icosphere
    from icon_tpu.ops.sdf_fast import (build_ray_bins,
                                       build_vertex_face_table)
    radius = 0.45
    v, f = icosphere(subdiv=2, radius=radius)
    V, F = len(v), len(f)
    rs = np.random.RandomState(5)
    cmap_np = rs.rand(V, 3).astype(np.float32)
    vis_np = (rs.rand(V, 1) > 0.4).astype(np.float32)

    # calib: anisotropic scale + shift so projection actually transforms
    calib_np = np.eye(4, dtype=np.float32)
    calib_np[0, 0], calib_np[1, 1], calib_np[2, 2] = 0.9, 1.1, 0.95
    calib_np[:3, 3] = [0.05, -0.03, 0.02]

    net = HGPIFuNet(cfg)
    small = jnp.zeros((1, 64, 64, 3))
    init_batch = {
        "normal_F": small, "normal_B": small,
        "sample": jnp.zeros((1, 8, 3)), "calib": jnp.asarray(calib_np)[None],
        "smpl_verts": jnp.zeros((1, V, 3)),
        "smpl_faces": jnp.zeros((F, 3), jnp.int32),
        "smpl_cmap": jnp.zeros((1, V, 3)),
        "smpl_vis": jnp.zeros((1, V, 1)),
        "smpl_vf_table": jnp.zeros((V, 8), jnp.int32),
    }
    variables = jax.jit(lambda k, b: net.init(k, b, train=False))(
        jax.random.PRNGKey(0), init_batch)
    new_vars, _ = _port(variables, state, tmp_path)

    # query points: half hugging the surface (inlier branch: |sdf| < 5 cm),
    # half uniform in the cube (mostly outliers + some out-of-cube)
    n_near, n_far = 256, 256
    dirs = rs.randn(n_near, 3).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    r_jit = radius + rs.uniform(-0.03, 0.03, (n_near, 1)).astype(np.float32)
    pts_np = np.concatenate([
        dirs * r_jit,
        rs.uniform(-1.1, 1.1, (n_far, 3)).astype(np.float32)]).astype(
            np.float32)

    nF = rs.randn(1, 64, 64, 3).astype(np.float32)
    nB = rs.randn(1, 64, 64, 3).astype(np.float32)

    # ---- our side: net.filter + net.query on the production feature path
    vf = build_vertex_face_table(f, V)
    rb, rg = build_ray_bins(v, f)
    smpl_feat = {
        "smpl_verts": jnp.asarray(v)[None],
        "smpl_faces": jnp.asarray(f),
        "smpl_cmap": jnp.asarray(cmap_np)[None],
        "smpl_vis": jnp.asarray(vis_np)[None],
        "smpl_vf_table": jnp.asarray(vf),
        "smpl_ray_bins": jnp.asarray(rb),
        "smpl_ray_grid": jnp.asarray(rg),
    }
    feats = net.apply(new_vars, {"normal_F": jnp.asarray(nF),
                                 "normal_B": jnp.asarray(nB)},
                      False, method=net.filter)
    ours = net.apply(new_vars, feats, jnp.asarray(pts_np)[None],
                     jnp.asarray(calib_np)[None], smpl_feat, False,
                     method=net.query)[-1]
    ours = np.asarray(ours)[0, :, 0]

    # ---- torch side: the reference composition (HGPIFuNet.py:268-367)
    with torch.no_grad():
        fF = hg(torch.from_numpy(nF).permute(0, 3, 1, 2))
        fB = hg(torch.from_numpy(nB).permute(0, 3, 1, 2))
        im_feat = torch.cat([fF[-1], fB[-1]], 1)          # [1, 2*hg, H, W]

        calib_t = torch.from_numpy(calib_np)
        pts_t = torch.from_numpy(pts_np)                  # [N, 3]
        xyz = pts_t @ calib_t[:3, :3].T + calib_t[:3, 3]  # orthogonal()
        in_cube = ((xyz > -1.0) & (xyz < 1.0)).all(-1, keepdim=True).float()

        dist, norm_t, cmap_t, vis_t, _ = _torch_point_tri_features(
            xyz, torch.from_numpy(v), torch.from_numpy(np.asarray(f)).long(),
            torch.from_numpy(cmap_np), torch.from_numpy(vis_np))
        # analytic check_sign on the sphere: positive inside
        sign = torch.where(xyz.norm(dim=-1) < radius, 1.0, -1.0)
        sdf = (dist * sign)[:, None]

        # outlier clip (HGPIFuNet.py:297-305): sdf -> sign, cmap -> sdf
        clip = cfg.sdf_clip / 100.0
        outlier = sdf.abs() >= clip
        sdf = torch.where(outlier, sdf.sign(), sdf)
        cmap_t = torch.where(outlier.repeat(1, 3), sdf.repeat(1, 3), cmap_t)
        smpl_pt = torch.cat([sdf, cmap_t, norm_t, vis_t], dim=1)  # [N, 8]

        # grid_sample align_corners=True at xy (geometry.py:21-43)
        uv = xyz[None, :, None, :2]                        # [1, N, 1, 2]
        sampled = torch.nn.functional.grid_sample(
            im_feat, uv, align_corners=True)[0, :, :, 0]   # [2*hg, N]
        # feat_select by visibility (mesh_util.py:266-277)
        hgd = im_feat.shape[1] // 2
        sel = vis_t.T                                      # [1, N]
        idx = ((1 - sel).repeat(hgd, 1) * hgd +
               torch.arange(hgd)[:, None]).long()
        picked = torch.gather(sampled, 0, idx)             # [hg, N]

        point_feat = torch.cat([picked, smpl_pt[:, :-1].T], 0)[None]
        ref = mlp(point_feat) * in_cube.T[None]
    ref = ref[0, 0].numpy()

    np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-4)
    # both branches actually exercised
    xyz_np = pts_np @ calib_np[:3, :3].T + calib_np[:3, 3]
    d_true = np.abs(np.linalg.norm(xyz_np, axis=-1) - radius) / np.sqrt(3)
    assert (d_true < clip).sum() > 50, "inlier branch not exercised"
    assert (d_true >= clip).sum() > 50, "outlier branch not exercised"
