"""PIXIE weight-port proof: reference-named torch forward vs ported flax.

Torch twin: tests/torch_twins/pixie_twin.py (HRNet-W* body encoder with the
subsample 'concat' head, ResNet part experts, extractors, moderators and
regressors, checkpoint-shaped per-module state dicts). Ports its
random-init weights through ``icon_tpu.models.pixie.convert.port_pixie``
and asserts the coarse and fused parameter estimates agree
(VERDICT r2 missing #1)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

pytestmark = pytest.mark.slow


def _setup(seed=0, img=64):
    import jax
    from icon_tpu.models.pixie.net import PIXIE, PixieConfig

    cfg = PixieConfig(n_shape=12, n_exp=6, n_tex=4, n_light=5,
                      feat_dim=64, hr_width=8, hr_stem=16,
                      resnet_width=2, resnet_layers=(1, 1, 1, 1),
                      reg_channels=(32,), share_channels=(32, 32),
                      mod_channels=(32,))
    from tests.torch_twins.pixie_twin import PIXIETwin
    torch.manual_seed(seed)
    twin = PIXIETwin(feat_dim=cfg.feat_dim, hr_width=cfg.hr_width,
                     hr_stem=cfg.hr_stem, resnet_width=cfg.resnet_width,
                     resnet_layers=tuple(cfg.resnet_layers),
                     reg_channels=tuple(cfg.reg_channels),
                     share_channels=tuple(cfg.share_channels),
                     mod_channels=tuple(cfg.mod_channels),
                     n_shape=cfg.n_shape, n_exp=cfg.n_exp,
                     n_tex=cfg.n_tex, n_light=cfg.n_light)
    twin.eval()

    net = PIXIE(cfg=cfg)
    rng = np.random.RandomState(seed)
    imgs = {k: rng.rand(2, img, img, 3).astype(np.float32)
            for k in ("body", "head", "left_hand", "right_hand")}
    dummy = np.zeros((1, img, img, 3), np.float32)
    variables = net.init(jax.random.PRNGKey(0), dummy, dummy, dummy, dummy,
                         train=False)
    return cfg, twin, net, variables, imgs


def _port(twin, variables):
    from icon_tpu.models.pixie.convert import port_pixie
    new, log = port_pixie(twin.modules_state(), variables)
    learnable = {f"{m}.{k}" for m, mod in twin.mods.items()
                 for k, _ in mod.named_parameters()}
    mapped = {line.split(" ->")[0] for line in log}
    missing = sorted(learnable - mapped)
    assert not missing, f"unmapped learnable tensors: {missing[:8]}"
    return new


def _nchw(x):
    return torch.from_numpy(np.transpose(x, (0, 3, 1, 2)).copy())


@pytest.mark.nightly
def test_pixie_port_coarse_parity():
    import jax
    cfg, twin, net, variables, imgs = _setup()
    new = _port(twin, variables)

    with torch.no_grad():
        _, shares_t, params_t = twin.coarse(_nchw(imgs["body"]))
    f_body, shares = net.apply(new, imgs["body"], train=False,
                               method=net.encode_body)
    params = net.apply(new, f_body, shares, method=net.coarse_params)
    for p in ("head", "left_hand", "right_hand"):
        np.testing.assert_allclose(np.asarray(shares[p]),
                                   shares_t[p].numpy(), atol=2e-4,
                                   err_msg=f"share feature {p}")
    for k, v in params_t.items():
        np.testing.assert_allclose(np.asarray(params[k]), v.numpy(),
                                   atol=2e-4, err_msg=f"coarse param {k}")


def test_pixie_port_fused_parity():
    cfg, twin, net, variables, imgs = _setup(seed=1)
    new = _port(twin, variables)

    with torch.no_grad():
        params_t = twin(_nchw(imgs["body"]), _nchw(imgs["head"]),
                        _nchw(imgs["left_hand"]), _nchw(imgs["right_hand"]))
    f_body, shares = net.apply(new, imgs["body"], train=False,
                               method=net.encode_body)
    params, _ = net.apply(new, f_body, shares, imgs["head"],
                          imgs["left_hand"], imgs["right_hand"],
                          method=net.fused_params)
    for k, v in params_t.items():
        np.testing.assert_allclose(np.asarray(params[k]), v.numpy(),
                                   atol=3e-4, err_msg=f"fused param {k}")


def test_pose_abs2rel_inverts_fk():
    """pose_abs2rel: running FK on the converted relative pose must put
    the target joint at exactly the absolute rotation that was fed in."""
    import jax.numpy as jnp
    from icon_tpu.models.pixie.net import pose_abs2rel
    from icon_tpu.models.pymaf.geometry import rot6d_to_rotmat

    rng = np.random.RandomState(3)
    glob = rot6d_to_rotmat(jnp.asarray(
        rng.randn(2, 6).astype(np.float32))).reshape(2, 1, 3, 3)
    body = rot6d_to_rotmat(jnp.asarray(
        rng.randn(2 * 21, 6).astype(np.float32))).reshape(2, 21, 3, 3)

    for joint, chain in (("head", [15, 12, 9, 6, 3, 0]),
                         ("left_wrist", [20, 18, 16, 13, 9, 6, 3, 0]),
                         ("right_wrist", [21, 19, 17, 14, 9, 6, 3, 0])):
        rel = pose_abs2rel(glob, body, joint)
        full = jnp.concatenate([glob, rel], axis=1)
        acc = jnp.broadcast_to(jnp.eye(3), (2, 3, 3))
        for idx in chain[::-1]:               # root -> joint FK product
            acc = jnp.einsum("bij,bjk->bik", acc, full[:, idx])
        np.testing.assert_allclose(np.asarray(acc),
                                   np.asarray(body[:, chain[0] - 1]),
                                   atol=1e-5, err_msg=joint)


def test_euler_rotmat_roundtrip():
    from icon_tpu.models.pixie.net import euler_to_rotmat, rotmat_to_euler_xyz
    import jax.numpy as jnp
    rng = np.random.RandomState(0)
    eul = jnp.asarray(rng.uniform(-1.0, 1.0, (16, 3)).astype(np.float32))
    R = euler_to_rotmat(eul)
    # proper rotations
    np.testing.assert_allclose(
        np.asarray(jnp.einsum("bij,bkj->bik", R, R)),
        np.broadcast_to(np.eye(3), (16, 3, 3)), atol=1e-5)
    back = rotmat_to_euler_xyz(R)
    np.testing.assert_allclose(np.asarray(back), np.asarray(eul), atol=1e-5)
