"""PARE weight-port proof: reference-named torch forward vs ported flax.

Torch twin: tests/torch_twins/pare_twin.py (HRNet-W*-conv backbone +
part-attention head, reference state-dict naming). Ports its random-init
weights through ``icon_tpu.models.pare.convert.port_pare`` and asserts
backbone features and head predictions agree (VERDICT r2 missing #1)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

# nightly tier (~240/155 s: HRNet twin forwards at real sizes) — review tier: `-m "slow and not nightly"`
pytestmark = [pytest.mark.slow, pytest.mark.nightly]


def _setup(width=16, stage_modules=(1, 2, 2), img=64, seed=0):
    import jax
    from icon_tpu.models.pare.hrnet import HRNet
    from icon_tpu.models.pare.net import PareHead
    from flax import linen as nn
    from tests.torch_twins.pare_twin import PARETwin

    torch.manual_seed(seed)
    twin = PARETwin(width=width, stage_modules=stage_modules)
    twin.eval()

    class FlaxPare(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            feats = HRNet(width=width, stage_modules=stage_modules,
                          name="backbone")(x, train)
            return feats, PareHead(name="head")(feats, train)

    net = FlaxPare()
    rng = np.random.RandomState(seed)
    x = rng.randn(2, img, img, 3).astype(np.float32) * 0.5
    import jax
    variables = net.init(jax.random.PRNGKey(0),
                         np.zeros((1, img, img, 3), np.float32))
    return twin, net, variables, x


def _port(twin, variables):
    from icon_tpu.models.pare.convert import port_pare
    state = {f"{k}": v.detach().numpy()
             for k, v in twin.state_dict().items()}
    new, log = port_pare(state, variables)
    learnable = [k for k, _ in twin.named_parameters()]
    mapped = {line.split(" ->")[0] for line in log}
    missing = [k for k in learnable if k not in mapped]
    assert not missing, f"unmapped learnable tensors: {missing[:8]}"
    return new


def test_pare_port_forward_parity():
    twin, net, variables, x = _setup()
    new = _port(twin, variables)

    xt = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)).copy())
    with torch.no_grad():
        feats_t = twin.backbone(xt)
        pose_t, shape_t, cam_t, segm_t = twin(xt)

    feats_j, out_j = net.apply(new, x)
    np.testing.assert_allclose(
        np.transpose(np.asarray(feats_j), (0, 3, 1, 2)), feats_t.numpy(),
        atol=3e-4, rtol=1e-3)

    # head predictions: betas, cam, part segmentation, rotmats
    np.testing.assert_allclose(np.asarray(out_j["pred_shape"]),
                               shape_t.numpy(), atol=1e-3, rtol=1e-2)
    np.testing.assert_allclose(np.asarray(out_j["pred_cam"]),
                               cam_t.numpy(), atol=1e-3, rtol=1e-2)
    np.testing.assert_allclose(
        np.transpose(np.asarray(out_j["pred_segm_mask"]), (0, 3, 1, 2)),
        segm_t.numpy(), atol=1e-3, rtol=1e-2)
    # rotation matrices from the twin's 6D output must match ours
    from icon_tpu.models.pymaf.geometry import rot6d_to_rotmat
    B, J = pose_t.shape[:2]
    rot_t = np.asarray(rot6d_to_rotmat(
        np.asarray(pose_t.reshape(B * J, 6)))).reshape(B, J, 3, 3)
    np.testing.assert_allclose(np.asarray(out_j["pred_pose"]), rot_t,
                               atol=1e-3, rtol=1e-2)


@pytest.mark.slow
def test_pare_port_w32_parity():
    """Full HRNet-W32 geometry (the published checkpoint's shape)."""
    twin, net, variables, x = _setup(width=32, stage_modules=(1, 4, 3),
                                     img=224)
    new = _port(twin, variables)
    xt = torch.from_numpy(np.transpose(x[:1], (0, 3, 1, 2)).copy())
    with torch.no_grad():
        pose_t, shape_t, cam_t, _ = twin(xt)
    _, out_j = net.apply(new, x[:1])
    np.testing.assert_allclose(np.asarray(out_j["pred_shape"]),
                               shape_t.numpy(), atol=2e-3, rtol=1e-2)
    np.testing.assert_allclose(np.asarray(out_j["pred_cam"]),
                               cam_t.numpy(), atol=2e-3, rtol=1e-2)
