"""HybrIK weight-port proof: reference-named torch forward vs ported flax.

Torch twin: tests/torch_twins/hybrik_twin.py (ResNet-34 ``preact`` +
deconv pyramid + 3D-heatmap soft-argmax + fc heads, reference state-dict
naming). Ports its random-init weights through
``icon_tpu.models.hybrik.convert.port_hybrik`` and asserts the IK inputs
(uvd / xyz / shape / phi / cam) agree (VERDICT r2 missing #1). The
analytical IK itself is weight-free and covered by
tests/test_pymaf_infer.py::test_hybrik_ik_recovers_joint_positions."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

# nightly tier (~140 s: full HybrIK twin forward) — review tier: `-m "slow and not nightly"`
pytestmark = [pytest.mark.slow, pytest.mark.nightly]


def _setup(seed=0, width=16, layers=(1, 1, 1, 1), img=64, depth=8, hm=16):
    import jax
    import jax.numpy as jnp
    from flax import linen as nn
    from icon_tpu.models.hybrik.net import HybrIK
    from tests.torch_twins.hybrik_twin import HybrIKTwin

    torch.manual_seed(seed)
    twin = HybrIKTwin(width=width, layers=layers, depth_dim=depth,
                      heatmap_size=hm, deconv_dim=(32, 32, 32))
    twin.eval()

    rest = np.zeros((24, 3), np.float32)
    parents = [0] * 24

    def smpl_forward(betas, rotmats):
        B = betas.shape[0]
        return (jnp.zeros((B, 8, 3)), jnp.zeros((B, 24, 3)))

    net = HybrIK(smpl_forward=smpl_forward, rest_joints=rest,
                 parents=tuple(parents), num_joints=24, num_hm_joints=29,
                 depth_dim=depth, heatmap_size=hm,
                 backbone_layers=layers, backbone_width=width,
                 deconv_filters=(32, 32, 32))
    rng = np.random.RandomState(seed)
    x = rng.rand(2, img, img, 3).astype(np.float32)
    import jax
    variables = net.init(jax.random.PRNGKey(0),
                         np.zeros((1, img, img, 3), np.float32))
    return twin, net, variables, x


def test_hybrik_port_forward_parity():
    import jax
    twin, net, variables, x = _setup()

    from icon_tpu.models.hybrik.convert import port_hybrik
    state = {k: v.detach().numpy() for k, v in twin.state_dict().items()}
    new, log = port_hybrik(state, variables)
    learnable = [k for k, _ in twin.named_parameters()] + ["init_shape"]
    mapped = {line.split(" ->")[0] for line in log}
    missing = [k for k in learnable if k not in mapped]
    assert not missing, f"unmapped learnable tensors: {missing[:8]}"

    xt = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)).copy())
    with torch.no_grad():
        uvd_t, xyz_t, shape_t, phi_t, cam_t = twin(xt)
    out = net.apply(new, x, train=False)
    np.testing.assert_allclose(np.asarray(out["pred_uvd_jts"]),
                               uvd_t.numpy(), atol=2e-5, err_msg="uvd")
    np.testing.assert_allclose(np.asarray(out["pred_xyz_jts"][:, :24]),
                               xyz_t[:, :24].numpy(), atol=2e-5,
                               err_msg="xyz")
    np.testing.assert_allclose(np.asarray(out["pred_shape"]),
                               shape_t.numpy(), atol=2e-4, err_msg="shape")
    np.testing.assert_allclose(np.asarray(out["pred_phi"]),
                               phi_t.numpy(), atol=2e-4, err_msg="phi")
    np.testing.assert_allclose(np.asarray(out["pred_camera"]),
                               cam_t.numpy(), atol=2e-4, err_msg="cam")
