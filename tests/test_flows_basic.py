"""Round-trip tests for the basic flow layers (mirrors reference
``flows/*_test.py`` coverage via the FlowTest fixture)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import nf_tpu.flows as nf
from nf_tpu.nets import MLP
from nf_tpu.utils import create_alternating_binary_mask

from helpers import (
    check_forward_inverse,
    check_inverse_forward,
    check_log_det_jacobian,
)

KEY = jax.random.PRNGKey(0)
BATCH = 5


def test_affine_const_flow():
    flow = nf.AffineConstFlow.create((4,))
    flow = flow.replace(s=jnp.asarray([[0.3, -0.2, 0.1, 0.0]]),
                        t=jnp.asarray([[1.0, 2.0, -1.0, 0.5]]))
    x = jax.random.normal(KEY, (BATCH, 4))
    check_forward_inverse(flow, x)
    check_log_det_jacobian(flow, x)


def test_affine_const_flow_image_shape():
    flow = nf.AffineConstFlow.create((3, 1, 1))
    flow = flow.replace(s=0.2 * jnp.ones((1, 3, 1, 1)))
    x = jax.random.normal(KEY, (2, 3, 4, 4))
    check_forward_inverse(flow, x)
    # log det should count H*W broadcast positions
    _, ld = flow.forward(x)
    np.testing.assert_allclose(np.asarray(ld), 16 * 0.2 * 3 * np.ones(2),
                               rtol=1e-5)


def test_cc_affine_const():
    flow = nf.CCAffineConst.create((4,), num_classes=3)
    key1, key2 = jax.random.split(KEY)
    flow = flow.replace(s_cc=0.1 * jax.random.normal(key1, (3, 4)),
                        t_cc=jax.random.normal(key2, (3, 4)))
    x = jax.random.normal(KEY, (BATCH, 4))
    y = jnp.asarray([0, 1, 2, 0, 1])
    z, ld = flow.forward(x, y)
    x_, ld_ = flow.inverse(z, y)
    np.testing.assert_allclose(np.asarray(x_), np.asarray(x), atol=1e-5)
    np.testing.assert_allclose(np.asarray(ld + ld_), np.zeros(BATCH),
                               atol=1e-5)


def test_masked_affine_flow():
    b = create_alternating_binary_mask(4)
    k1, k2 = jax.random.split(KEY)
    s = MLP.create(k1, [4, 16, 4], init_zeros=False)
    t = MLP.create(k2, [4, 16, 4], init_zeros=False)
    flow = nf.MaskedAffineFlow.create(b, t=t, s=s)
    x = jax.random.normal(KEY, (BATCH, 4))
    check_forward_inverse(flow, x, atol=1e-4)
    check_log_det_jacobian(flow, x)


def test_affine_coupling_block_scale_maps():
    for scale_map in ["exp", "sigmoid", "sigmoid_inv"]:
        pm = MLP.create(KEY, [2, 8, 4])
        flow = nf.AffineCouplingBlock.create(pm, scale_map=scale_map)
        x = jax.random.normal(KEY, (BATCH, 4))
        check_forward_inverse(flow, x, atol=1e-4)
        check_log_det_jacobian(flow, x)


def test_planar_leaky_relu_inverse():
    flow = nf.Planar.create(KEY, (3,), act="leaky_relu")
    x = jax.random.normal(KEY, (BATCH, 3))
    check_forward_inverse(flow, x, atol=1e-4)
    check_log_det_jacobian(flow, x)


def test_planar_tanh_forward_logdet():
    flow = nf.Planar.create(KEY, (3,), act="tanh")
    x = jax.random.normal(KEY, (BATCH, 3))
    check_log_det_jacobian(flow, x)


def test_radial_forward_logdet():
    flow = nf.Radial.create(KEY, (3,))
    x = jax.random.normal(KEY, (BATCH, 3))
    check_log_det_jacobian(flow, x)


def test_actnorm_init_and_roundtrip():
    flow = nf.ActNorm.create((4,))
    x = 3.0 + 2.0 * jax.random.normal(KEY, (100, 4))
    flow, z, _ = flow.init_data_inverse(x)
    assert flow.initialized
    np.testing.assert_allclose(np.asarray(jnp.mean(z, 0)), np.zeros(4),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(jnp.std(z, 0, ddof=1)), np.ones(4),
                               atol=1e-3)
    check_forward_inverse(flow, x)


def test_batchnorm_forward():
    flow = nf.BatchNorm()
    x = 3.0 + 2.0 * jax.random.normal(KEY, (100, 4))
    z, log_det = flow.forward(x)
    np.testing.assert_allclose(np.asarray(jnp.mean(z, 0)), np.zeros(4),
                               atol=1e-5)
    assert log_det.shape == (100,)


def test_permute_modes():
    for mode in ["shuffle", "swap"]:
        flow = nf.Permute.create(KEY, 6, mode=mode)
        x = jax.random.normal(KEY, (BATCH, 6))
        check_forward_inverse(flow, x)


def test_invertible_1x1_conv():
    for use_lu in [False, True]:
        flow = nf.Invertible1x1Conv.create(KEY, 4, use_lu=use_lu)
        x = jax.random.normal(KEY, (2, 4, 3, 3))
        check_forward_inverse(flow, x, atol=2e-4)
        check_inverse_forward(flow, x, atol=2e-4)


def test_invertible_affine():
    for use_lu in [False, True]:
        flow = nf.InvertibleAffine.create(KEY, 5, use_lu=use_lu)
        x = jax.random.normal(KEY, (BATCH, 5))
        check_forward_inverse(flow, x, atol=2e-4)
        check_log_det_jacobian(flow, x)


def test_lu_linear_permute():
    flow = nf.LULinearPermute.create(KEY, 5, identity_init=True)
    x = jax.random.normal(KEY, (BATCH, 5))
    check_forward_inverse(flow, x, atol=1e-4)
    # identity init: forward should be (permuted) identity with zero log det
    z, ld = flow.inverse(x)
    # f32 softplus roundoff in the identity-init diagonal: ~3e-5 per dim
    np.testing.assert_allclose(np.asarray(ld), np.zeros(BATCH), atol=1e-3)


def test_lu_linear_cache_matches():
    flow = nf.LULinear.create(KEY, 5, identity_init=False)
    x = jax.random.normal(KEY, (BATCH, 5))
    z1, ld1 = flow.forward(x)
    cached = flow.with_cache()
    z2, ld2 = cached.forward(x)
    np.testing.assert_allclose(np.asarray(z1), np.asarray(z2), atol=1e-5)
    np.testing.assert_allclose(np.asarray(ld1), np.asarray(ld2), atol=1e-5)
    zi1, _ = flow.inverse(x)
    zi2, _ = cached.inverse(x)
    np.testing.assert_allclose(np.asarray(zi1), np.asarray(zi2), atol=1e-5)


def test_split_merge_channel_modes():
    for mode in ["channel", "channel_inv"]:
        split = nf.Split(mode=mode)
        x = jax.random.normal(KEY, (BATCH, 6))
        [z1, z2], _ = split.forward(x)
        x_, _ = split.inverse([z1, z2])
        np.testing.assert_array_equal(np.asarray(x_), np.asarray(x))


def test_split_merge_checkerboard():
    for mode in ["checkerboard", "checkerboard_inv"]:
        split = nf.Split(mode=mode)
        for shape in [(BATCH, 6), (2, 3, 4, 6)]:
            x = jax.random.normal(KEY, shape)
            [z1, z2], _ = split.forward(x)
            assert z1.shape[-1] == shape[-1] // 2
            x_, _ = split.inverse([z1, z2])
            np.testing.assert_array_equal(np.asarray(x_), np.asarray(x))


def test_squeeze_roundtrip():
    flow = nf.Squeeze()
    x = jax.random.normal(KEY, (2, 4, 6, 6))
    z, _ = flow.inverse(x)
    assert z.shape == (2, 16, 3, 3)
    x_, _ = flow.forward(z)
    np.testing.assert_array_equal(np.asarray(x_), np.asarray(x))


def test_periodic_wrap_shift():
    wrap = nf.PeriodicWrap.create([0], bound=1.0)
    x = jnp.asarray([[1.7, 0.3], [-1.2, 0.5]])
    z, _ = wrap.inverse(x)
    np.testing.assert_allclose(np.asarray(z[:, 0]), [-0.3, 0.8], atol=1e-6)
    shift = nf.PeriodicShift.create([0], bound=1.0, shift=0.4)
    x2 = jnp.asarray([[0.8, 0.3]])
    z2, _ = shift.forward(x2)
    z3, _ = shift.inverse(z2)
    np.testing.assert_allclose(np.asarray(z3), np.asarray(x2), atol=1e-6)


def test_composite_and_reverse():
    k1, k2 = jax.random.split(KEY)
    flows = [
        nf.MaskedAffineFlow.create(
            create_alternating_binary_mask(4, even=(i % 2 == 0)),
            t=MLP.create(jax.random.fold_in(k1, i), [4, 8, 4]),
            s=MLP.create(jax.random.fold_in(k2, i), [4, 8, 4]),
        )
        for i in range(3)
    ]
    comp = nf.Composite.create(flows)
    x = jax.random.normal(KEY, (BATCH, 4))
    check_forward_inverse(comp, x, atol=1e-4)
    rev = nf.Reverse(flow=comp)
    check_forward_inverse(rev, x, atol=1e-4)


def test_scanned_matches_composite():
    keys = jax.random.split(KEY, 8)
    flows = [
        nf.MaskedAffineFlow.create(
            create_alternating_binary_mask(4, even=(i % 2 == 0)),
            t=MLP.create(keys[i], [4, 8, 4]),
            s=MLP.create(jax.random.fold_in(keys[i], 7), [4, 8, 4]),
        )
        for i in range(4)
    ]
    comp = nf.Composite.create(flows)
    scanned = nf.Scanned.create(flows)
    x = jax.random.normal(KEY, (BATCH, 4))
    zc, ldc = comp.forward(x)
    zs, lds = scanned.forward(x)
    np.testing.assert_allclose(np.asarray(zc), np.asarray(zs), atol=1e-5)
    np.testing.assert_allclose(np.asarray(ldc), np.asarray(lds), atol=1e-5)
    zc, ldc = comp.inverse(x)
    zs, lds = scanned.inverse(x)
    np.testing.assert_allclose(np.asarray(zc), np.asarray(zs), atol=1e-5)
    np.testing.assert_allclose(np.asarray(ldc), np.asarray(lds), atol=1e-5)


def test_shift_transform_roundtrip():
    from nf_tpu.transforms import Shift

    s = Shift(shift=0.25)
    x = jax.random.uniform(KEY, (8, 3))
    y, ld = s.forward(x)
    x2, ld2 = s.inverse(y)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x), atol=1e-6)
    np.testing.assert_allclose(np.asarray(ld + ld2), 0.0, atol=1e-6)
