"""Tests for MADE, MAF, and the neural-spline flow stack (mirrors reference
``nets/made_test.py``, ``flows/affine/autoregressive_test.py``,
``flows/neural_spline/*_test.py``, ``wrapper_test.py``)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import nf_tpu.flows as nff
from nf_tpu.nets import MADE, ResidualNet, ConvResidualNet
from nf_tpu.utils import create_alternating_binary_mask

from helpers import check_forward_inverse, check_log_det_jacobian

KEY = jax.random.PRNGKey(11)
BATCH = 5


def test_made_autoregressive_property():
    """Gradient probing: output i must have zero gradient wrt inputs >= i
    (mirrors reference ``made_test.py:46-76``)."""
    D, H = 4, 16
    made = MADE.create(KEY, features=D, hidden_features=H, num_blocks=2,
                       output_multiplier=2)
    x = jax.random.normal(KEY, (D,))

    jac = jax.jacfwd(lambda xx: made(xx[None])[0])(x)  # (D*2, D)
    jac = np.asarray(jac).reshape(D, 2, D)
    for i in range(D):
        # params for feature i (degree i+1) may depend only on features < i
        assert np.allclose(jac[i, :, i:], 0.0), f"output {i} sees inputs >= {i}"


def test_made_residual_vs_feedforward():
    for use_res in [True, False]:
        made = MADE.create(KEY, features=3, hidden_features=8,
                           use_residual_blocks=use_res, output_multiplier=1)
        out = made(jax.random.normal(KEY, (BATCH, 3)))
        assert out.shape == (BATCH, 3)


def test_made_permute_and_random_mask():
    made = MADE.create(KEY, features=4, hidden_features=8, permute_mask=True,
                       output_multiplier=2)
    assert made(jax.random.normal(KEY, (BATCH, 4))).shape == (BATCH, 8)
    made = MADE.create(KEY, features=4, hidden_features=8, random_mask=True,
                       use_residual_blocks=False, output_multiplier=1)
    assert made(jax.random.normal(KEY, (BATCH, 4))).shape == (BATCH, 4)


def test_made_context():
    made = MADE.create(KEY, features=3, hidden_features=8,
                       context_features=2, output_multiplier=2)
    x = jax.random.normal(KEY, (BATCH, 3))
    ctx = jax.random.normal(KEY, (BATCH, 2))
    assert made(x, ctx).shape == (BATCH, 6)


def test_maf_roundtrip():
    flow = nff.MaskedAffineAutoregressive.create(KEY, features=4,
                                                 hidden_features=16)
    x = jax.random.normal(KEY, (BATCH, 4))
    check_forward_inverse(flow, x, atol=1e-4)
    check_log_det_jacobian(flow, x)


def test_maf_inverse_is_sequential():
    """inverse(forward(x)) == x even though inverse runs the D-pass scan."""
    flow = nff.MaskedAffineAutoregressive.create(KEY, features=6,
                                                 hidden_features=16)
    x = jax.random.normal(KEY, (BATCH, 6))
    y, ld = flow.forward(x)
    x_, ld_ = flow.inverse(y)
    np.testing.assert_allclose(np.asarray(x_), np.asarray(x), atol=1e-4)


def test_residual_net_context_and_preprocessing():
    from nf_tpu.utils import PeriodicFeaturesElementwise

    pf = PeriodicFeaturesElementwise.create(3, [0], np.pi)
    net = ResidualNet.create(KEY, 3, 6, 16, context_features=2,
                             num_blocks=2, preprocessing=pf)
    x = jax.random.normal(KEY, (BATCH, 3))
    ctx = jax.random.normal(KEY, (BATCH, 2))
    assert net(x, ctx).shape == (BATCH, 6)


def test_conv_residual_net():
    net = ConvResidualNet.create(KEY, 3, 6, 8, num_blocks=2)
    x = jax.random.normal(KEY, (2, 3, 4, 4))
    assert net(x).shape == (2, 6, 4, 4)


@pytest.mark.parametrize("tails,uncond", [("linear", False),
                                          ("linear", True),
                                          (None, True)])
def test_piecewise_rq_coupling_2d(tails, uncond):
    mask = np.asarray(create_alternating_binary_mask(4))

    def net_fn(key, in_f, out_f):
        return ResidualNet.create(key, in_f, out_f, 16, num_blocks=2)

    flow = nff.PiecewiseRationalQuadraticCoupling.create(
        KEY, mask, net_fn, num_bins=5, tails=tails, tail_bound=2.0,
        apply_unconditional_transform=uncond)
    if tails is None:
        x = jax.random.uniform(KEY, (BATCH, 4))
    else:
        x = jax.random.normal(KEY, (BATCH, 4))
    check_forward_inverse(flow, x, atol=2e-4)


def test_piecewise_rq_coupling_4d():
    C, H, W = 4, 2, 2
    mask = np.asarray(create_alternating_binary_mask(C))

    def net_fn(key, in_c, out_c):
        return ConvResidualNet.create(key, in_c, out_c, 8, num_blocks=2)

    flow = nff.PiecewiseRationalQuadraticCoupling.create(
        KEY, mask, net_fn, num_bins=4, tails="linear", tail_bound=2.0,
        apply_unconditional_transform=True, img_shape=(H, W))
    x = jax.random.normal(KEY, (3, C, H, W))
    check_forward_inverse(flow, x, atol=2e-4)


def test_piecewise_rq_cdf():
    for tails in [None, "linear", "circular"]:
        flow = nff.PiecewiseRationalQuadraticCDF.create(
            (4,), num_bins=5, tails=tails, tail_bound=1.5,
            identity_init=False, key=KEY)
        if tails is None:
            x = jax.random.uniform(KEY, (BATCH, 4))
        else:
            x = jax.random.uniform(KEY, (BATCH, 4), minval=-1.4,
                                   maxval=1.4)
        check_forward_inverse(flow, x, atol=2e-4)
    # identity init → identity map
    flow = nff.PiecewiseRationalQuadraticCDF.create((4,), num_bins=5,
                                                    tails="linear",
                                                    tail_bound=2.0)
    x = jax.random.normal(KEY, (BATCH, 4))
    y, ld = flow.forward(x)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-4)
    np.testing.assert_allclose(np.asarray(ld), np.zeros(BATCH), atol=1e-3)


def test_coupled_rq_spline_wrapper():
    flow = nff.CoupledRationalQuadraticSpline.create(
        KEY, num_input_channels=4, num_blocks=2, num_hidden_channels=16,
        num_bins=4)
    x = jax.random.normal(KEY, (BATCH, 4))
    check_forward_inverse(flow, x, atol=2e-4)
    check_log_det_jacobian(flow, x)


def test_circular_coupled_rq_spline_wrapper():
    flow = nff.CircularCoupledRationalQuadraticSpline.create(
        KEY, num_input_channels=3, num_blocks=2, num_hidden_channels=16,
        ind_circ=[0], num_bins=4, tail_bound=jnp.asarray([np.pi, 3.0, 3.0]))
    x = jax.random.normal(KEY, (BATCH, 3))
    x = x.at[:, 0].set(jnp.clip(x[:, 0], -3, 3) / 3 * np.pi)
    check_forward_inverse(flow, x, atol=2e-4)


def test_autoregressive_rq_spline_wrapper():
    flow = nff.AutoregressiveRationalQuadraticSpline.create(
        KEY, num_input_channels=3, num_blocks=2, num_hidden_channels=16,
        num_bins=4)
    x = jax.random.normal(KEY, (BATCH, 3))
    check_forward_inverse(flow, x, atol=2e-4)
    check_log_det_jacobian(flow, x)


def test_circular_autoregressive_rq_spline_wrapper():
    flow = nff.CircularAutoregressiveRationalQuadraticSpline.create(
        KEY, num_input_channels=3, num_blocks=2, num_hidden_channels=16,
        ind_circ=[0], num_bins=4, tail_bound=jnp.asarray([np.pi, 3.0, 3.0]),
        permute_mask=True)
    x = jax.random.normal(KEY, (BATCH, 3))
    x = x.at[:, 0].set(jnp.clip(x[:, 0], -3, 3) / 3 * np.pi)
    check_forward_inverse(flow, x, atol=2e-4)


def test_identity_init_wrappers_are_identity():
    flow = nff.CoupledRationalQuadraticSpline.create(
        KEY, num_input_channels=4, num_blocks=2, num_hidden_channels=16,
        num_bins=4, init_identity=True)
    x = jax.random.normal(KEY, (BATCH, 4))
    y, ld = flow.forward(x)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-4)
    np.testing.assert_allclose(np.asarray(ld), np.zeros(BATCH), atol=1e-2)
