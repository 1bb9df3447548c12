"""Bin-major spline entry (the conv-conditioner fast feed): numerics and
gradients must match the generic bin-minor path exactly."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nf_tpu.ops import splines
from nf_tpu.ops.splines_pallas import (
    fused_unconstrained_rqs,
    fused_unconstrained_rqs_kmajor,
)


def _params(key, shape, K, n_deriv):
    ks = jax.random.split(key, 4)
    x = jax.random.normal(ks[0], shape) * 3
    uw = jax.random.normal(ks[1], shape + (K,))
    uh = jax.random.normal(ks[2], shape + (K,))
    ud = jax.random.normal(ks[3], shape + (n_deriv,))
    return x, uw, uh, ud


@pytest.mark.parametrize("tails,n_deriv_off", [("linear", -1),
                                               ("circular", 0)])
@pytest.mark.parametrize("inverse", [False, True])
def test_kmajor_matches_generic(tails, n_deriv_off, inverse):
    K = 6
    x, uw, uh, ud = _params(jax.random.PRNGKey(0), (4, 5, 8, 8), K,
                            K + n_deriv_off)
    y_ref, ld_ref = splines.unconstrained_rational_quadratic_spline(
        x, uw, uh, ud, inverse=inverse, tails=tails, tail_bound=2.5)
    y_km, ld_km = splines.unconstrained_rational_quadratic_spline_kmajor(
        x, jnp.moveaxis(uw, -1, 0), jnp.moveaxis(uh, -1, 0),
        jnp.moveaxis(ud, -1, 0), inverse=inverse, tails=tails,
        tail_bound=2.5)
    np.testing.assert_allclose(np.asarray(y_km), np.asarray(y_ref),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(ld_km), np.asarray(ld_ref),
                               atol=1e-6)


def test_kmajor_fused_interpret_matches_dense():
    K = 8
    x, uw, uh, ud = _params(jax.random.PRNGKey(1), (4096,), K, K + 1)
    tb = jnp.full(x.shape, 2.0)
    y_a, ld_a = fused_unconstrained_rqs(x, uw, uh, ud, tb, interpret=True)
    y_b, ld_b = fused_unconstrained_rqs_kmajor(
        x, uw.T, uh.T, ud.T, tb, interpret=True)
    np.testing.assert_allclose(np.asarray(y_b), np.asarray(y_a), atol=1e-6)
    np.testing.assert_allclose(np.asarray(ld_b), np.asarray(ld_a),
                               atol=1e-6)


def test_kmajor_gradients_match_generic():
    K = 4
    x, uw, uh, ud = _params(jax.random.PRNGKey(2), (64,), K, K - 1)

    def loss_ref(x, uw, uh, ud):
        y, ld = splines.unconstrained_rational_quadratic_spline(
            x, uw, uh, ud, tails="linear", tail_bound=2.0,
            use_pallas=False)
        return jnp.sum(jnp.sin(y)) + jnp.sum(ld)

    def loss_km(x, uwm, uhm, udm):
        y, ld = splines.unconstrained_rational_quadratic_spline_kmajor(
            x, uwm, uhm, udm, tails="linear", tail_bound=2.0,
            use_pallas=False)
        return jnp.sum(jnp.sin(y)) + jnp.sum(ld)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(x, uw, uh, ud)
    g_km = jax.grad(loss_km, argnums=(0, 1, 2, 3))(x, uw.T, uh.T, ud.T)
    np.testing.assert_allclose(np.asarray(g_km[0]), np.asarray(g_ref[0]),
                               atol=1e-5)
    for a, b in zip(g_km[1:], (g_ref[1].T, g_ref[2].T, g_ref[3].T)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_kmajor_fused_custom_vjp_gradients():
    K = 4
    x, uw, uh, ud = _params(jax.random.PRNGKey(3), (4096,), K, K + 1)
    tb = jnp.full(x.shape, 2.0)

    def loss_fused(x, uwm, uhm, udm):
        y, ld = fused_unconstrained_rqs_kmajor(x, uwm, uhm, udm, tb,
                                               interpret=True)
        return jnp.sum(jnp.cos(y)) + jnp.sum(ld)

    # compare fused custom-vjp grads against jax.grad through the dense
    # bin-minor reference at the same padded derivatives
    from nf_tpu.ops.splines_pallas import _dense_impl

    def loss_ref(x, uwm, uhm, udm):
        y, ld = _dense_impl(x, uwm.T, uhm.T, udm.T, tb, inverse=False,
                            min_bin_width=splines.DEFAULT_MIN_BIN_WIDTH,
                            min_bin_height=splines.DEFAULT_MIN_BIN_HEIGHT,
                            min_derivative=splines.DEFAULT_MIN_DERIVATIVE)
        return jnp.sum(jnp.cos(y)) + jnp.sum(ld)

    args = (x, uw.T, uh.T, ud.T)
    g_f = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(*args)
    g_r = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(*args)
    for a, b in zip(g_f, g_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4,
                                   rtol=1e-4)


def test_coupling_4d_fast_path_matches_reshaped():
    """The 4D coupling now feeds bin-major; outputs must equal the old
    bin-minor path bit-for-bit (dense fallback on CPU)."""
    from nf_tpu.flows.neural_spline.coupling import (
        PiecewiseRationalQuadraticCoupling,
        _reshape_params,
    )
    from nf_tpu.nets import ConvResidualNet

    key = jax.random.PRNGKey(4)
    mask = np.asarray([1, -1, 1, -1, 1, -1]) * 1.0
    coup = PiecewiseRationalQuadraticCoupling.create(
        key, mask,
        lambda k, cin, cout: ConvResidualNet.create(k, cin, cout, 16,
                                                    num_blocks=1),
        num_bins=4, tails="linear", tail_bound=3.0,
        apply_unconditional_transform=True, img_shape=(4, 4))
    x = jax.random.normal(key, (2, 6, 4, 4))
    z, ld = coup.forward(x)
    x2, ld2 = coup.inverse(z)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x), atol=1e-5)
    np.testing.assert_allclose(np.asarray(ld + ld2), 0.0, atol=1e-5)

    # explicit equivalence vs the generic reshaped path
    tsplit = x[:, np.asarray(coup.transform_features)]
    isplit = x[:, np.asarray(coup.identity_features)]
    tp = coup.transform_net(isplit, None)
    out_fast, ld_fast = coup._coupling_transform(tsplit, tp, False)
    params = _reshape_params(tsplit, tp)
    out_ref, ld_ref = coup._piecewise_cdf(tsplit, params, False)
    from nf_tpu.utils.nn import sum_except_batch

    np.testing.assert_allclose(np.asarray(out_fast), np.asarray(out_ref),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(ld_fast),
                               np.asarray(sum_except_batch(ld_ref)),
                               atol=1e-5)
