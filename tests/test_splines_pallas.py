"""Fused Pallas RQ-spline kernel vs the dense jnp path.

On CPU the kernel runs in Pallas interpreter mode (auto-selected), so these
tests exercise the exact kernel code that compiles on TPU.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nf_tpu.ops import unconstrained_rational_quadratic_spline as spline

KEY = jax.random.PRNGKey(7)


def _params(key, shape, num_bins, n_deriv):
    k1, k2, k3 = jax.random.split(key, 3)
    return (jax.random.normal(k1, shape + (num_bins,)),
            jax.random.normal(k2, shape + (num_bins,)),
            jax.random.normal(k3, shape + (n_deriv,)))


@pytest.mark.parametrize("inverse", [False, True])
@pytest.mark.parametrize("shape,num_bins", [((517, 3), 8), ((64,), 5),
                                            ((7, 5, 2), 10), ((200,), 32)])
def test_pallas_matches_dense_linear_tails(inverse, shape, num_bins):
    uw, uh, ud = _params(KEY, shape, num_bins, num_bins - 1)
    x = 3.0 * jax.random.normal(KEY, shape)
    y0, l0 = spline(x, uw, uh, ud, inverse=inverse, tails="linear",
                    tail_bound=2.0, use_pallas=False)
    y1, l1 = spline(x, uw, uh, ud, inverse=inverse, tails="linear",
                    tail_bound=2.0, use_pallas=True)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0), atol=2e-4)
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l0), atol=2e-3)


@pytest.mark.parametrize("inverse", [False, True])
def test_pallas_matches_dense_circular_tails(inverse):
    shape, K = (33, 2), 6
    uw, uh, ud = _params(KEY, shape, K, K)
    x = jax.random.uniform(KEY, shape, minval=-1.0, maxval=1.0)
    y0, l0 = spline(x, uw, uh, ud, inverse=inverse, tails="circular",
                    tail_bound=1.0, use_pallas=False)
    y1, l1 = spline(x, uw, uh, ud, inverse=inverse, tails="circular",
                    tail_bound=1.0, use_pallas=True)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0), atol=2e-4)
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l0), atol=2e-3)


def test_pallas_mixed_tails_tensor_tail_bound():
    B, D, K = 19, 2, 5
    uw, uh, ud = _params(KEY, (B, D), K, K + 1)
    tails = ["circular", "linear"]
    tail_bound = jnp.asarray([np.pi, 4.0])
    x = jnp.stack([
        jax.random.uniform(KEY, (B,), minval=-np.pi, maxval=np.pi),
        5.0 * jax.random.normal(jax.random.fold_in(KEY, 1), (B,)),
    ], axis=1)
    y0, l0 = spline(x, uw, uh, ud, tails=tails, tail_bound=tail_bound,
                    use_pallas=False)
    y1, l1 = spline(x, uw, uh, ud, tails=tails, tail_bound=tail_bound,
                    use_pallas=True)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0), atol=2e-4)
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l0), atol=2e-3)


def test_pallas_roundtrip_and_logdet_antisymmetry():
    shape, K = (300,), 8
    uw, uh, ud = _params(KEY, shape, K, K - 1)
    x = 3.0 * jax.random.normal(KEY, shape)
    y, ld = spline(x, uw, uh, ud, tails="linear", tail_bound=1.5,
                   use_pallas=True)
    x_, ld_ = spline(y, uw, uh, ud, inverse=True, tails="linear",
                     tail_bound=1.5, use_pallas=True)
    np.testing.assert_allclose(np.asarray(x_), np.asarray(x), atol=1e-4)
    np.testing.assert_allclose(np.asarray(ld + ld_), np.zeros(shape),
                               atol=1e-3)


def test_pallas_gradients_match_dense():
    shape, K = (45, 2), 6
    uw, uh, ud = _params(KEY, shape, K, K - 1)
    x = 2.5 * jax.random.normal(KEY, shape)

    def loss(use_pallas):
        def f(uw, uh, ud, x):
            y, ld = spline(x, uw, uh, ud, tails="linear", tail_bound=2.0,
                           use_pallas=use_pallas)
            return jnp.sum(jnp.tanh(y)) + jnp.sum(ld)
        return f

    g0 = jax.grad(loss(False), argnums=(0, 1, 2, 3))(uw, uh, ud, x)
    g1 = jax.grad(loss(True), argnums=(0, 1, 2, 3))(uw, uh, ud, x)
    for a, b in zip(g0, g1):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=2e-3)
        assert np.isfinite(np.asarray(b)).all()


def test_pallas_under_jit_and_vmap_composes():
    shape, K = (32, 4), 5
    uw, uh, ud = _params(KEY, shape, K, K - 1)
    x = 2.0 * jax.random.normal(KEY, shape)

    @jax.jit
    def f(x, uw, uh, ud):
        return spline(x, uw, uh, ud, tails="linear", tail_bound=1.0,
                      use_pallas=True)

    y, ld = f(x, uw, uh, ud)
    y0, l0 = spline(x, uw, uh, ud, tails="linear", tail_bound=1.0,
                    use_pallas=False)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y0), atol=2e-4)
    np.testing.assert_allclose(np.asarray(ld), np.asarray(l0), atol=2e-3)


@pytest.mark.parametrize("inverse", [False, True])
def test_fused_bwd_matches_dense_bwd(inverse):
    """The fused Pallas backward kernel (in-kernel recompute + VJP) must
    reproduce the dense one-hot VJP's cotangents for all four operands."""
    from nf_tpu.ops import splines_pallas

    shape, K = (1100,), 8
    uw, uh, ud = _params(KEY, shape, K, K - 1)
    x = 3.0 * jax.random.normal(jax.random.fold_in(KEY, 9), shape)

    def f(uw, uh, ud, x):
        y, ld = spline(x, uw, uh, ud, inverse=inverse, tails="linear",
                       tail_bound=2.5, use_pallas=True)
        return jnp.sum(jnp.sin(y)) + jnp.sum(ld)

    try:
        splines_pallas.set_pallas_bwd_enabled(True)
        g_fused = jax.grad(f, argnums=(0, 1, 2, 3))(uw, uh, ud, x)
        splines_pallas.set_pallas_bwd_enabled(False)
        g_dense = jax.grad(f, argnums=(0, 1, 2, 3))(uw, uh, ud, x)
    finally:
        splines_pallas.set_pallas_bwd_enabled(True)
    for name, a, b in zip("w h d x".split(), g_fused, g_dense):
        scale = np.maximum(np.max(np.abs(np.asarray(b))), 1.0)
        # 1e-4: the analytic transpose orders the f32 arithmetic differently
        # from the dense VJP (documented parity bound, docs/kernels.md)
        np.testing.assert_allclose(np.asarray(a) / scale,
                                   np.asarray(b) / scale, atol=1e-4,
                                   err_msg=f"grad {name}")
        assert np.isfinite(np.asarray(a)).all()


@pytest.mark.parametrize("inverse", [False, True])
def test_analytic_bwd_matches_autodiff_bwd(inverse):
    """The hand-derived analytic backward kernel (default) must agree with
    the traced-``jax.vjp`` backward kernel bit-for-nearly-bit: same
    recompute, different transpose derivation (implicit-root and
    ``du/dtheta = wd*J`` identities vs mechanical autodiff)."""
    from nf_tpu.ops import splines_pallas

    shape, K = (777,), 7
    uw, uh, ud = _params(jax.random.fold_in(KEY, 21), shape, K, K - 1)
    x = 3.0 * jax.random.normal(jax.random.fold_in(KEY, 22), shape)
    cty = jax.random.normal(jax.random.fold_in(KEY, 23), shape)
    ctl = jax.random.normal(jax.random.fold_in(KEY, 24), shape)

    def grads(mode):
        def f(uw, uh, ud, x):
            y, ld = spline(x, uw, uh, ud, inverse=inverse, tails="linear",
                           tail_bound=2.0, use_pallas=True)
            return jnp.sum(y * cty) + jnp.sum(ld * ctl)

        try:
            splines_pallas.set_pallas_bwd_kernel(mode)
            return jax.grad(f, argnums=(0, 1, 2, 3))(uw, uh, ud, x)
        finally:
            splines_pallas.set_pallas_bwd_kernel("analytic")

    for name, a, b in zip("w h d x".split(), grads("analytic"),
                          grads("autodiff")):
        scale = np.maximum(np.max(np.abs(np.asarray(b))), 1.0)
        np.testing.assert_allclose(np.asarray(a) / scale,
                                   np.asarray(b) / scale, atol=1e-5,
                                   err_msg=f"grad {name}")
        assert np.isfinite(np.asarray(a)).all()


@pytest.mark.parametrize("inverse", [False, True])
def test_fused_bwd_matches_dense_bwd_kmajor(inverse):
    """Same parity check through the k-major entry (the image-NSF training
    feed: zero transposes in either direction)."""
    from nf_tpu.ops import splines_pallas
    from nf_tpu.ops.splines import (
        unconstrained_rational_quadratic_spline_kmajor as spline_km,
    )

    n, K = 900, 6
    ks = jax.random.split(jax.random.fold_in(KEY, 11), 4)
    uw = jax.random.normal(ks[0], (K, n))
    uh = jax.random.normal(ks[1], (K, n))
    ud = jax.random.normal(ks[2], (K - 1, n))
    x = 3.0 * jax.random.normal(ks[3], (n,))

    def f(uw, uh, ud, x):
        y, ld = spline_km(x, uw, uh, ud, inverse=inverse, tails="linear",
                          tail_bound=2.0, use_pallas=True)
        return jnp.sum(jnp.cos(y)) + jnp.sum(ld)

    try:
        splines_pallas.set_pallas_bwd_enabled(True)
        g_fused = jax.grad(f, argnums=(0, 1, 2, 3))(uw, uh, ud, x)
        splines_pallas.set_pallas_bwd_enabled(False)
        g_dense = jax.grad(f, argnums=(0, 1, 2, 3))(uw, uh, ud, x)
    finally:
        splines_pallas.set_pallas_bwd_enabled(True)
    for name, a, b in zip("w h d x".split(), g_fused, g_dense):
        scale = np.maximum(np.max(np.abs(np.asarray(b))), 1.0)
        np.testing.assert_allclose(np.asarray(a) / scale,
                                   np.asarray(b) / scale, atol=5e-5,
                                   err_msg=f"grad {name}")
