"""RQ-spline kernel tests: fwd/inv consistency, tails, and (when the
reference checkout is present) numeric parity against the reference
implementation (reference ``utils/splines_test.py:9-60``)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nf_tpu.ops import (
    rational_quadratic_spline,
    unconstrained_rational_quadratic_spline,
)

KEY = jax.random.PRNGKey(3)


def _params(key, shape, num_bins):
    k1, k2, k3 = jax.random.split(key, 3)
    uw = jax.random.normal(k1, shape + (num_bins,))
    uh = jax.random.normal(k2, shape + (num_bins,))
    ud = jax.random.normal(k3, shape + (num_bins + 1,))
    return uw, uh, ud


def test_spline_forward_inverse_in_interval():
    shape, K = (10, 4), 8
    uw, uh, ud = _params(KEY, shape, K)
    x = jax.random.uniform(KEY, shape)
    y, ld = rational_quadratic_spline(x, uw, uh, ud, inverse=False)
    x_, ld_ = rational_quadratic_spline(y, uw, uh, ud, inverse=True)
    np.testing.assert_allclose(np.asarray(x_), np.asarray(x), atol=1e-4)
    np.testing.assert_allclose(np.asarray(ld + ld_), np.zeros(shape),
                               atol=1e-4)
    # outputs stay in [0, 1]
    assert float(jnp.min(y)) >= 0.0 and float(jnp.max(y)) <= 1.0


def test_unconstrained_linear_tails():
    shape, K = (10, 4), 8
    uw, uh, ud0 = _params(KEY, shape, K)
    ud = ud0[..., :-1][..., : K - 1]  # linear tails take K-1 derivatives
    x = 3.0 * jax.random.normal(KEY, shape)  # many outside [-1, 1]
    y, ld = unconstrained_rational_quadratic_spline(
        x, uw, uh, ud, inverse=False, tails="linear", tail_bound=1.0)
    x_, ld_ = unconstrained_rational_quadratic_spline(
        y, uw, uh, ud, inverse=True, tails="linear", tail_bound=1.0)
    np.testing.assert_allclose(np.asarray(x_), np.asarray(x), atol=1e-4)
    np.testing.assert_allclose(np.asarray(ld + ld_), np.zeros(shape),
                               atol=1e-4)
    outside = np.abs(np.asarray(x)) > 1.0
    np.testing.assert_array_equal(np.asarray(y)[outside],
                                  np.asarray(x)[outside])
    np.testing.assert_array_equal(np.asarray(ld)[outside], 0.0)


def test_unconstrained_circular_tails():
    shape, K = (10, 2), 6
    uw, uh, ud0 = _params(KEY, shape, K)
    ud = ud0[..., :K]  # circular takes K derivatives, last tied to first
    x = jax.random.uniform(KEY, shape, minval=-1.0, maxval=1.0)
    y, ld = unconstrained_rational_quadratic_spline(
        x, uw, uh, ud, inverse=False, tails="circular", tail_bound=1.0)
    x_, ld_ = unconstrained_rational_quadratic_spline(
        y, uw, uh, ud, inverse=True, tails="circular", tail_bound=1.0)
    np.testing.assert_allclose(np.asarray(x_), np.asarray(x), atol=1e-4)
    np.testing.assert_allclose(np.asarray(ld + ld_), np.zeros(shape),
                               atol=1e-4)


def test_mixed_tails_and_tensor_tail_bound():
    B, D, K = 8, 2, 5
    uw, uh, ud = _params(KEY, (B, D), K)  # ud has K+1 entries for mixed
    tails = ["circular", "linear"]
    tail_bound = jnp.asarray([np.pi, 4.0])
    x = jnp.stack([
        jax.random.uniform(KEY, (B,), minval=-np.pi, maxval=np.pi),
        5.0 * jax.random.normal(jax.random.fold_in(KEY, 1), (B,)),
    ], axis=1)
    y, ld = unconstrained_rational_quadratic_spline(
        x, uw, uh, ud, inverse=False, tails=tails, tail_bound=tail_bound)
    x_, ld_ = unconstrained_rational_quadratic_spline(
        y, uw, uh, ud, inverse=True, tails=tails, tail_bound=tail_bound)
    np.testing.assert_allclose(np.asarray(x_), np.asarray(x), atol=1e-4)
    np.testing.assert_allclose(np.asarray(ld + ld_), np.zeros((B, D)),
                               atol=1e-4)


def test_gradients_finite_with_out_of_range_inputs():
    shape, K = (6,), 5
    uw, uh, ud0 = _params(KEY, shape, K)
    ud = ud0[..., : K - 1]

    def loss(uw, uh, ud, x):
        y, ld = unconstrained_rational_quadratic_spline(
            x, uw, uh, ud, tails="linear", tail_bound=1.0)
        return jnp.sum(y) + jnp.sum(ld)

    x = jnp.asarray([-5.0, -0.5, 0.0, 0.5, 0.99, 5.0])
    grads = jax.grad(loss, argnums=(0, 1, 2, 3))(uw, uh, ud, x)
    for g in grads:
        assert np.isfinite(np.asarray(g)).all()


@pytest.mark.skipif(not os.path.isdir("/root/reference"),
                    reason="reference checkout not available")
def test_parity_with_reference_torch_impl():
    """Bit-level semantics check against the reference PyTorch kernel."""
    import importlib.util
    import torch

    spec = importlib.util.spec_from_file_location(
        "ref_splines", "/root/reference/normflows/utils/splines.py")
    ref = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref)

    B, D, K = 16, 3, 8
    rng = np.random.RandomState(0)
    x = rng.randn(B, D).astype(np.float64) * 2
    uw = rng.randn(B, D, K).astype(np.float64)
    uh = rng.randn(B, D, K).astype(np.float64)
    ud = rng.randn(B, D, K - 1).astype(np.float64)

    jax.config.update("jax_enable_x64", True)
    for inverse in [False, True]:
        t_out, t_ld = ref.unconstrained_rational_quadratic_spline(
            torch.tensor(x), torch.tensor(uw), torch.tensor(uh),
            torch.tensor(ud), inverse=inverse, tails="linear",
            tail_bound=1.5)
        j_out, j_ld = unconstrained_rational_quadratic_spline(
            jnp.asarray(x), jnp.asarray(uw), jnp.asarray(uh),
            jnp.asarray(ud), inverse=inverse, tails="linear",
            tail_bound=1.5)
        np.testing.assert_allclose(np.asarray(j_out), t_out.numpy(),
                                   atol=1e-5, rtol=1e-5)
        np.testing.assert_allclose(np.asarray(j_ld), t_ld.numpy(),
                                   atol=1e-5, rtol=1e-5)
    # (x64 context stays open through the circular case below)

    # circular tails parity
    ud_c = rng.randn(B, D, K).astype(np.float64)
    for inverse in [False, True]:
        t_out, t_ld = ref.unconstrained_rational_quadratic_spline(
            torch.tensor(x * 0.4), torch.tensor(uw), torch.tensor(uh),
            torch.tensor(ud_c), inverse=inverse, tails="circular",
            tail_bound=1.0)
        j_out, j_ld = unconstrained_rational_quadratic_spline(
            jnp.asarray(x * 0.4), jnp.asarray(uw), jnp.asarray(uh),
            jnp.asarray(ud_c), inverse=inverse, tails="circular",
            tail_bound=1.0)
        np.testing.assert_allclose(np.asarray(j_out), t_out.numpy(),
                                   atol=1e-5, rtol=1e-5)
        np.testing.assert_allclose(np.asarray(j_ld), t_ld.numpy(),
                                   atol=1e-5, rtol=1e-5)
    jax.config.update("jax_enable_x64", False)
