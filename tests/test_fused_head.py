"""Fused conditioner-head + RQ-spline kernel: parity vs the unfused path.

The fused op (``ops/spline_head_fused.py``) computes the bin-major head's
final matmul inside the Pallas kernel. Everything here pins it — values,
log-dets, and all four gradients — against the exact unfused model path
(XLA head GEMM + k-major spline kernel), in interpreter mode on the CPU
mesh, including the transposed-trunk conditioner execution.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import nf_tpu.models as models
from nf_tpu.flows.neural_spline.feed import kmajor_spline_feed
from nf_tpu.nets import ResidualNet
from nf_tpu.ops import spline_head_fused as shf
from nf_tpu.ops import splines
from nf_tpu.utils.module import combine, partition


def _mk(key, d=4, batch=256, hidden=32, num_bins=4, tails="linear"):
    nd = num_bins - 1 if tails == "linear" else num_bins
    m = (2 * num_bins + nd) * d
    ks = jax.random.split(key, 4)
    x_t = jax.random.normal(ks[0], (d, batch)) * 2.0
    h_t = jax.random.normal(ks[1], (hidden, batch))
    w = jax.random.normal(ks[2], (m, hidden)) * (0.3 / np.sqrt(hidden))
    b = jax.random.normal(ks[3], (m,)) * 0.1
    return x_t, h_t, w, b


def _unfused(x_t, h_t, w, b, *, num_bins, tails, tail_bound, inverse=False):
    params = jnp.dot(w, h_t) + b[:, None]
    d = x_t.shape[0]
    pr = params.reshape(-1, d, x_t.shape[1])
    uw, uh = pr[:num_bins], pr[num_bins:2 * num_bins]
    ud = pr[2 * num_bins:]
    return splines.unconstrained_rational_quadratic_spline_kmajor(
        x_t, uw, uh, ud, inverse=inverse, tails=tails,
        tail_bound=tail_bound, use_pallas=False)


@pytest.mark.parametrize("tails", ["linear", "circular"])
@pytest.mark.parametrize("inverse", [False, True])
def test_op_value_parity(tails, inverse):
    x_t, h_t, w, b = _mk(jax.random.PRNGKey(0), tails=tails)
    y1, l1 = shf.fused_head_rqs(x_t, h_t, w, b, num_bins=4, tails=tails,
                                tail_bound=2.5, inverse=inverse,
                                interpret=True)
    y2, l2 = _unfused(x_t, h_t, w, b, num_bins=4, tails=tails,
                      tail_bound=2.5, inverse=inverse)
    np.testing.assert_allclose(y1, y2, atol=1e-5)
    np.testing.assert_allclose(l1, l2, atol=1e-4)


def test_op_per_feature_tail_bound_and_padding():
    # B=300: not a multiple of the 128-lane block -> exercises padding
    x_t, h_t, w, b = _mk(jax.random.PRNGKey(1), batch=300)
    tb = jnp.asarray([1.5, 2.0, 2.5, 3.0])
    y1, l1 = shf.fused_head_rqs(x_t, h_t, w, b, num_bins=4, tails="linear",
                                tail_bound=tb, interpret=True)
    y2, l2 = _unfused(x_t, h_t, w, b, num_bins=4, tails="linear",
                      tail_bound=tb.reshape(-1, 1))
    np.testing.assert_allclose(y1, y2, atol=1e-5)
    np.testing.assert_allclose(l1, l2, atol=1e-4)


@pytest.mark.parametrize("tails", ["linear", "circular"])
@pytest.mark.parametrize("inverse", [False, True])
def test_op_grad_parity(tails, inverse):
    x_t, h_t, w, b = _mk(jax.random.PRNGKey(2), tails=tails)

    def loss_fused(x_t, h_t, w, b):
        y, ld = shf.fused_head_rqs(x_t, h_t, w, b, num_bins=4, tails=tails,
                                   tail_bound=2.5, inverse=inverse,
                                   interpret=True)
        return jnp.sum(jnp.sin(y)) + jnp.sum(ld)

    def loss_unfused(x_t, h_t, w, b):
        y, ld = _unfused(x_t, h_t, w, b, num_bins=4, tails=tails,
                         tail_bound=2.5, inverse=inverse)
        return jnp.sum(jnp.sin(y)) + jnp.sum(ld)

    g1 = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(x_t, h_t, w, b)
    g2 = jax.grad(loss_unfused, argnums=(0, 1, 2, 3))(x_t, h_t, w, b)
    for a, e, nm in zip(g1, g2, ["gx", "gh", "gw", "gb"]):
        scale = max(1.0, float(jnp.max(jnp.abs(e))))
        np.testing.assert_allclose(a, e, atol=2e-4 * scale, err_msg=nm)


def test_transposed_trunk_matches_batch_major():
    key = jax.random.PRNGKey(3)
    net = ResidualNet.create(key, in_features=3, out_features=44,
                             hidden_features=32, context_features=5,
                             num_blocks=2, bin_major_head=(4, 11))
    x = jax.random.normal(jax.random.PRNGKey(4), (64, 3))
    c = jax.random.normal(jax.random.PRNGKey(5), (64, 5))
    want = net(x, c)  # (44, 64) bin-major head output
    h_t = net.features_transposed(x, c)
    got = net.final_layer.matmul_t(h_t)
    np.testing.assert_allclose(got, want, atol=1e-5)


def _nsf(key, scale_batch=True):
    return models.build_nsf(key, dim=4, K=2, hidden=32, num_bins=4)


def test_model_fused_vs_unfused_log_prob_and_grads():
    key = jax.random.PRNGKey(6)
    model = _nsf(key)
    x = jax.random.normal(jax.random.PRNGKey(7), (512, 4))

    def kld_loss(params, static):
        return combine(params, static).forward_kld(x)

    shf.set_fused_head_mode("on")
    try:
        lp_fused = model.log_prob(x)
        params, static = partition(model)
        loss_f, grads_f = jax.value_and_grad(kld_loss)(params, static)
    finally:
        shf.set_fused_head_mode("off")
    try:
        lp_ref = model.log_prob(x)
        params, static = partition(model)
        loss_r, grads_r = jax.value_and_grad(kld_loss)(params, static)
    finally:
        shf.set_fused_head_mode("auto")

    np.testing.assert_allclose(lp_fused, lp_ref, atol=1e-4)
    np.testing.assert_allclose(loss_f, loss_r, atol=1e-5)
    fl, rl = jax.tree_util.tree_leaves(grads_f), \
        jax.tree_util.tree_leaves(grads_r)
    assert len(fl) == len(rl)
    for a, e in zip(fl, rl):
        scale = max(1.0, float(jnp.max(jnp.abs(e))))
        np.testing.assert_allclose(a, e, atol=5e-4 * scale)


def test_model_fused_sampling_matches():
    key = jax.random.PRNGKey(8)
    model = _nsf(key)
    shf.set_fused_head_mode("on")
    try:
        z1, lq1 = model.sample(jax.random.PRNGKey(9), 256)
    finally:
        shf.set_fused_head_mode("off")
    try:
        z2, lq2 = model.sample(jax.random.PRNGKey(9), 256)
    finally:
        shf.set_fused_head_mode("auto")
    np.testing.assert_allclose(z1, z2, atol=1e-4)
    np.testing.assert_allclose(lq1, lq2, atol=1e-3)
