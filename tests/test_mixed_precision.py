"""Mixed-precision conditioner path (nets.MixedPrecision).

Conditioner matmuls/convs run in bf16 (MXU-native), parameters and all
flow-level math (log-det accumulation) stay f32 — the reference has no
mixed-precision story at all (single-dtype eager torch), so invariants are
checked against this framework's own f32 path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import nf_tpu.models as models
from nf_tpu.nets import MLP, MixedPrecision
from nf_tpu.utils.module import is_inexact_array, partition

from helpers import check_forward_inverse


def test_wrapper_casts_and_returns_f32():
    key = jax.random.PRNGKey(0)
    net = MLP.create(key, [4, 32, 4])
    mp = MixedPrecision(net=net)
    x = jax.random.normal(key, (8, 4))
    y = mp(x)
    assert y.dtype == jnp.float32
    # matches f32 output to bf16 tolerance
    np.testing.assert_allclose(np.asarray(y), np.asarray(net(x)),
                               atol=0.05, rtol=0.05)


def test_wrapper_attribute_delegation():
    key = jax.random.PRNGKey(0)
    net = MLP.create(key, [4, 32, 4])
    mp = MixedPrecision(net=net)
    assert mp.linears is net.linears
    with pytest.raises(AttributeError):
        mp.nonexistent_attribute  # noqa: B018


def test_params_stay_f32_and_get_f32_grads():
    key = jax.random.PRNGKey(1)
    model = models.build_realnvp(key, dim=2, K=4, hidden=[32, 32],
                                 mixed_precision=True)
    params, static = partition(model)
    leaves = [l for l in jax.tree_util.tree_leaves(params)
              if is_inexact_array(l)]
    assert leaves and all(l.dtype == jnp.float32 for l in leaves)

    from nf_tpu.utils.module import combine

    def loss(p):
        m = combine(p, static)
        z = jnp.asarray([[0.3, -0.2], [1.0, 0.5]])
        return -m.log_prob(z).mean()

    grads = jax.grad(loss)(params)
    gleaves = [l for l in jax.tree_util.tree_leaves(grads)
               if is_inexact_array(l)]
    assert all(g.dtype == jnp.float32 for g in gleaves)
    assert any(float(jnp.abs(g).max()) > 0 for g in gleaves)


@pytest.mark.parametrize("build,dim", [
    (lambda k: models.build_realnvp(k, dim=2, K=4, hidden=[32, 32],
                                    mixed_precision=True), 2),
    (lambda k: models.build_nsf(k, dim=2, K=2, hidden=32, num_bins=4,
                                mixed_precision=True), 2),
    (lambda k: models.build_maf(k, dim=3, K=2, hidden=32,
                                mixed_precision=True), 3),
])
def test_flow_invariants_hold_in_mixed_precision(build, dim):
    key = jax.random.PRNGKey(2)
    model = build(key)
    x = jax.random.normal(key, (8, dim)) * 0.5
    # bf16 conditioners -> looser roundtrip tolerance than the f32 suite
    for flow in model.flows:
        check_forward_inverse(flow, x, atol=0.02)
        x, _ = flow.forward(x)


def test_circular_nsf_mixed_precision_log_prob_close_to_f32():
    key = jax.random.PRNGKey(3)
    m32 = models.build_circular_nsf(key, dim=2, K=2, hidden=64, num_bins=4)
    mmp = models.build_circular_nsf(key, dim=2, K=2, hidden=64, num_bins=4,
                                    mixed_precision=True)
    x = jnp.stack([jnp.linspace(-2.5, 2.5, 16),
                   jnp.linspace(-1.0, 1.0, 16)], axis=1)
    lp32 = m32.log_prob(x)
    lpmp = mmp.log_prob(x)
    assert lpmp.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(lpmp), np.asarray(lp32),
                               atol=0.05, rtol=0.05)


def test_glow_block_mixed_precision_roundtrip():
    from nf_tpu.flows import GlowBlock

    key = jax.random.PRNGKey(4)
    block = GlowBlock.create(key, channels=8, hidden_channels=16,
                             mixed_precision=True)
    x = jax.random.normal(key, (2, 8, 4, 4))
    check_forward_inverse(block, x, atol=0.02)
