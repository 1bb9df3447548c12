"""Implicit-diff VJP through the iResBlock fixed-point inverse.

The reference cannot reverse-mode differentiate its inverse at all (the
Banach loop runs under ``torch.no_grad()``, reference ``residual.py:133-142``);
here the custom VJP solves the adjoint fixed point ``v = u - J_g^T v``, so
reverse-KLD training of residual flows works. Gradients are validated
against differentiating an explicitly unrolled 60-step iteration (exact to
machine precision for a contractive g).
"""

import jax
import jax.numpy as jnp
import numpy as np

import nf_tpu.models as models
from nf_tpu.distributions import TwoModes
from nf_tpu.flows.residual import _fp_inverse
from nf_tpu.nets import LipschitzMLP
from nf_tpu.flows import Residual
from nf_tpu.utils.module import combine, partition


def _make_block(key, dim=2):
    net = LipschitzMLP.create(key, [dim, 32, 32, dim], lipschitz_const=0.8)
    return Residual.create(net, reduce_memory=False).iresblock


def test_implicit_vjp_matches_unrolled():
    key = jax.random.PRNGKey(0)
    block = _make_block(key)
    y = jax.random.normal(jax.random.PRNGKey(1), (5, 2))

    params, static = partition(block)

    def loss_implicit(p, y):
        b = combine(p, static)
        x = _fp_inverse(b, y)
        return jnp.sum(jnp.sin(x) * x), x

    def loss_unrolled(p, y):
        b = combine(p, static)
        x = y - b.nnet(y)
        for _ in range(60):
            x = y - b.nnet(x)
        return jnp.sum(jnp.sin(x) * x), x

    (li, xi), gi = jax.value_and_grad(loss_implicit, argnums=(0, 1),
                                      has_aux=True)(params, y)
    (lu, xu), gu = jax.value_and_grad(loss_unrolled, argnums=(0, 1),
                                      has_aux=True)(params, y)

    np.testing.assert_allclose(np.asarray(xi), np.asarray(xu), atol=1e-5)
    np.testing.assert_allclose(float(li), float(lu), rtol=1e-5)
    # y-gradient
    np.testing.assert_allclose(np.asarray(gi[1]), np.asarray(gu[1]),
                               atol=2e-4, rtol=2e-3)
    # parameter gradients
    fi = jax.tree_util.tree_leaves(gi[0])
    fu = jax.tree_util.tree_leaves(gu[0])
    assert len(fi) == len(fu)
    any_nonzero = False
    for a, b in zip(fi, fu):
        if a is None:
            continue
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4,
                                   rtol=2e-3)
        any_nonzero |= float(jnp.abs(jnp.asarray(b)).max()) > 0
    assert any_nonzero


def test_residual_reverse_kld_trains():
    import optax

    key = jax.random.PRNGKey(2)
    model = models.build_residual(key, dim=2, K=4, hidden=32,
                                  n_hidden_layers=2, target=TwoModes())
    model = model.init_from_samples(key, 256)
    params, static = partition(model)
    opt = optax.adam(5e-3)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, key):
        loss, grads = jax.value_and_grad(
            lambda p: combine(p, static).reverse_kld(key, 256))(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    losses = []
    for it in range(30):
        key, sub = jax.random.split(key)
        params, opt_state, loss = step(params, opt_state, sub)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    # stochastic estimator -> compare smoothed start vs end
    assert np.mean(losses[-5:]) < np.mean(losses[:5])
