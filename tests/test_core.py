"""Model-container tests: end-to-end tiny models, loss scalars,
sample<->log_prob agreement, forward/inverse identity
(mirrors reference ``core_test.py:20-231``)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

import nf_tpu
import nf_tpu.distributions as dist
import nf_tpu.flows as nff
from nf_tpu.nets import MLP
from nf_tpu.utils import (
    combine,
    create_alternating_binary_mask,
    partition,
)

KEY = jax.random.PRNGKey(7)


def make_realnvp(key, dim=2, K=4, hidden=16):
    keys = jax.random.split(key, 2 * K)
    flows = []
    for i in range(K):
        b = create_alternating_binary_mask(dim, even=(i % 2 == 0))
        s = MLP.create(keys[2 * i], [dim, hidden, dim], init_zeros=True)
        t = MLP.create(keys[2 * i + 1], [dim, hidden, dim], init_zeros=True)
        flows.append(nff.MaskedAffineFlow.create(b, t=t, s=s))
        flows.append(nff.ActNorm.create(dim))
    q0 = dist.DiagGaussian.create(dim, trainable=False)
    return nf_tpu.NormalizingFlow.create(q0, flows, p=dist.TwoModes())


def test_sample_log_prob_agreement():
    model = make_realnvp(KEY)
    z, log_q = model.sample(KEY, num_samples=16)
    log_q_ = model.log_prob(z)
    np.testing.assert_allclose(np.asarray(log_q), np.asarray(log_q_),
                               atol=1e-4)


def test_forward_inverse_identity():
    model = make_realnvp(KEY)
    x = jax.random.normal(KEY, (8, 2))
    z, fwd_ld = model.forward_and_log_det(x)
    x_, inv_ld = model.inverse_and_log_det(z)
    np.testing.assert_allclose(np.asarray(x_), np.asarray(x), atol=1e-4)
    np.testing.assert_allclose(np.asarray(fwd_ld + inv_ld), np.zeros(8),
                               atol=1e-4)


def test_forward_kld_scalar():
    model = make_realnvp(KEY)
    x = jax.random.normal(KEY, (16, 2))
    loss = model.forward_kld(x)
    assert loss.shape == ()
    assert np.isfinite(float(loss))


def test_reverse_kld_beta_and_score_fn():
    model = make_realnvp(KEY)
    l1 = model.reverse_kld(KEY, num_samples=32, beta=1.0)
    l2 = model.reverse_kld(KEY, num_samples=32, beta=0.5)
    l3 = model.reverse_kld(KEY, num_samples=32, score_fn=False)
    for l in (l1, l2, l3):
        assert np.isfinite(float(l))
    assert not np.allclose(float(l1), float(l2))
    # sticking-the-landing should agree in value with plain estimator
    np.testing.assert_allclose(float(l1), float(l3), atol=1e-3)


def test_reverse_alpha_div():
    model = make_realnvp(KEY)
    for dreg in [False, True]:
        l = model.reverse_alpha_div(KEY, num_samples=32, alpha=0.5, dreg=dreg)
        assert np.isfinite(float(l))


def test_reverse_kld_training_improves():
    """Train a tiny Real NVP on TwoModes for a few steps: loss must drop."""
    model = make_realnvp(KEY, K=4, hidden=32)
    model = model.init_from_samples(KEY, num_samples=256)
    params, static = partition(model)
    opt = optax.adam(5e-3)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, key):
        def loss_fn(p):
            m = combine(p, static)
            return m.reverse_kld(key, num_samples=256, beta=1.0)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    losses = []
    key = KEY
    for it in range(60):
        key, sub = jax.random.split(key)
        params, opt_state, loss = step(params, opt_state, sub)
        losses.append(float(loss))
    assert np.mean(losses[-10:]) < np.mean(losses[:10]) - 0.2, losses[::10]


def test_forward_kld_training_improves():
    """MLE on TwoMoons samples: loss must drop."""
    model = make_realnvp(KEY, K=4, hidden=32)
    data = dist.TwoMoons().sample(KEY, 512)
    model = model.init_from_data(data)
    params, static = partition(model)
    opt = optax.adam(5e-3)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, x):
        def loss_fn(p):
            return combine(p, static).forward_kld(x)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    losses = []
    for it in range(40):
        params, opt_state, loss = step(params, opt_state, data)
        losses.append(float(loss))
    assert losses[-1] < losses[0] - 0.2, losses[::5]


def test_conditional_flow():
    dim = 2
    ctx_dim = 2 * dim  # context = [mean, std] for the conditional target
    keys = jax.random.split(KEY, 4)
    enc = MLP.create(keys[0], [ctx_dim, 8, 2 * dim])
    q0 = dist.ConditionalDiagGaussian.create(dim, enc)
    flows = []
    for i in range(2):
        b = create_alternating_binary_mask(dim, even=(i % 2 == 0))
        s = MLP.create(keys[1 + i], [dim, 8, dim], init_zeros=True)
        t = MLP.create(jax.random.fold_in(keys[1 + i], 9), [dim, 8, dim],
                       init_zeros=True)
        flows.append(nff.MaskedAffineFlow.create(b, t=t, s=s))
    model = nf_tpu.ConditionalNormalizingFlow.create(
        q0, flows, p=dist.ConditionalDiagGaussianTarget())
    ctx = jnp.abs(jax.random.normal(KEY, (5, 2 * dim))) + 0.5
    z, log_q = model.sample(KEY, 5, context=ctx)
    log_q_ = model.log_prob(z, context=ctx)
    np.testing.assert_allclose(np.asarray(log_q), np.asarray(log_q_),
                               atol=1e-4)
    loss = model.forward_kld(z, context=ctx)
    assert np.isfinite(float(loss))
    loss = model.reverse_kld(KEY, num_samples=5, context=ctx)
    assert np.isfinite(float(loss))


def test_vae():
    latent, obs = 2, 4
    keys = jax.random.split(KEY, 3)
    prior = dist.DiagGaussian.create(latent, trainable=False)
    enc = dist.NNDiagGaussian(net=MLP.create(keys[0], [obs, 8, 2 * latent]))
    dec = dist.NNBernoulliDecoder(net=MLP.create(keys[1], [latent, 8, obs]))
    flows = [nff.Planar.create(jax.random.fold_in(keys[2], i), (latent,))
             for i in range(2)]
    vae = nf_tpu.NormalizingFlowVAE.create(prior, enc, flows, dec)
    x = (jax.random.uniform(KEY, (3, obs)) > 0.5).astype(jnp.float32)
    z, log_q, log_p = vae.forward(KEY, x, num_samples=5)
    assert z.shape == (3, 5, latent)
    assert log_q.shape == (3, 5)
    assert log_p.shape == (3, 5)
    assert np.isfinite(np.asarray(log_q)).all()
    assert np.isfinite(np.asarray(log_p)).all()
