"""Stochastic NF layers and HAIS (mirrors reference
``flows/stochastic_test.py`` smoke tests plus statistical sanity checks)."""

import jax
import jax.numpy as jnp
import numpy as np

import nf_tpu.distributions as dist
import nf_tpu.flows as nff
from nf_tpu.sampling import HAIS

KEY = jax.random.PRNGKey(33)


def test_metropolis_hastings_moves_toward_target():
    target = dist.TwoModes(loc=2.0, scale=0.2)
    proposal = dist.DiagGaussianProposal.create((2,), 0.5)
    mh = nff.MetropolisHastings.create(target, proposal, steps=50)
    z0 = 0.1 * jax.random.normal(KEY, (256, 2))
    z, log_det = mh.forward(z0, key=KEY)
    assert z.shape == z0.shape and log_det.shape == (256,)
    # samples should move outward toward the radius-2 modes
    r0 = float(jnp.mean(jnp.linalg.norm(z0, axis=1)))
    r1 = float(jnp.mean(jnp.linalg.norm(z, axis=1)))
    assert r1 > r0 + 0.5
    # inverse == forward contract
    z2, _ = mh.inverse(z0, key=KEY)
    np.testing.assert_allclose(np.asarray(z2), np.asarray(z))


def test_hmc_layer_shapes_and_movement():
    target = dist.TwoModes(loc=2.0, scale=0.2)
    hmc = nff.HamiltonianMonteCarlo.create(
        target, steps=5,
        log_step_size=jnp.log(0.1) * jnp.ones(2),
        log_mass=jnp.zeros(2))
    z0 = 0.1 * jax.random.normal(KEY, (128, 2))
    z, log_det = hmc.forward(z0, key=KEY)
    assert z.shape == z0.shape and log_det.shape == (128,)
    assert np.isfinite(np.asarray(z)).all()
    r1 = float(jnp.mean(jnp.linalg.norm(z, axis=1)))
    assert r1 > 0.3


def test_hmc_is_jittable():
    target = dist.TwoModes(loc=2.0, scale=0.2)
    hmc = nff.HamiltonianMonteCarlo.create(
        target, steps=3, log_step_size=jnp.log(0.1) * jnp.ones(2),
        log_mass=jnp.zeros(2))

    @jax.jit
    def run(layer, z, key):
        return layer.forward(z, key=key)

    z, ld = run(hmc, jax.random.normal(KEY, (32, 2)), KEY)
    assert np.isfinite(np.asarray(z)).all()


def test_hais_importance_weights():
    """HAIS log-normalizer estimate on a tractable pair: target is a scaled
    Gaussian, prior is standard — log E[w] should approximate log Z."""
    prior = dist.DiagGaussian.create(2, trainable=False)

    class ScaledGaussian(dist.Target):
        def log_prob(self, z, context=None):
            # unnormalized: log N(0, 0.5^2) + log Z with log Z = 1
            return (-0.5 * jnp.sum((z / 0.5) ** 2, axis=1)
                    - 2 * jnp.log(0.5) - jnp.log(2 * jnp.pi) + 1.0)

    betas = np.linspace(1.0, 0.0, 12)
    hais = HAIS.create(betas, prior, ScaledGaussian(), num_leapfrog=5,
                       step_size=0.2 * jnp.ones(2), log_mass=jnp.zeros(2))
    samples, log_w = hais.sample(KEY, 2048)
    assert samples.shape == (2048, 2)
    log_z = float(jax.scipy.special.logsumexp(log_w) - jnp.log(2048.0))
    assert abs(log_z - 1.0) < 0.3, log_z


def test_mh_chain_converges_to_target_moments():
    """Statistical check the reference lacks (it only smoke-tests,
    reference ``stochastic_test.py:13-39``): many parallel MH chains
    targeting a standard normal reach its moments."""
    import jax
    import jax.numpy as jnp

    from nf_tpu.distributions import DiagGaussian, DiagGaussianProposal
    from nf_tpu.flows import MetropolisHastings

    target = DiagGaussian.create(2, trainable=False)
    prop = DiagGaussianProposal.create((2,), 0.5)
    mh = MetropolisHastings.create(target, prop, steps=200)

    key = jax.random.PRNGKey(0)
    z0 = 3.0 + jnp.zeros((2048, 2))  # start far off-target
    z, _ = jax.jit(lambda z, k: mh.forward(z, key=k))(z0,
                                                      jax.random.fold_in(key, 1))
    assert abs(float(jnp.mean(z))) < 0.15
    assert abs(float(jnp.std(z)) - 1.0) < 0.15


def test_hmc_chain_converges_to_target_moments():
    import jax
    import jax.numpy as jnp

    from nf_tpu.distributions import DiagGaussian
    from nf_tpu.flows import HamiltonianMonteCarlo

    target = DiagGaussian.create(2, trainable=False)
    hmc = HamiltonianMonteCarlo.create(
        target, steps=5, log_step_size=jnp.log(jnp.full((2,), 0.3)),
        log_mass=jnp.zeros((2,)))

    key = jax.random.PRNGKey(0)
    z = 3.0 + jnp.zeros((4096, 2))
    for i in range(30):
        z, _ = jax.jit(lambda z, k: hmc.forward(z, key=k))(
            z, jax.random.fold_in(key, i))
    assert abs(float(jnp.mean(z))) < 0.15
    assert abs(float(jnp.std(z)) - 1.0) < 0.15
