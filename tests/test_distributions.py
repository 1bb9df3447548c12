"""Distribution tests: sampling/density consistency (mirrors reference
``distributions/distribution_test.py`` fixture) plus target samplers."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import nf_tpu.distributions as dist
from nf_tpu.nets import MLP

from helpers import check_forward_log_prob

KEY = jax.random.PRNGKey(42)


def test_diag_gaussian():
    q = dist.DiagGaussian.create((4,))
    check_forward_log_prob(q, KEY)
    # temperature annealing scales the std
    qt = q.with_temperature(0.5)
    z, log_p = qt.forward(KEY, 1000)
    assert float(jnp.std(z)) < 0.7


def test_diag_gaussian_nontrivial_params():
    q = dist.DiagGaussian.create((3,))
    q = q.replace(loc=jnp.asarray([[1.0, -2.0, 0.5]]),
                  log_scale=jnp.asarray([[0.1, -0.3, 0.2]]))
    z, log_p = check_forward_log_prob(q, KEY, num_samples=10)
    # against scipy-style analytic density
    scale = np.exp(np.asarray(q.log_scale))
    ref = -0.5 * 3 * np.log(2 * np.pi) - np.sum(
        np.asarray(q.log_scale)
        + 0.5 * ((np.asarray(z) - np.asarray(q.loc)) / scale) ** 2, axis=1)
    np.testing.assert_allclose(np.asarray(log_p), ref, rtol=1e-4)


def test_conditional_diag_gaussian():
    enc = MLP.create(KEY, [2, 8, 6])
    q = dist.ConditionalDiagGaussian.create((3,), enc)
    ctx = jax.random.normal(KEY, (5, 2))
    z, log_p = q.forward(KEY, 5, context=ctx)
    log_p_ = q.log_prob(z, context=ctx)
    np.testing.assert_allclose(np.asarray(log_p), np.asarray(log_p_),
                               atol=1e-4)


def test_uniform():
    q = dist.Uniform.create((3,), low=-2.0, high=1.0)
    z, log_p = check_forward_log_prob(q, KEY)
    assert float(jnp.min(z)) >= -2.0 and float(jnp.max(z)) <= 1.0
    out = q.log_prob(jnp.asarray([[5.0, 0.0, 0.0]]))
    assert np.isneginf(np.asarray(out))[0]


def test_uniform_gaussian():
    q = dist.UniformGaussian.create(3, ind=[0], scale=jnp.asarray([2.0, 1.0, 0.5]))
    z, _ = check_forward_log_prob(q, KEY, num_samples=2000)
    z = np.asarray(z)
    assert np.abs(z[:, 0]).max() <= 1.0  # uniform in [-1, 1] (scale 2)
    assert np.abs(z[:, 1]).max() > 1.5  # gaussian


def test_class_cond_diag_gaussian():
    q = dist.ClassCondDiagGaussian.create((4,), num_classes=3)
    y = jnp.asarray([0, 1, 2, 1, 0])
    z, log_p = q.forward(KEY, y=y)
    log_p_ = q.log_prob(z, y)
    np.testing.assert_allclose(np.asarray(log_p), np.asarray(log_p_),
                               atol=1e-4)
    # sampled classes when y is None
    z2, _ = q.forward(KEY, num_samples=7)
    assert z2.shape == (7, 4)


def test_glow_base():
    for num_classes in [None, 3]:
        q = dist.GlowBase.create((2, 4, 4), num_classes=num_classes)
        if num_classes:
            y = jnp.asarray([0, 1, 2])
            z, log_p = q.forward(KEY, y=y)
            log_p_ = q.log_prob(z, y)
        else:
            z, log_p = q.forward(KEY, 3)
            log_p_ = q.log_prob(z)
        np.testing.assert_allclose(np.asarray(log_p), np.asarray(log_p_),
                                   atol=1e-3)


def test_affine_gaussian():
    for num_classes in [None, 3]:
        q = dist.AffineGaussian.create((4,), (4,), num_classes=num_classes)
        if num_classes:
            y = jnp.asarray([0, 1, 2])
            z, log_p = q.forward(KEY, y=y)
            log_p_ = q.log_prob(z, y)
        else:
            z, log_p = q.forward(KEY, 3)
            log_p_ = q.log_prob(z)
        np.testing.assert_allclose(np.asarray(log_p), np.asarray(log_p_),
                                   atol=1e-4)


def test_gaussian_mixture():
    q = dist.GaussianMixture.create(3, 2, key=KEY)
    check_forward_log_prob(q, KEY, num_samples=10)


def test_gaussian_pca():
    q = dist.GaussianPCA.create(KEY, 4, latent_dim=2)
    z, log_p = q.forward(KEY, 5)
    assert z.shape == (5, 4)
    log_p_ = q.log_prob(z)
    np.testing.assert_allclose(np.asarray(log_p), np.asarray(log_p_),
                               atol=1e-3)


def test_two_moons_sampling():
    t = dist.TwoMoons()
    z = t.sample(KEY, 512)
    assert z.shape == (512, 2)
    # samples concentrate on radius-2 ring
    r = np.linalg.norm(np.asarray(z), axis=1)
    assert np.abs(r - 2).mean() < 0.5
    lp = t.log_prob(z)
    assert np.isfinite(np.asarray(lp)).all()


def test_circular_gaussian_mixture():
    t = dist.CircularGaussianMixture(n_modes=8)
    z = t.sample(KEY, 256)
    r = np.linalg.norm(np.asarray(z), axis=1)
    assert np.abs(r - 2).mean() < 0.7
    assert np.isfinite(np.asarray(t.log_prob(z))).all()


def test_ring_mixture():
    t = dist.RingMixture(n_rings=2)
    lp = t.log_prob(jax.random.normal(KEY, (10, 2)))
    assert lp.shape == (10,)


def test_two_independent():
    t = dist.TwoIndependent(target1=dist.TwoMoons(), target2=dist.TwoMoons())
    z = t.sample(KEY, 16)
    assert z.shape == (16, 4)
    assert np.isfinite(np.asarray(t.log_prob(z))).all()


def test_priors_finite():
    z = jax.random.normal(KEY, (10, 2))
    for prior in [dist.TwoModes(loc=2.0, scale=0.2),
                  dist.Sinusoidal(scale=0.1, period=1.0),
                  dist.Sinusoidal_gap(scale=0.1, period=1.0),
                  dist.Sinusoidal_split(scale=0.1, period=1.0),
                  dist.Smiley(scale=0.2)]:
        lp = prior.log_prob(z)
        assert lp.shape == (10,)
        assert np.isfinite(np.asarray(lp)).all()


def test_image_prior():
    img = np.zeros((8, 8))
    img[2:6, 2:6] = 1.0
    prior = dist.ImagePrior.create(img)
    z = prior.sample(KEY, 64)
    assert z.shape == (64, 2)
    lp = prior.log_prob(z)
    assert np.isfinite(np.asarray(lp)).all()


def test_encoders():
    x = jax.random.normal(KEY, (4, 3))
    enc = dist.Dirac()
    z, log_q = enc.forward(KEY, x, num_samples=2)
    assert z.shape == (4, 2, 3)
    nn_enc = dist.NNDiagGaussian(net=MLP.create(KEY, [3, 8, 6]))
    z, log_q = nn_enc.forward(KEY, x, num_samples=2)
    assert z.shape == (4, 2, 3) and log_q.shape == (4, 2)
    cg = dist.ConstDiagGaussian.create([0.0, 1.0, -1.0], [1.0, 0.5, 2.0])
    z, log_q = cg.forward(KEY, x, num_samples=3)
    assert z.shape == (4, 3, 3)
    lp = cg.log_prob(z, x)
    np.testing.assert_allclose(np.asarray(lp.shape), [4, 3])


def test_decoders():
    z = jax.random.normal(KEY, (6, 2))
    x = jax.random.normal(KEY, (3, 2))
    dec = dist.NNDiagGaussianDecoder(net=MLP.create(KEY, [2, 8, 4]))
    lp = dec.log_prob(x, z)
    assert lp.shape == (6,)
    bdec = dist.NNBernoulliDecoder(net=MLP.create(KEY, [2, 8, 2]))
    xb = (jax.random.uniform(KEY, (3, 2)) > 0.5).astype(jnp.float32)
    lp = bdec.log_prob(xb, z)
    assert lp.shape == (6,)


def test_linear_interpolation():
    d1 = dist.TwoModes(loc=2.0, scale=0.2)
    d2 = dist.TwoMoons()
    li = dist.LinearInterpolation(dist1=d1, dist2=d2, alpha=0.3)
    z = jax.random.normal(KEY, (5, 2))
    ref = 0.3 * d1.log_prob(z) + 0.7 * d2.log_prob(z)
    np.testing.assert_allclose(np.asarray(li.log_prob(z)), np.asarray(ref),
                               rtol=1e-5)


def test_mh_proposal():
    prop = dist.DiagGaussianProposal.create((2,), 0.1)
    z = jax.random.normal(KEY, (5, 2))
    z_, diff = prop.propose(KEY, z)
    assert z_.shape == z.shape
    np.testing.assert_allclose(np.asarray(diff), np.zeros(5))
    lp = prop.log_prob(z_, z)
    assert lp.shape == (5,)
