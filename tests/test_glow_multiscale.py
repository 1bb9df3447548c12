"""GlowBlock / MultiscaleFlow / ClassCondFlow tests (mirrors reference
``flows/affine/glow_test.py`` and ``core_test.py`` multiscale cases)."""

import jax
import jax.numpy as jnp
import numpy as np

import nf_tpu
import nf_tpu.distributions as dist
import nf_tpu.flows as nff
from nf_tpu.transforms import Logit
from nf_tpu.utils.eval import bits_per_dim

from helpers import check_forward_inverse

KEY = jax.random.PRNGKey(21)


def test_glow_block_roundtrip():
    for scale_map in ["sigmoid", "exp"]:
        flow = nff.GlowBlock.create(KEY, channels=4, hidden_channels=8,
                                    scale_map=scale_map)
        x = jax.random.normal(KEY, (2, 4, 4, 4))
        check_forward_inverse(flow, x, atol=2e-4)


def test_glow_block_single_channel():
    flow = nff.GlowBlock.create(KEY, channels=1, hidden_channels=8,
                                split_mode="checkerboard")
    x = jax.random.normal(KEY, (2, 1, 4, 4))
    check_forward_inverse(flow, x, atol=2e-4)


def make_multiscale(key, L=2, K=2, base_channels=3, hw=8, class_cond=True,
                    num_classes=10):
    """Glow multiscale arithmetic as in the reference glow example
    (``examples/glow.ipynb`` cell 2): level i has K GlowBlocks on
    ``C * 2^(L+1-i)`` channels followed by a Squeeze."""
    C = base_channels
    keys = jax.random.split(key, L * K + L)
    q0, flows, merges = [], [], []
    ki = 0
    for i in range(L):
        ch = C * 2 ** (L + 1 - i)
        flows_ = [nff.GlowBlock.create(keys[ki + j], ch, 16)
                  for j in range(K)]
        ki += K
        flows_.append(nff.Squeeze())
        flows.append(flows_)
        if i > 0:
            merges.append(nff.Merge())
            latent_shape = (C * 2 ** (L - i), hw // 2 ** (L - i),
                            hw // 2 ** (L - i))
        else:
            latent_shape = (C * 2 ** (L + 1), hw // 2 ** L, hw // 2 ** L)
        if class_cond:
            q0.append(dist.ClassCondDiagGaussian.create(latent_shape,
                                                        num_classes))
        else:
            q0.append(dist.DiagGaussian.create(latent_shape))
    return nf_tpu.MultiscaleFlow.create(q0, flows, merges,
                                        transform=Logit(alpha=0.05),
                                        class_cond=class_cond)


def test_multiscale_sample_log_prob_shapes():
    model = make_multiscale(KEY)
    y = jnp.asarray([0, 1, 2])
    z, log_q = model.sample(KEY, num_samples=3, y=y)
    assert z.shape == (3, 3, 8, 8)
    lp = model.log_prob(z, y)
    assert lp.shape == (3,)
    assert np.isfinite(np.asarray(lp)).all()


def test_multiscale_forward_inverse_consistency():
    model = make_multiscale(KEY, class_cond=False)
    x = jax.random.uniform(KEY, (2, 3, 8, 8), minval=0.01, maxval=0.99)
    z, inv_ld = model.inverse_and_log_det(x)
    x_, fwd_ld = model.forward_and_log_det(z)
    np.testing.assert_allclose(np.asarray(x_), np.asarray(x), atol=5e-4)
    np.testing.assert_allclose(np.asarray(fwd_ld + inv_ld), np.zeros(2),
                               atol=5e-3)


def test_multiscale_sample_logprob_agreement():
    model = make_multiscale(KEY, class_cond=True)
    model = model.set_temperature(1.0).reset_temperature()
    y = jnp.asarray([1, 2])
    z, log_q = model.sample(KEY, num_samples=2, y=y)
    lp = model.log_prob(z, y)
    np.testing.assert_allclose(np.asarray(log_q), np.asarray(lp), rtol=1e-3,
                               atol=5e-3)


def test_multiscale_actnorm_init_and_kld():
    model = make_multiscale(KEY, class_cond=True)
    x = jax.random.uniform(KEY, (4, 3, 8, 8), minval=0.01, maxval=0.99)
    y = jnp.asarray([0, 1, 2, 3])
    model = model.init_from_data(x, y)
    loss = model.forward_kld(x, y)
    assert np.isfinite(float(loss))
    # after ActNorm init the latents are roughly normalized
    b = bits_per_dim(model, x, y)
    assert b.shape == (4,)
    assert np.isfinite(np.asarray(b)).all()


def test_temperature_annealed_sampling():
    model = make_multiscale(KEY, class_cond=True)
    y = jnp.zeros(8, dtype=jnp.int32)
    z_hot, _ = model.sample(KEY, num_samples=8, y=y, temperature=1.0)
    z_cold, _ = model.sample(KEY, num_samples=8, y=y, temperature=0.1)
    assert float(jnp.std(z_cold)) < float(jnp.std(z_hot))


def test_class_cond_flow():
    keys = jax.random.split(KEY, 3)
    q0 = dist.ClassCondDiagGaussian.create((4,), num_classes=3)
    flows = [nff.InvertibleAffine.create(keys[i], 4) for i in range(2)]
    model = nf_tpu.ClassCondFlow.create(q0, flows)
    y = jnp.asarray([0, 1, 2])
    z, log_q = model.sample(KEY, num_samples=3, y=y)
    lp = model.log_prob(z, y)
    np.testing.assert_allclose(np.asarray(log_q), np.asarray(lp), atol=1e-4)
    loss = model.forward_kld(z, y)
    assert np.isfinite(float(loss))


def test_image_nsf_log_prob_and_roundtrip():
    """Multi-scale image NSF (4D RQS couplings + ConvResidualNet)."""
    import nf_tpu.models as models

    key = jax.random.PRNGKey(0)
    model = models.build_image_nsf(key, input_shape=(3, 8, 8), L=2, K=2,
                                   hidden_channels=8, num_bins=4)
    x = jax.random.uniform(key, (4, 3, 8, 8), minval=0.05, maxval=0.95)
    model = model.init_from_data(x)
    lp = model.log_prob(x)
    assert lp.shape == (4,) and np.isfinite(np.asarray(lp)).all()
    z, ld = model.inverse_and_log_det(x)
    x2, ld2 = model.forward_and_log_det(z)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x), atol=1e-4)
    np.testing.assert_allclose(np.asarray(ld + ld2), 0.0, atol=1e-3)
    s, log_q = model.sample(jax.random.PRNGKey(1), 4)
    assert s.shape == (4, 3, 8, 8)
    lp_s = model.log_prob(s)
    np.testing.assert_allclose(np.asarray(lp_s), np.asarray(log_q),
                               rtol=0.05, atol=0.5)


def test_image_nsf_class_conditional():
    import nf_tpu.models as models

    key = jax.random.PRNGKey(0)
    model = models.build_image_nsf(key, input_shape=(3, 8, 8), L=2, K=1,
                                   hidden_channels=8, num_bins=4,
                                   class_cond=True, num_classes=5)
    x = jax.random.uniform(key, (4, 3, 8, 8), minval=0.05, maxval=0.95)
    y = jnp.asarray([0, 1, 2, 3])
    model = model.init_from_data(x, y)
    lp = model.log_prob(x, y)
    assert np.isfinite(np.asarray(lp)).all()
    s, log_q = model.sample(jax.random.PRNGKey(1), 4, y=y)
    assert s.shape == (4, 3, 8, 8)
