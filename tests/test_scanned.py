"""Scanned (lax.scan) layer stacks must match the unrolled Python list
exactly: same params (same keys) -> same outputs, log-dets, losses, and
working ActNorm data-dependent init."""

import jax
import jax.numpy as jnp
import numpy as np

import nf_tpu.models as models

KEY = jax.random.PRNGKey(11)


def _models():
    m_unrolled = models.build_realnvp(KEY, dim=2, K=8, hidden=[16, 16],
                                      scan=False)
    m_scanned = models.build_realnvp(KEY, dim=2, K=8, hidden=[16, 16],
                                     scan=True)
    return m_unrolled, m_scanned


def test_scanned_matches_unrolled_forward_inverse():
    m0, m1 = _models()
    x = jax.random.normal(KEY, (32, 2))
    z0, ld0 = m0.forward_and_log_det(x)
    z1, ld1 = m1.forward_and_log_det(x)
    np.testing.assert_allclose(np.asarray(z1), np.asarray(z0), atol=1e-5)
    np.testing.assert_allclose(np.asarray(ld1), np.asarray(ld0), atol=1e-5)
    x0, li0 = m0.inverse_and_log_det(z0)
    x1, li1 = m1.inverse_and_log_det(z1)
    np.testing.assert_allclose(np.asarray(x1), np.asarray(x0), atol=1e-5)
    np.testing.assert_allclose(np.asarray(li1), np.asarray(li0), atol=1e-5)


def test_scanned_init_and_losses_match():
    m0, m1 = _models()
    k1, k2 = jax.random.split(KEY)
    m0 = m0.init_from_samples(k1, 64)
    m1 = m1.init_from_samples(k1, 64)
    # ActNorm buffers inside the scanned stack must have initialized
    l0 = float(m0.reverse_kld(k2, 128))
    l1 = float(m1.reverse_kld(k2, 128))
    np.testing.assert_allclose(l1, l0, atol=1e-4)
    x = jax.random.normal(k2, (64, 2))
    np.testing.assert_allclose(float(m1.forward_kld(x)),
                               float(m0.forward_kld(x)), atol=1e-4)


def test_scanned_gradients_match():
    m0, m1 = _models()
    from nf_tpu.utils.module import combine, partition

    x = jax.random.normal(KEY, (64, 2))

    def loss(params, static):
        return combine(params, static).forward_kld(x)

    p0, s0 = partition(m0)
    p1, s1 = partition(m1)
    g0 = jax.grad(loss)(p0, s0)
    g1 = jax.grad(loss)(p1, s1)
    n0 = jnp.sqrt(sum(jnp.sum(g**2) for g in jax.tree_util.tree_leaves(g0)))
    n1 = jnp.sqrt(sum(jnp.sum(g**2) for g in jax.tree_util.tree_leaves(g1)))
    np.testing.assert_allclose(float(n1), float(n0), rtol=1e-4)


def test_scanned_remat_matches():
    """remat=True recomputes activations in backward; results identical."""
    import nf_tpu.flows as nff
    from nf_tpu.utils.module import combine, partition

    m0, _ = _models()
    stack = models.build_realnvp(KEY, dim=2, K=8, hidden=[16, 16],
                                 scan=True)
    scanned = stack.flows[0]
    rem = stack.replace(flows=(scanned.replace(remat=True),))
    x = jax.random.normal(KEY, (64, 2))

    def loss(params, static):
        return combine(params, static).forward_kld(x)

    p0, s0 = partition(stack)
    p1, s1 = partition(rem)
    np.testing.assert_allclose(float(loss(p1, s1)), float(loss(p0, s0)),
                               atol=1e-6)
    g0 = jax.grad(loss)(p0, s0)
    g1 = jax.grad(loss)(p1, s1)
    for a, b in zip(jax.tree_util.tree_leaves(g0),
                    jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-5)


def test_scanned_glow_matches_unrolled():
    """Each level's K GlowBlocks packed into one lax.scan: same density."""
    key = jax.random.PRNGKey(3)
    x = jax.random.uniform(key, (8, 3, 8, 8), minval=0.01, maxval=0.99)
    y = jnp.zeros((8,), jnp.int32)
    m0 = models.build_glow_multiscale(key, input_shape=(3, 8, 8), L=2, K=4,
                                      hidden_channels=16, scan=False)
    m1 = models.build_glow_multiscale(key, input_shape=(3, 8, 8), L=2, K=4,
                                      hidden_channels=16, scan=True)
    m0 = m0.init_from_data(x, y)
    m1 = m1.init_from_data(x, y)
    l0 = np.asarray(m0.log_prob(x, y))
    l1 = np.asarray(m1.log_prob(x, y))
    np.testing.assert_allclose(l1, l0, rtol=1e-4, atol=1e-2)
