"""Residual flow tests (mirrors reference ``flows/residual_test.py`` and
``nets/lipschitz tests``): spectral norm bounds, fixed-point invertibility,
log-det estimators vs brute force, training step with update_lipschitz."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

import nf_tpu
import nf_tpu.distributions as dist
import nf_tpu.flows as nff
from nf_tpu.nets import InducedNormLinear, LipschitzCNN, LipschitzMLP
from nf_tpu.utils import (
    combine,
    lipschitz_scales,
    partition,
    update_lipschitz,
)

KEY = jax.random.PRNGKey(55)


def test_induced_norm_linear_spectral_bound():
    layer = InducedNormLinear.create(KEY, 8, 8, coeff=0.9)
    w_eff = layer._effective_weight()
    sigma = float(jnp.linalg.norm(np.asarray(w_eff), ord=2))
    assert sigma <= 0.9 * 1.05  # power-iteration estimate within 5%


def test_lipschitz_mlp_is_contractive():
    net = LipschitzMLP.create(KEY, [2, 32, 32, 2], lipschitz_const=0.9)
    x1 = jax.random.normal(KEY, (64, 2))
    x2 = x1 + 0.01 * jax.random.normal(jax.random.fold_in(KEY, 1), (64, 2))
    y1, y2 = net(x1), net(x2)
    ratios = (jnp.linalg.norm(y1 - y2, axis=1)
              / jnp.linalg.norm(x1 - x2, axis=1))
    assert float(jnp.max(ratios)) < 1.0


def test_lipschitz_cnn_shapes():
    net = LipschitzCNN.create(KEY, [2, 8, 2], kernel_size=[3, 3],
                              spatial_dims=(4, 4))
    x = jax.random.normal(KEY, (2, 2, 4, 4))
    assert net(x).shape == (2, 2, 4, 4)


def test_update_lipschitz_traversal():
    net = LipschitzMLP.create(KEY, [2, 16, 2])
    model = nf_tpu.NormalizingFlow.create(
        dist.DiagGaussian.create(2, trainable=False),
        [nff.Residual.create(net)], p=dist.TwoMoons())
    model2 = update_lipschitz(model, 10)
    scales = lipschitz_scales(model2)
    assert len(scales) == 2
    for s in scales:
        assert np.isfinite(float(s))


def test_residual_forward_inverse_fixed_point():
    net = LipschitzMLP.create(KEY, [3, 32, 3], lipschitz_const=0.9)
    flow = nff.Residual.create(net, n_power_series=8)
    x = jax.random.normal(KEY, (16, 3))
    z, ld_f = flow.forward(x, key=KEY)
    x_, ld_i = flow.inverse(z, key=KEY)
    np.testing.assert_allclose(np.asarray(x_), np.asarray(x), atol=1e-3)


def test_logdet_estimators_vs_brute_force():
    """Hutchinson series (basic & neumann value) ≈ exact 2D log-det in
    expectation; with a tight Lipschitz bound and many terms the truncated
    series is accurate."""
    net = LipschitzMLP.create(KEY, [2, 32, 2], lipschitz_const=0.5)
    x = 0.5 * jax.random.normal(KEY, (8, 2))

    exact = nff.iResBlock.create(net, brute_force=True)
    _, ld_exact = exact._logdetgrad(x, KEY)

    # truncated deterministic series with many terms, basic estimator,
    # averaged over Hutchinson noise
    block = nff.iResBlock.create(net, n_power_series=20, neumann_grad=False,
                                 grad_in_forward=False,
                                 n_power_series_max=24)
    lds = []
    for i in range(200):
        _, ld = block._logdetgrad(x, jax.random.fold_in(KEY, i))
        lds.append(np.asarray(ld))
    ld_mean = np.mean(lds, axis=0)
    np.testing.assert_allclose(ld_mean, np.asarray(ld_exact), atol=0.05)


def test_neumann_estimator_value_matches_basic():
    net = LipschitzMLP.create(KEY, [2, 16, 2], lipschitz_const=0.5)
    x = 0.3 * jax.random.normal(KEY, (4, 2))
    basic = nff.iResBlock.create(net, n_power_series=16, neumann_grad=False,
                                 grad_in_forward=False)
    neu = nff.iResBlock.create(net, n_power_series=16, neumann_grad=True,
                               grad_in_forward=False)
    _, ld_b = basic._logdetgrad(x, KEY)
    _, ld_n = neu._logdetgrad(x, KEY)
    np.testing.assert_allclose(np.asarray(ld_b), np.asarray(ld_n), atol=1e-4)


def test_unbiased_series_runs_and_is_finite():
    for n_dist in ["geometric", "poisson"]:
        net = LipschitzMLP.create(KEY, [2, 16, 2], lipschitz_const=0.7)
        block = nff.iResBlock.create(net, n_dist=n_dist, n_samples=2)
        x = jax.random.normal(KEY, (8, 2))
        g, ld = block._logdetgrad(x, KEY)
        assert np.isfinite(np.asarray(ld)).all()


def test_exact_trace_mode():
    net = LipschitzMLP.create(KEY, [3, 16, 3], lipschitz_const=0.5)
    block = nff.iResBlock.create(net, exact_trace=True, n_power_series=10)
    x = 0.3 * jax.random.normal(KEY, (4, 3))
    g, ld = block._logdetgrad(x, KEY)
    assert ld.shape == (4,)
    assert np.isfinite(np.asarray(ld)).all()


def test_residual_flow_trains():
    """Tiny residual flow on two moons: forward KLD decreases, with
    update_lipschitz per step (reference ``examples/residual.ipynb``)."""
    keys = jax.random.split(KEY, 4)
    flows = [
        nff.Residual.create(
            LipschitzMLP.create(keys[i], [2, 32, 32, 2],
                                lipschitz_const=0.9),
            n_power_series=6, reduce_memory=True)
        for i in range(4)
    ]
    model = nf_tpu.NormalizingFlow.create(
        dist.DiagGaussian.create(2, trainable=True), flows,
        p=dist.TwoMoons())
    data = dist.TwoMoons().sample(KEY, 256)
    opt = optax.adam(3e-3)
    opt_state = opt.init(partition(model)[0])

    @jax.jit
    def step(model, opt_state, key):
        # carry the whole model (params + power-iteration buffers) and
        # partition inside the step; update_lipschitz runs in-graph like
        # the reference example calls it once per iteration
        params, static = partition(model)

        def loss_fn(p):
            return -combine(p, static).log_prob(data, key=key).mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state)
        model = combine(optax.apply_updates(params, updates), static)
        model = update_lipschitz(model, 2)
        return model, opt_state, loss

    losses = []
    key = KEY
    for it in range(25):
        key, sub = jax.random.split(key)
        model, opt_state, loss = step(model, opt_state, sub)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses[::4]


def test_set_exact_logdet_matches_estimator_in_expectation():
    """Brute-force 2D log-det equals the exact Jacobian; the stochastic
    estimator's mean over points is close (its unbiasedness check)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    import nf_tpu.models as models
    from nf_tpu.flows import set_exact_logdet

    key = jax.random.PRNGKey(0)
    model = models.build_residual(key, dim=2, K=2, hidden=16,
                                  n_hidden_layers=2)
    exact = set_exact_logdet(model)
    x = jax.random.normal(key, (512, 2))

    _, ld_exact = exact.inverse_and_log_det(x)
    # jacfwd ground truth on a few points
    def true_ld(xi):
        J = jax.jacfwd(
            lambda v: exact.inverse_and_log_det(v[None])[0][0])(xi)
        return jnp.linalg.slogdet(J)[1]
    lds = jax.vmap(true_ld)(x[:32])
    np.testing.assert_allclose(np.asarray(ld_exact[:32]), np.asarray(lds),
                               atol=1e-4)

    _, ld_est = model.inverse_and_log_det(x, key=key)
    assert abs(float(jnp.mean(ld_est) - jnp.mean(ld_exact))) < 0.15


def test_conv_iresblock_basic_estimator_grad():
    """Regression: the basic (non-Neumann) estimator's scan accumulator
    must be (B,) for conv-shaped inputs too (the vma fix derives it from x,
    which is (B, C, H, W) here, not (B, D))."""
    net = LipschitzCNN.create(KEY, [2, 8, 2], kernel_size=[3, 1],
                              spatial_dims=(4, 4))
    flow = nff.Residual.create(net, n_power_series=4)
    # neumann_grad=False -> the fully differentiable basic series
    flow = flow.replace(iresblock=flow.iresblock.replace(neumann_grad=False))
    x = jax.random.normal(KEY, (3, 2, 4, 4))

    def loss(f):
        z, ld = f.inverse(x, key=KEY)
        return jnp.sum(ld)

    val, grads = jax.value_and_grad(loss)(flow)
    assert np.isfinite(float(val))
    flat = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in flat)
