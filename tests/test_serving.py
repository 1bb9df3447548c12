"""AOT serving path: compiled sampler/log_prob match the jitted model,
rebind without recompile, cost analysis exposed."""

import jax
import jax.numpy as jnp
import numpy as np

import nf_tpu.models as models
from nf_tpu.serving import compile_log_prob, compile_sampler
from nf_tpu.utils.module import combine, partition


def test_compiled_log_prob_matches_model():
    key = jax.random.PRNGKey(0)
    model = models.build_realnvp(key, dim=2, K=4, hidden=[16, 16])
    served = compile_log_prob(model, (32, 2))
    x = jax.random.normal(key, (32, 2))
    np.testing.assert_allclose(np.asarray(served(x)),
                               np.asarray(model.log_prob(x)), atol=1e-5)
    fl = served.flops()
    assert fl is None or fl > 0


def test_compiled_sampler_matches_model():
    key = jax.random.PRNGKey(1)
    model = models.build_nsf(key, dim=2, K=2, hidden=16, num_bins=4)
    served = compile_sampler(model, num_samples=64)
    k = jax.random.PRNGKey(7)
    z, log_q = served(k)
    z2, log_q2 = model.sample(k, 64)
    np.testing.assert_allclose(np.asarray(z), np.asarray(z2), atol=1e-5)
    np.testing.assert_allclose(np.asarray(log_q), np.asarray(log_q2),
                               atol=1e-4)


def test_with_model_rebinds_without_recompile():
    key = jax.random.PRNGKey(2)
    model = models.build_realnvp(key, dim=2, K=2, hidden=[8, 8])
    served = compile_log_prob(model, (8, 2))
    # perturb params
    params, static = partition(model)
    params2 = jax.tree_util.tree_map(
        lambda a: a + 0.01 if a is not None else None, params,
        is_leaf=lambda x: x is None)
    model2 = combine(params2, static)
    served2 = served.with_model(model2)
    assert served2._compiled is served._compiled
    x = jax.random.normal(key, (8, 2))
    a = np.asarray(served(x))
    b = np.asarray(served2(x))
    assert not np.allclose(a, b)
    np.testing.assert_allclose(b, np.asarray(model2.log_prob(x)), atol=1e-5)


def test_compiled_conditional_log_prob():
    key = jax.random.PRNGKey(3)
    model = models.build_conditional_nsf(key, dim=2, context_size=3, K=2,
                                         hidden=16)
    served = compile_log_prob(model, (16, 2), context_shape=(16, 3))
    x = jax.random.normal(key, (16, 2))
    c = jax.random.normal(key, (16, 3))
    np.testing.assert_allclose(np.asarray(served(x, c)),
                               np.asarray(model.log_prob(x, context=c)),
                               atol=1e-5)


def test_temperature_with_context_raises():
    import pytest

    key = jax.random.PRNGKey(5)
    model = models.build_conditional_nsf(key, dim=2, context_size=3, K=2,
                                         hidden=16)
    with pytest.raises(ValueError, match="temperature"):
        compile_sampler(model, 8, temperature=0.7, context_shape=(8, 3))


def test_typed_key_sampler():
    key = jax.random.PRNGKey(6)
    model = models.build_realnvp(key, dim=2, K=2, hidden=[8, 8])
    served = compile_sampler(model, num_samples=16, typed_key=True)
    z, _ = served(jax.random.key(3))
    assert z.shape == (16, 2)


def test_compiled_multiscale_sampler_temperature():
    key = jax.random.PRNGKey(4)
    model = models.build_glow_multiscale(key, input_shape=(3, 8, 8), L=1,
                                         K=2, hidden_channels=16,
                                         class_cond=False)
    x0 = jax.random.uniform(key, (8, 3, 8, 8), minval=0.01, maxval=0.99)
    model = model.init_from_data(x0)
    served = compile_sampler(model, num_samples=4, temperature=0.7)
    z, _ = served(jax.random.PRNGKey(9))
    assert z.shape == (4, 3, 8, 8)
    assert bool(jnp.isfinite(z).all())


def test_class_cond_sampler_and_log_prob():
    """Class-conditional AOT entries: labels thread into the base
    (reference ClassCondFlow semantics, core.py:369-452)."""
    from nf_tpu.serving import compile_log_prob as clp
    from nf_tpu.serving import compile_sampler as cs

    key = jax.random.PRNGKey(0)
    model = models.build_glow_multiscale(
        key, input_shape=(3, 8, 8), L=1, K=1, hidden_channels=8,
        class_cond=True, num_classes=4)
    x0 = jax.random.uniform(key, (6, 3, 8, 8), minval=0.1, maxval=0.9)
    y0 = jnp.arange(6, dtype=jnp.int32) % 4
    model = model.init_from_data(x0, y0)

    sampler = cs(model, num_samples=6, class_cond=True, temperature=0.7)
    z, log_q = sampler(jax.random.PRNGKey(1), y0)
    assert z.shape == (6, 3, 8, 8)
    assert np.isfinite(np.asarray(log_q)).all()

    lp = clp(model, (6, 3, 8, 8), class_cond=True)
    got = np.asarray(lp(x0, y0))
    want = np.asarray(model.log_prob(x0, y0))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-4)


def test_bucketed_log_prob_serves_ragged_batches():
    from nf_tpu.serving import compile_log_prob_buckets

    key = jax.random.PRNGKey(0)
    model = models.build_realnvp(key, dim=2, K=2, hidden=[8, 8])
    model = model.init_from_samples(key, 64)
    served = compile_log_prob_buckets(model, max_batch=16,
                                      feature_shape=(2,))
    assert served.buckets == (1, 2, 4, 8, 16)
    for n in (1, 3, 5, 8, 13, 16):
        x = jax.random.normal(jax.random.fold_in(key, n), (n, 2))
        got = np.asarray(served(x))
        assert got.shape == (n,)
        np.testing.assert_allclose(got, np.asarray(model.log_prob(x)),
                                   rtol=1e-5, atol=1e-4)
    import pytest as _pytest
    with _pytest.raises(ValueError):
        served(jnp.zeros((17, 2)))


def test_bucketed_class_cond():
    from nf_tpu.serving import compile_log_prob_buckets

    key = jax.random.PRNGKey(0)
    model = models.build_glow_multiscale(
        key, input_shape=(3, 8, 8), L=1, K=1, hidden_channels=8,
        class_cond=True, num_classes=4)
    x0 = jax.random.uniform(key, (8, 3, 8, 8), minval=0.1, maxval=0.9)
    y0 = jnp.arange(8, dtype=jnp.int32) % 4
    model = model.init_from_data(x0, y0)
    served = compile_log_prob_buckets(model, max_batch=8,
                                      feature_shape=(3, 8, 8),
                                      class_cond=True, buckets=(4, 8))
    got = np.asarray(served(x0[:3], y0[:3]))
    want = np.asarray(model.log_prob(x0[:3], y0[:3]))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-4)


def test_class_cond_flow_sampler_temperature():
    """ClassCondFlow (non-multiscale) + temperature: the base is annealed
    via with_temperature; previously this raised TypeError at trace time."""
    import nf_tpu
    import nf_tpu.flows as nff
    from nf_tpu.distributions import ClassCondDiagGaussian
    from nf_tpu.serving import compile_sampler

    q0 = ClassCondDiagGaussian.create(2, num_classes=3)
    model = nf_tpu.ClassCondFlow.create(q0, [nff.ActNorm.create(2)])
    served = compile_sampler(model, num_samples=6, class_cond=True,
                             temperature=0.5)
    y = jnp.zeros((6,), jnp.int32)
    z, log_q = served(jax.random.PRNGKey(0), y)
    assert z.shape == (6, 2) and np.isfinite(np.asarray(log_q)).all()
    # temperature shrinks the base scale: colder samples on average
    served_hot = compile_sampler(model, num_samples=6, class_cond=True)
    z_hot, _ = served_hot(jax.random.PRNGKey(0), y)
    assert float(jnp.std(z)) < float(jnp.std(z_hot)) + 1e-6


def test_export_log_prob_roundtrip_frozen():
    """Frozen artifact: serialize -> drop the model -> reload -> same
    densities. The deserialized handle needs no nf_tpu code paths."""
    from nf_tpu.serving import export_log_prob, load_exported

    key = jax.random.PRNGKey(9)
    model = models.build_realnvp(key, dim=2, K=2, hidden=[8, 8])
    x = jax.random.normal(key, (16, 2))
    want = np.asarray(model.log_prob(x))

    blob = export_log_prob(model, (16, 2))
    assert isinstance(blob, bytes) and len(blob) > 0
    fn = load_exported(blob)
    np.testing.assert_allclose(np.asarray(fn(x)), want, atol=1e-5)


def test_export_sampler_roundtrip_file(tmp_path):
    from nf_tpu.serving import export_sampler, load_exported

    key = jax.random.PRNGKey(10)
    model = models.build_nsf(key, dim=2, K=2, hidden=16, num_bins=4)
    path = tmp_path / "sampler.stablehlo"
    path.write_bytes(export_sampler(model, num_samples=32))

    fn = load_exported(str(path))
    k = jax.random.PRNGKey(3)
    z, log_q = fn(k)
    z2, log_q2 = model.sample(k, 32)
    np.testing.assert_allclose(np.asarray(z), np.asarray(z2), atol=1e-5)
    np.testing.assert_allclose(np.asarray(log_q), np.asarray(log_q2),
                               atol=1e-4)


def test_export_log_prob_refreshable_params():
    """freeze_params=False: one artifact, hot-swapped weights at call
    time."""
    from nf_tpu.serving import export_log_prob, load_exported

    key = jax.random.PRNGKey(11)
    model = models.build_realnvp(key, dim=2, K=2, hidden=[8, 8])
    params, static = partition(model)
    blob = export_log_prob(model, (8, 2), freeze_params=False)
    fn = load_exported(blob)

    x = jax.random.normal(key, (8, 2))
    leaves = jax.tree_util.tree_leaves(params)
    np.testing.assert_allclose(np.asarray(fn(leaves, x)),
                               np.asarray(model.log_prob(x)), atol=1e-5)
    params2 = jax.tree_util.tree_map(
        lambda a: a + 0.05 if a is not None else None, params,
        is_leaf=lambda v: v is None)
    model2 = combine(params2, static)
    np.testing.assert_allclose(
        np.asarray(fn(jax.tree_util.tree_leaves(params2), x)),
        np.asarray(model2.log_prob(x)), atol=1e-5)


def test_export_class_cond_sampler_roundtrip():
    from nf_tpu.serving import export_sampler, load_exported

    key = jax.random.PRNGKey(12)
    model = models.build_glow_multiscale(
        key, input_shape=(3, 8, 8), L=2, K=1, hidden_channels=16,
        class_cond=True, num_classes=4)
    y = jnp.arange(8, dtype=jnp.int32) % 4
    k = jax.random.PRNGKey(4)
    fn = load_exported(export_sampler(model, num_samples=8, class_cond=True,
                                      temperature=0.7))
    z, log_q = fn(k, y)
    z2, log_q2 = model.sample(k, 8, y=y, temperature=0.7)
    np.testing.assert_allclose(np.asarray(z), np.asarray(z2), atol=1e-4)
    np.testing.assert_allclose(np.asarray(log_q), np.asarray(log_q2),
                               atol=1e-3)
