"""Multi-device tests on the 8-virtual-CPU mesh: sharded MLE and VI steps
produce the same math as single-device, and scale the sample dimension."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

import nf_tpu
import nf_tpu.distributions as dist
import nf_tpu.flows as nff
from nf_tpu.nets import MLP
from nf_tpu.parallel import (
    TrainState,
    init_train_state,
    make_forward_kld_step,
    make_reverse_kld_step,
    make_mesh,
    shard_batch,
)
from nf_tpu.utils import combine, create_alternating_binary_mask, partition

KEY = jax.random.PRNGKey(99)


def make_model(key, K=4, hidden=32):
    keys = jax.random.split(key, 2 * K)
    flows = []
    for i in range(K):
        b = create_alternating_binary_mask(2, even=(i % 2 == 0))
        s = MLP.create(keys[2 * i], [2, hidden, 2], init_zeros=True)
        t = MLP.create(keys[2 * i + 1], [2, hidden, 2], init_zeros=True)
        flows.append(nff.MaskedAffineFlow.create(b, t=t, s=s))
        flows.append(nff.ActNorm.create(2))
    q0 = dist.DiagGaussian.create(2, trainable=False)
    return nf_tpu.NormalizingFlow.create(q0, flows, p=dist.TwoModes())


def test_mesh_has_8_devices():
    mesh = make_mesh()
    assert mesh.devices.size == 8


def test_data_parallel_forward_kld_matches_single_device():
    mesh = make_mesh()
    model = make_model(KEY)
    x = dist.TwoMoons().sample(KEY, 64)
    opt = optax.adam(1e-3)
    state, static = init_train_state(model, opt)

    step_sharded = make_forward_kld_step(static, opt, mesh=mesh)
    step_local = make_forward_kld_step(static, opt, mesh=None)

    # the sharded step donates its input state; give each step its own copy
    state2 = jax.tree_util.tree_map(jnp.array, state)

    xs = shard_batch(mesh, x)
    state_s, loss_s = step_sharded(state, xs)
    state_l, loss_l = step_local(state2, x)

    np.testing.assert_allclose(float(loss_s), float(loss_l), rtol=1e-5)
    # updated parameters agree
    for a, b in zip(jax.tree_util.tree_leaves(state_s.params),
                    jax.tree_util.tree_leaves(state_l.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_sample_parallel_reverse_kld_trains():
    mesh = make_mesh()
    model = make_model(KEY)
    model = model.init_from_samples(KEY, num_samples=128)
    opt = optax.adam(5e-3)
    state, static = init_train_state(model, opt)
    step = make_reverse_kld_step(static, opt, mesh, num_samples=512)
    losses = []
    key = KEY
    for it in range(60):
        key, sub = jax.random.split(key)
        state, loss = step(state, sub)
        losses.append(float(loss))
    assert int(state.step) == 60
    assert np.mean(losses[-10:]) < np.mean(losses[:10]) - 0.2, losses[::10]


def test_reverse_kld_beta_schedule_applies():
    mesh = make_mesh()
    model = make_model(KEY)
    opt = optax.sgd(0.0)  # no updates: isolate the beta effect
    state, static = init_train_state(model, opt)
    full = make_reverse_kld_step(static, opt, mesh, num_samples=256)
    cold = make_reverse_kld_step(static, opt, mesh, num_samples=256,
                                 beta_schedule=lambda s: 0.1)
    state2 = jax.tree_util.tree_map(jnp.array, state)
    _, l_full = full(state, KEY)
    _, l_cold = cold(state2, KEY)
    assert not np.allclose(float(l_full), float(l_cold))


def test_reverse_kld_sharded_matches_replicated_math():
    """The psum-of-local-means estimator equals the global mean when each
    device uses its own fold_in key — check the loss is deterministic given
    the key and finite."""
    mesh = make_mesh()
    model = make_model(KEY)
    opt = optax.sgd(0.0)
    state, static = init_train_state(model, opt)
    step = make_reverse_kld_step(static, opt, mesh, num_samples=256)
    state2 = jax.tree_util.tree_map(jnp.array, state)  # step donates input
    _, l1 = step(state, KEY)
    _, l2 = step(state2, KEY)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)


def test_sharded_sampling_and_log_prob():
    """log_prob on a sharded batch runs under jit with the batch split over
    devices (inference-side data parallelism)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = make_mesh()
    model = make_model(KEY)
    x = jax.device_put(jax.random.normal(KEY, (64, 2)),
                       NamedSharding(mesh, P("data", None)))
    lp = jax.jit(model.log_prob)(x)
    assert lp.shape == (64,)
    assert np.isfinite(np.asarray(lp)).all()


def test_sharded_hais_sampler():
    """HAIS chains shard over the mesh; outputs match shapes and the
    weighted mean lands near the prior/target overlap."""
    import numpy as np

    from nf_tpu.distributions import DiagGaussian, TwoModes
    from nf_tpu.parallel import log_normalizer, make_sharded_sampler
    from nf_tpu.parallel.mesh import make_mesh
    from nf_tpu.sampling import HAIS

    mesh = make_mesh(("data",))
    betas = np.linspace(1.0, 0.0, 9)
    hais = HAIS.create(betas, DiagGaussian.create(2, trainable=False),
                       TwoModes(), num_leapfrog=3, step_size=[0.1, 0.1],
                       log_mass=[0.0, 0.0])
    sample = make_sharded_sampler(mesh, num_samples=64)
    z, log_w = sample(hais, jax.random.PRNGKey(0))
    assert z.shape == (64, 2) and log_w.shape == (64,)
    assert np.isfinite(np.asarray(log_w)).all()
    assert np.isfinite(float(log_normalizer(log_w)))


def test_sharded_hais_acceptance_stats():
    """The psum'd (pmean) MCMC acceptance collective equals the gathered
    computation: running each device's folded-key chain batch on one device
    and averaging the rates reproduces the sharded sampler's replicated
    acceptance output bit-for-bit (equal local batches => pmean of local
    means is the global mean)."""
    import numpy as np

    from nf_tpu.distributions import DiagGaussian, TwoModes
    from nf_tpu.parallel import make_sharded_sampler
    from nf_tpu.parallel.mesh import make_mesh
    from nf_tpu.sampling import HAIS

    mesh = make_mesh(("data",))
    n_dev = mesh.shape["data"]
    betas = np.linspace(1.0, 0.0, 9)
    hais = HAIS.create(betas, DiagGaussian.create(2, trainable=False),
                       TwoModes(), num_leapfrog=3, step_size=[0.1, 0.1],
                       log_mass=[0.0, 0.0])
    key = jax.random.PRNGKey(3)
    sample = make_sharded_sampler(mesh, num_samples=64, with_stats=True)
    z, log_w, acc = sample(hais, key)
    n_layers = len(hais.layers)
    assert z.shape == (64, 2) and log_w.shape == (64,)
    assert acc.shape == (n_layers,)
    acc = np.asarray(acc)
    assert np.all(acc >= 0) and np.all(acc <= 1)
    assert np.any(acc > 0)  # chains actually moved
    # gathered-sample recomputation: per-device folded chains run locally
    local = 64 // n_dev
    gathered = np.mean(
        [np.asarray(jax.jit(hais.sample_with_stats, static_argnums=1)(
            jax.random.fold_in(key, i), local)[2]) for i in range(n_dev)],
        axis=0)
    np.testing.assert_allclose(acc, gathered, atol=1e-6)


def test_sample_with_mcmc_stats_container():
    """NormalizingFlow.sample_with_mcmc_stats surfaces per-MCMC-layer
    acceptance tuples and leaves (z, log_q) identical to plain sample."""
    import numpy as np

    from nf_tpu.distributions import DiagGaussianProposal, TwoModes

    q0 = dist.DiagGaussian.create(2, trainable=False)
    mh = nff.MetropolisHastings.create(
        TwoModes(), DiagGaussianProposal.create((2,), 0.2), steps=5)
    hmc = nff.HamiltonianMonteCarlo.create(
        TwoModes(), 3, jnp.log(jnp.full((2,), 0.1)), jnp.zeros((2,)))
    model = nf_tpu.NormalizingFlow.create(q0, [mh, nff.ActNorm.create(2),
                                               hmc], p=TwoModes())
    key = jax.random.PRNGKey(11)
    z, log_q, acc = model.sample_with_mcmc_stats(key, 128)
    z2, log_q2 = model.sample(key, 128)
    np.testing.assert_array_equal(np.asarray(z), np.asarray(z2))
    np.testing.assert_array_equal(np.asarray(log_q), np.asarray(log_q2))
    assert len(acc) == 2  # one per MCMC layer, ActNorm contributes nothing
    assert acc[0].shape == (5,) and acc[1].shape == (1,)
    for a in acc:
        a = np.asarray(a)
        assert np.all((a >= 0) & (a <= 1))


def test_sharded_sampler_matches_flow_sampling_consistency():
    """A NormalizingFlow is itself a valid sampler for the sharded driver
    (sample() returns (z, log_q))."""
    import numpy as np

    from nf_tpu.parallel import make_sharded_sampler
    from nf_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(("data",))
    model = make_model(jax.random.PRNGKey(0))
    sample = make_sharded_sampler(mesh, num_samples=64)
    z, log_q = sample(model, jax.random.PRNGKey(1))
    lp = model.log_prob(z)
    np.testing.assert_allclose(np.asarray(lp), np.asarray(log_q), atol=5e-4)


def test_tp_sharded_step_matches_replicated():
    """dp x tp 2D mesh with conditioner weights split over `model`: the
    loss and updated params match the replicated run exactly."""
    import numpy as np
    import optax

    from nf_tpu.parallel import (
        init_train_state,
        make_forward_kld_step,
        param_shardings,
        shard_batch,
    )
    from nf_tpu.parallel.mesh import make_mesh

    model = make_model(jax.random.PRNGKey(0), K=2, hidden=32)
    opt = optax.adam(1e-2)
    x = jax.random.normal(jax.random.PRNGKey(1), (32, 2))

    mesh1 = make_mesh(("data",))
    s1, static1 = init_train_state(model, opt)
    step1 = make_forward_kld_step(static1, opt, mesh=mesh1)
    s1, loss1 = step1(s1, shard_batch(mesh1, x))

    mesh2 = make_mesh(("data", "model"), shape=(4, 2))
    s2, static2 = init_train_state(model, opt)
    sh = param_shardings(s2, mesh2, axis="model")
    s2 = jax.tree_util.tree_map(jax.device_put, s2, sh)
    step2 = make_forward_kld_step(static2, opt, mesh=mesh2,
                                  state_shardings=sh)
    s2, loss2 = step2(s2, shard_batch(mesh2, x))

    np.testing.assert_allclose(float(loss2), float(loss1), atol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-5)
    # at least one weight is actually split over the model axis
    from jax.sharding import PartitionSpec as P
    specs = [s.spec for s in jax.tree_util.tree_leaves(sh)]
    assert any("model" in str(sp) for sp in specs)
