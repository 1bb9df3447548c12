"""Gradient accumulation + EMA training features (new vs the reference,
which has neither): microbatched grads must EQUAL full-batch grads for the
mean-based forward KLD, and the EMA must match its manual recurrence."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

import nf_tpu
import nf_tpu.distributions as dist
import nf_tpu.flows as nff
from nf_tpu.nets import MLP
from nf_tpu.parallel import (
    ema_model,
    init_train_state,
    make_forward_kld_step,
    make_mesh,
    make_reverse_kld_step,
    model_of_state,
    reshape_for_accum,
    shard_batch,
)
from nf_tpu.utils import create_alternating_binary_mask

KEY = jax.random.PRNGKey(7)


def make_model(key, K=4, hidden=16):
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


def _max_leaf_diff(a, b):
    return max(float(jnp.max(jnp.abs(x - y)))
               for x, y in zip(jax.tree_util.tree_leaves(a),
                               jax.tree_util.tree_leaves(b)))


def test_grad_accum_matches_full_batch_single_device():
    model = make_model(KEY)
    x = dist.TwoMoons().sample(KEY, 64)
    opt = optax.adam(1e-3)
    state, static = init_train_state(model, opt)
    state2 = jax.tree_util.tree_map(jnp.array, state)

    step_full = make_forward_kld_step(static, opt)
    step_accum = make_forward_kld_step(static, opt, accum_steps=4)

    s1, loss_full = step_full(state, x)
    s2, loss_accum = step_accum(state2, reshape_for_accum(x, 4))

    # the forward KLD is a batch MEAN: mean of 4 equal microbatch means ==
    # the full mean, so loss and updated params agree to f32 roundoff
    np.testing.assert_allclose(float(loss_accum), float(loss_full),
                               rtol=1e-5)
    assert _max_leaf_diff(s1.params, s2.params) < 1e-6


def test_grad_accum_matches_full_batch_on_mesh():
    mesh = make_mesh()
    model = make_model(KEY)
    x = dist.TwoMoons().sample(KEY, 64)
    opt = optax.adam(1e-3)
    state, static = init_train_state(model, opt)
    state2 = jax.tree_util.tree_map(jnp.array, state)

    step_full = make_forward_kld_step(static, opt, mesh=mesh)
    step_accum = make_forward_kld_step(static, opt, mesh=mesh,
                                       accum_steps=2)

    s1, loss_full = step_full(state, shard_batch(mesh, x))
    xa = shard_batch(mesh, reshape_for_accum(x, 2), accum=True)
    s2, loss_accum = step_accum(state2, xa)

    np.testing.assert_allclose(float(loss_accum), float(loss_full),
                               rtol=1e-5)
    assert _max_leaf_diff(s1.params, s2.params) < 1e-6


def test_grad_accum_class_conditional_tuple_batch():
    """(x, y) tuple batches microbatch leaf-wise through the same path."""
    key = jax.random.PRNGKey(3)
    q0 = dist.ClassCondDiagGaussian.create(2, num_classes=3)
    model = nf_tpu.ClassCondFlow.create(q0, [nff.ActNorm.create(2)])
    x = jax.random.normal(key, (24, 2))
    y = jax.random.randint(key, (24,), 0, 3)
    opt = optax.adam(1e-3)
    state, static = init_train_state(model, opt)
    state2 = jax.tree_util.tree_map(jnp.array, state)

    step_full = make_forward_kld_step(static, opt)
    step_accum = make_forward_kld_step(static, opt, accum_steps=3)
    _, loss_full = step_full(state, (x, y))
    _, loss_accum = step_accum(state2, reshape_for_accum((x, y), 3))
    np.testing.assert_allclose(float(loss_accum), float(loss_full),
                               rtol=1e-5)


def test_ema_matches_manual_recurrence():
    model = make_model(KEY)
    x = dist.TwoMoons().sample(KEY, 32)
    opt = optax.sgd(1e-2)
    state, static = init_train_state(model, opt, with_ema=True)
    decay = 0.9
    step = make_forward_kld_step(static, opt, ema_decay=decay)

    manual_ema = state.params
    for _ in range(3):
        prev_params = state.params
        state, _ = step(state, x)
        manual_ema = jax.tree_util.tree_map(
            lambda e, p: decay * e + (1 - decay) * p, manual_ema,
            state.params)
    assert _max_leaf_diff(state.ema_params, manual_ema) < 1e-6
    # ema_model rebuilds a usable model from the averaged params
    m = ema_model(state, static)
    lp = m.log_prob(x)
    assert np.isfinite(np.asarray(lp)).all()
    # and it differs from the live params' model after updates
    assert _max_leaf_diff(state.ema_params, state.params) > 0


def test_ema_requires_slot():
    model = make_model(KEY)
    opt = optax.adam(1e-3)
    state, static = init_train_state(model, opt)  # no with_ema
    step = make_forward_kld_step(static, opt, ema_decay=0.99)
    x = dist.TwoMoons().sample(KEY, 16)
    try:
        step(state, x)
    except ValueError as e:
        assert "with_ema" in str(e)
    else:
        raise AssertionError("expected ValueError without the EMA slot")


def test_reverse_kld_accum_runs_and_ema_updates():
    mesh = make_mesh()
    model = make_model(KEY)
    opt = optax.adam(1e-3)
    state, static = init_train_state(model, opt, with_ema=True)
    step = make_reverse_kld_step(static, opt, mesh, num_samples=64,
                                 accum_steps=2, ema_decay=0.95)
    key = jax.random.PRNGKey(0)
    state, loss1 = step(state, key)
    state, loss2 = step(state, jax.random.fold_in(key, 1))
    assert np.isfinite(float(loss1)) and np.isfinite(float(loss2))
    assert int(state.step) == 2
    assert _max_leaf_diff(state.ema_params, state.params) > 0


def test_reverse_kld_accum_same_sample_budget_close():
    """accum=2 draws 2 x 32 samples vs accum=1 drawing 64: different RNG
    streams, so losses agree only statistically — but both must be finite
    and in the same range on the untrained model."""
    mesh = make_mesh()
    model = make_model(KEY)
    opt = optax.sgd(0.0)  # no movement: compare pure loss estimates
    state, static = init_train_state(model, opt)
    state2 = jax.tree_util.tree_map(jnp.array, state)
    s1 = make_reverse_kld_step(static, opt, mesh, num_samples=4096)
    s2 = make_reverse_kld_step(static, opt, mesh, num_samples=4096,
                               accum_steps=4)
    _, l1 = s1(state, jax.random.PRNGKey(5))
    _, l2 = s2(state2, jax.random.PRNGKey(5))
    assert abs(float(l1) - float(l2)) < 0.2  # ~MC sem at 4096 samples


def test_train_binary_accum_ema_flags():
    """CLI wiring: --accum_steps/--ema_decay reach the step factories on
    both loss paths."""
    from nf_tpu import train

    state = train.main(["--model", "realnvp", "--loss", "forward_kld",
                        "--target", "two_moons", "--iters", "2",
                        "--num_layers", "2", "--hidden", "16",
                        "--batch_size", "64", "--accum_steps", "2",
                        "--ema_decay", "0.99", "--skip_nonfinite"])
    assert state.ema_params is not None
    assert int(state.step) == 2

    state = train.main(["--model", "realnvp", "--loss", "reverse_kld",
                        "--iters", "2", "--num_layers", "2",
                        "--hidden", "16", "--num_samples", "64",
                        "--accum_steps", "2", "--ema_decay", "0.99"])
    assert state.ema_params is not None


def test_skip_nonfinite_discards_bad_update():
    """A NaN-producing batch must leave params/opt_state/EMA untouched but
    still advance the step counter; a clean batch then updates normally."""
    model = make_model(KEY)
    opt = optax.adam(1e-3)
    state, static = init_train_state(model, opt, with_ema=True)
    step = make_forward_kld_step(static, opt, ema_decay=0.9,
                                 skip_nonfinite=True)

    x_bad = dist.TwoMoons().sample(KEY, 32).at[0, 0].set(jnp.nan)
    s1, loss_bad = step(state, x_bad)
    assert not np.isfinite(float(loss_bad))  # loss still reported
    assert int(s1.step) == 1                 # counter advanced
    assert _max_leaf_diff(s1.params, state.params) == 0.0
    assert _max_leaf_diff(s1.ema_params, state.ema_params) == 0.0
    assert _max_leaf_diff(s1.opt_state, state.opt_state) == 0.0

    x_ok = dist.TwoMoons().sample(KEY, 32)
    s2, loss_ok = step(s1, x_ok)
    assert np.isfinite(float(loss_ok))
    assert int(s2.step) == 2
    assert _max_leaf_diff(s2.params, s1.params) > 0


def test_skip_nonfinite_reverse_kld_clean_path_unchanged():
    """With finite losses the guard is a no-op: guarded and unguarded steps
    produce identical states on the VI path."""
    mesh = make_mesh()
    model = make_model(KEY)
    opt = optax.adam(1e-3)
    state, static = init_train_state(model, opt)
    state2 = jax.tree_util.tree_map(jnp.array, state)
    s_plain = make_reverse_kld_step(static, opt, mesh, num_samples=64)
    s_guard = make_reverse_kld_step(static, opt, mesh, num_samples=64,
                                    skip_nonfinite=True)
    key = jax.random.PRNGKey(11)
    st1, l1 = s_plain(state, key)
    st2, l2 = s_guard(state2, key)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)
    assert _max_leaf_diff(st1.params, st2.params) == 0.0
    assert int(st2.step) == 1


def test_reshape_for_accum_validates():
    x = jnp.zeros((10, 2))
    try:
        reshape_for_accum(x, 3)
    except ValueError as e:
        assert "divisible" in str(e)
    else:
        raise AssertionError("expected ValueError on indivisible batch")


def test_skip_nonfinite_with_grad_accum():
    """A NaN in ANY microbatch poisons the accumulated mean, so the guard
    must skip the whole update."""
    model = make_model(KEY)
    opt = optax.adam(1e-3)
    state, static = init_train_state(model, opt)
    step = make_forward_kld_step(static, opt, accum_steps=2,
                                 skip_nonfinite=True)
    x = dist.TwoMoons().sample(KEY, 32)
    xa = reshape_for_accum(x.at[20, 1].set(jnp.inf), 2)  # 2nd microbatch
    s1, loss = step(state, xa)
    assert not np.isfinite(float(loss))
    assert int(s1.step) == 1
    assert _max_leaf_diff(s1.params, state.params) == 0.0
