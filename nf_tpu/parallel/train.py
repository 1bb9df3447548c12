"""Sharded training steps.

Two strategies matching the two loss families (SURVEY §3.1/§3.2):

* :func:`make_forward_kld_step` — **data parallelism** for maximum-likelihood
  training: the batch shards over the ``data`` axis, parameters replicate,
  and the SPMD partitioner inserts the psum for the mean loss and the grad
  all-reduce (the TPU-native replacement for a DDP wrapper).
* :func:`make_reverse_kld_step` — **sample parallelism** for variational
  inference: each device draws its own slice of the Monte-Carlo sample batch
  from a per-device folded key inside ``shard_map``, computes local
  loss/grads, and explicitly ``psum``s them over ICI.  RNG stays
  counter-based and reproducible regardless of device count.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..utils.module import (
    Module,
    combine,
    partition,
    partition_arrays,
)
from .mesh import data_sharding, replicated


class TrainState(Module):
    """Replicated training state: trainable params + optimizer state + step.

    ``buffers`` (None unless ``init_train_state(carry_buffers=True)``) holds
    the model's non-trainable array state so in-step updates to it
    (spectral-norm power iteration, ...) persist; otherwise buffers live in
    the baked ``static`` closure of the step function.

    ``ema_params`` (None unless ``init_train_state(with_ema=True)``) is an
    exponential moving average of ``params``, updated inside the step when
    the step factory gets ``ema_decay``; evaluate with :func:`ema_model`.
    The reference has no EMA story — this is standard Glow/large-image
    practice added for production training.
    """

    params: Any
    opt_state: Any
    step: jax.Array
    buffers: Any = None
    ema_params: Any = None

    @classmethod
    def create(cls, params, optimizer, buffers=None, with_ema=False):
        return cls(params=params, opt_state=optimizer.init(params),
                   step=jnp.zeros((), jnp.int32), buffers=buffers,
                   ema_params=params if with_ema else None)


def init_train_state(model, optimizer, carry_buffers=False, with_ema=False):
    """Split ``model`` into (TrainState, static); reunite with
    :func:`model_of_state`.

    ``carry_buffers=True`` threads the buffer arrays through the TrainState
    (required when the step mutates them, e.g. ``post_update=
    update_lipschitz``); the returned ``static`` then holds config only.

    ``with_ema=True`` adds an EMA copy of the params to the state (updated
    by step factories built with ``ema_decay=...``).
    """
    params, static = partition(model)
    if carry_buffers:
        buffers, config = partition_arrays(static)
        return (TrainState.create(params, optimizer, buffers=buffers,
                                  with_ema=with_ema), config)
    return TrainState.create(params, optimizer, with_ema=with_ema), static


def model_of_state(state: TrainState, static):
    """Rebuild the model from a TrainState and its static remainder."""
    if state.buffers is not None:
        return combine(combine(state.params, state.buffers), static)
    return combine(state.params, static)


def ema_model(state: TrainState, static):
    """Rebuild the model from the EMA parameters (eval/serving weights)."""
    if state.ema_params is None:
        raise ValueError("state has no EMA params: build it with "
                         "init_train_state(..., with_ema=True) and a step "
                         "factory with ema_decay set")
    return model_of_state(state.replace(params=state.ema_params), static)


def _ema_update(ema, params, decay):
    """ema <- decay * ema + (1 - decay) * params, leaf-wise."""
    return jax.tree_util.tree_map(
        lambda e, p: e + (1.0 - decay) * (p - e), ema, params)


def _all_finite(loss, grads):
    """Scalar bool: loss and every gradient leaf are finite."""
    ok = jnp.isfinite(loss)
    for g in jax.tree_util.tree_leaves(grads):
        ok = ok & jnp.all(jnp.isfinite(g))
    return ok


def _guard_nonfinite(ok, new_state: TrainState, old_state: TrainState):
    """Select ``new_state`` where ``ok`` else the pre-update state.

    The step counter still advances so schedules keyed on it stay monotone.
    In-jit replacement for the reference notebooks' host-side
    ``if ~(torch.isnan(loss) | torch.isinf(loss)): loss.backward()`` guard
    (ref examples/glow.ipynb training cell): under jit we always compute,
    then discard the update when loss or grads are non-finite.
    """
    skipped = old_state.replace(step=old_state.step + 1)
    return jax.tree_util.tree_map(
        lambda n, o: jnp.where(ok, n, o), new_state, skipped)


def _maybe_ema(state: TrainState, params, ema_decay):
    if ema_decay is None:
        return state.ema_params
    if state.ema_params is None:
        raise ValueError("ema_decay set but the state has no EMA slot: "
                         "build it with init_train_state(..., "
                         "with_ema=True)")
    return _ema_update(state.ema_params, params, ema_decay)


def reshape_for_accum(batch, accum_steps: int):
    """Host/device reshape ``(B, ...) -> (accum_steps, B // accum_steps,
    ...)`` for gradient accumulation. Shard the result with
    ``shard_batch(mesh, batch, accum=True)`` (microbatch dim sharded) so no
    resharding happens inside the step."""
    def r(x):
        b = x.shape[0]
        if b % accum_steps:
            raise ValueError(f"batch {b} not divisible by accum_steps "
                             f"{accum_steps}")
        return x.reshape((accum_steps, b // accum_steps) + x.shape[1:])

    return jax.tree_util.tree_map(r, batch)


def apply_post_update(params, buffers, config, post_update):
    """Run ``post_update`` on the rebuilt model and re-split, preserving its
    buffer updates. This is THE fragile invariant (CLAUDE.md): re-splitting
    with plain ``partition`` against a stale static closure silently
    discards buffer mutations, so every step builder and training loop must
    go through this one helper."""
    model = post_update(combine(combine(params, buffers), config))
    params, rest = partition(model)
    buffers, _ = partition_arrays(rest)
    return params, buffers


def shard_batch(mesh: Mesh, batch, accum: bool = False):
    """Device-put a host batch with its batch axis sharded over ``data``.

    ``accum=True``: the batch is microbatched ``(accum_steps, micro, ...)``
    (see :func:`reshape_for_accum`) and the *micro* dim (1) is sharded, so
    each device scans over its local microbatch slices with no collective
    resharding."""
    dim = 1 if accum else 0
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, data_sharding(mesh, x.ndim, dim=dim)),
        batch)


def make_forward_kld_step(static, optimizer, mesh: Optional[Mesh] = None,
                          loss_fn: Optional[Callable] = None,
                          donate: bool = False, state_shardings=None,
                          with_key: bool = False, post_update=None,
                          accum_steps: int = 1,
                          ema_decay: Optional[float] = None,
                          skip_nonfinite: bool = False):
    """Build a jitted data-parallel MLE step.

    ``loss_fn(model, batch) -> scalar`` defaults to ``model.forward_kld(x)``
    with ``batch`` either an array ``x`` or a ``(x, y)`` tuple (class-
    conditional models).  Returns ``step(state, batch) -> (state, loss)``.

    ``with_key=True``: the step takes ``(state, batch, key)`` and the loss
    is ``loss_fn(model, batch, key)`` / ``model.forward_kld(x, key=key)`` —
    required for models with stochastic log-det estimators (residual
    flows), which refuse to run keyless.

    ``post_update(model) -> model`` runs inside the step after the
    optimizer update (e.g. ``update_lipschitz`` for residual flows).

    ``state_shardings``: optional pytree of ``NamedSharding`` for the
    ``TrainState`` (see ``parallel.tp.param_shardings``) — enables
    tensor-parallel / FSDP-style parameter layouts on top of the
    data-parallel batch; the SPMD partitioner inserts the collectives.

    ``accum_steps > 1``: gradient accumulation (microbatching) — the batch
    must arrive pre-shaped ``(accum_steps, micro, ...)`` (use
    :func:`reshape_for_accum`, and ``shard_batch(mesh, b, accum=True)`` so
    the micro dim is the sharded one); a ``lax.scan`` accumulates the mean
    loss/grads over microbatches before ONE optimizer update — peak
    activation memory drops by ~accum_steps at identical semantics (the
    loss is a batch mean, so the mean of equal-size microbatch grads is
    exactly the full-batch grad).

    ``ema_decay``: update ``state.ema_params`` (requires
    ``init_train_state(..., with_ema=True)``) after each optimizer step.

    ``skip_nonfinite=True``: when the loss or any gradient leaf is
    non-finite, the whole update (params, opt state, buffers, EMA) is
    discarded and only the step counter advances — the jit-compatible form
    of the reference notebooks' NaN guard before ``backward()``.
    The (non-finite) loss is still returned for host-side logging.
    """
    if loss_fn is None:
        def loss_fn(model, batch, key=None):
            kw = {"key": key} if key is not None else {}
            if isinstance(batch, (tuple, list)):
                return model.forward_kld(*batch, **kw)
            return model.forward_kld(batch, **kw)
    else:
        user_loss = loss_fn

        def loss_fn(model, batch, key=None):
            if key is not None:
                return user_loss(model, batch, key)
            return user_loss(model, batch)

    def step(state: TrainState, batch, key=None):
        def compute(p, mb, k):
            model = model_of_state(state.replace(params=p), static)
            return loss_fn(model, mb, k)

        if accum_steps > 1:
            def micro(carry, inp):
                mb, k_idx = inp
                k = (jax.random.fold_in(key, k_idx)
                     if key is not None else None)
                loss, grads = jax.value_and_grad(compute)(
                    state.params, mb, k)
                acc_loss, acc_grads = carry
                return (acc_loss + loss,
                        jax.tree_util.tree_map(jnp.add, acc_grads,
                                               grads)), None

            zero_grads = jax.tree_util.tree_map(jnp.zeros_like, state.params)
            (loss, grads), _ = jax.lax.scan(
                micro, (jnp.zeros((), jnp.float32), zero_grads),
                (batch, jnp.arange(accum_steps)))
            inv = 1.0 / accum_steps
            loss = loss * inv
            grads = jax.tree_util.tree_map(lambda g: g * inv, grads)
        else:
            loss, grads = jax.value_and_grad(compute)(state.params, batch,
                                                      key)
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        params = _apply_updates(state.params, updates)
        buffers = state.buffers
        if post_update is not None:
            if buffers is None:
                raise ValueError(
                    "post_update mutates buffer state: build the state with "
                    "init_train_state(..., carry_buffers=True) so the "
                    "updates persist instead of being dropped with the "
                    "static closure.")
            params, buffers = apply_post_update(params, buffers, static,
                                                post_update)
        new_state = TrainState(params=params, opt_state=opt_state,
                               step=state.step + 1, buffers=buffers,
                               ema_params=_maybe_ema(state, params,
                                                     ema_decay))
        if skip_nonfinite:
            new_state = _guard_nonfinite(_all_finite(loss, grads),
                                         new_state, state)
        return new_state, loss

    donate_kw = {"donate_argnums": (0,)} if donate else {}
    if mesh is None:
        jitted = jax.jit(step, **donate_kw)
    else:
        repl = replicated(mesh)
        state_sh = (state_shardings if state_shardings is not None
                    else repl)
        # non-accum: shard the leading batch dim (rank-1 spec applies to
        # any-rank leaves); accum: shard the micro dim of (accum, micro,...)
        batch_sh = (data_sharding(mesh, 2, dim=1) if accum_steps > 1
                    else data_sharding(mesh, 1))
        in_sh = (state_sh, batch_sh) + ((repl,) if with_key else ())
        jitted = jax.jit(step, in_shardings=in_sh,
                         out_shardings=(state_sh, repl), **donate_kw)
    if with_key:
        return jitted
    return lambda state, batch: jitted(state, batch)


def _apply_updates(params, updates):
    import optax

    return optax.apply_updates(params, updates)


def make_reverse_kld_step(static, optimizer, mesh: Mesh,
                          num_samples: int, beta_schedule=None,
                          score_fn=True, axis: str = "data",
                          donate: bool = False, post_update=None,
                          accum_steps: int = 1,
                          ema_decay: Optional[float] = None,
                          skip_nonfinite: bool = False):
    """Build a jitted sample-parallel VI step with explicit collectives.

    Each device draws ``num_samples // n_devices`` samples from a key folded
    with its mesh position, computes the local reverse KLD and its grads,
    and psums both over the ``data`` axis.  ``beta_schedule(step) -> beta``
    enables the reference's annealing (``core.py:104``).

    ``post_update(model) -> model`` runs inside the step after the optimizer
    update (e.g. ``update_lipschitz`` for residual flows — whose inverse is
    reverse-mode differentiable here via the implicit-diff fixed point);
    requires ``init_train_state(..., carry_buffers=True)``.

    ``accum_steps > 1``: the per-device sample batch is drawn over
    ``accum_steps`` sequential microdraws of ``num_samples / (n_devices *
    accum_steps)`` samples each (distinct folded keys), with loss/grads
    averaged before the single optimizer update — same total sample count
    per step at ~1/accum_steps the activation memory.

    ``ema_decay``: update ``state.ema_params`` (requires
    ``init_train_state(..., with_ema=True)``) after each optimizer step.

    ``skip_nonfinite=True``: discard the update (keep the pre-step params /
    opt state / buffers / EMA, advance only the step counter) when the loss
    or any gradient leaf is non-finite — reverse-KLD VI is the loss family
    where the reference's notebooks apply exactly this guard.

    Returns ``step(state, key) -> (state, loss)``.
    """
    n_dev = mesh.shape[axis]
    if num_samples % (n_dev * accum_steps) != 0:
        raise ValueError(f"num_samples {num_samples} must divide over "
                         f"{n_dev} devices x {accum_steps} accum steps")
    local_samples = num_samples // (n_dev * accum_steps)
    if beta_schedule is None:
        beta_schedule = lambda step: 1.0

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(), P(), P(), P()),  # everything replicated; RNG folded
        out_specs=(P(), P()),
    )
    def sharded_grads(params, buffers, key, beta):
        idx = jax.lax.axis_index(axis)
        local_key = jax.random.fold_in(key, idx)

        def compute(p, k):
            model = combine(p, static) if buffers is None \
                else combine(combine(p, buffers), static)
            return model.reverse_kld(k, num_samples=local_samples,
                                     beta=beta, score_fn=score_fn)

        if accum_steps > 1:
            def micro(carry, k_idx):
                loss, grads = jax.value_and_grad(compute)(
                    params, jax.random.fold_in(local_key, k_idx))
                acc_loss, acc_grads = carry
                return (acc_loss + loss,
                        jax.tree_util.tree_map(jnp.add, acc_grads,
                                               grads)), None

            # Seed the carry with microdraw 0 (not replicated zeros, which
            # would trip the shard_map vma checker: the draws are
            # device-varying) and scan the remaining accum_steps - 1.
            carry0 = jax.value_and_grad(compute)(
                params, jax.random.fold_in(local_key, 0))
            (loss, grads), _ = jax.lax.scan(
                micro, carry0, jnp.arange(1, accum_steps))
            inv = 1.0 / accum_steps
            loss = loss * inv
            grads = jax.tree_util.tree_map(lambda g: g * inv, grads)
        else:
            loss, grads = jax.value_and_grad(compute)(params, local_key)
        loss = jax.lax.pmean(loss, axis)
        grads = jax.lax.pmean(grads, axis)
        return loss, grads

    def step(state: TrainState, key):
        beta = beta_schedule(state.step)
        loss, grads = sharded_grads(state.params, state.buffers, key, beta)
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        params = _apply_updates(state.params, updates)
        buffers = state.buffers
        if post_update is not None:
            if buffers is None:
                raise ValueError(
                    "post_update mutates buffer state: build the state with "
                    "init_train_state(..., carry_buffers=True) so the "
                    "updates persist instead of being dropped with the "
                    "static closure.")
            params, buffers = apply_post_update(params, buffers, static,
                                                post_update)
        new_state = TrainState(params=params, opt_state=opt_state,
                               step=state.step + 1, buffers=buffers,
                               ema_params=_maybe_ema(state, params,
                                                     ema_decay))
        if skip_nonfinite:
            new_state = _guard_nonfinite(_all_finite(loss, grads),
                                         new_state, state)
        return new_state, loss

    donate_kw = {"donate_argnums": (0,)} if donate else {}
    repl = replicated(mesh)
    return jax.jit(step, in_shardings=(repl, repl),
                   out_shardings=(repl, repl), **donate_kw)
