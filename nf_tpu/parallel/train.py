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
    """

    params: Any
    opt_state: Any
    step: jax.Array
    buffers: Any = None

    @classmethod
    def create(cls, params, optimizer, buffers=None):
        return cls(params=params, opt_state=optimizer.init(params),
                   step=jnp.zeros((), jnp.int32), buffers=buffers)


def init_train_state(model, optimizer, carry_buffers=False):
    """Split ``model`` into (TrainState, static); reunite with
    :func:`model_of_state`.

    ``carry_buffers=True`` threads the buffer arrays through the TrainState
    (required when the step mutates them, e.g. ``post_update=
    update_lipschitz``); the returned ``static`` then holds config only.
    """
    params, static = partition(model)
    if carry_buffers:
        buffers, config = partition_arrays(static)
        return TrainState.create(params, optimizer, buffers=buffers), config
    return TrainState.create(params, optimizer), static


def model_of_state(state: TrainState, static):
    """Rebuild the model from a TrainState and its static remainder."""
    if state.buffers is not None:
        return combine(combine(state.params, state.buffers), static)
    return combine(state.params, static)


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


def shard_batch(mesh: Mesh, batch):
    """Device-put a host batch with its leading axis sharded over ``data``."""
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, data_sharding(mesh, x.ndim)), batch)


def make_forward_kld_step(static, optimizer, mesh: Optional[Mesh] = None,
                          loss_fn: Optional[Callable] = None,
                          donate: bool = False, state_shardings=None,
                          with_key: bool = False, post_update=None):
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
        def compute(p):
            model = model_of_state(state.replace(params=p), static)
            return loss_fn(model, batch, key)

        loss, grads = jax.value_and_grad(compute)(state.params)
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
        return TrainState(params=params, opt_state=opt_state,
                          step=state.step + 1, buffers=buffers), loss

    donate_kw = {"donate_argnums": (0,)} if donate else {}
    if mesh is None:
        jitted = jax.jit(step, **donate_kw)
    else:
        repl = replicated(mesh)
        state_sh = (state_shardings if state_shardings is not None
                    else repl)
        in_sh = (state_sh, data_sharding(mesh, 1)) + (
            (repl,) if with_key else ())
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
                          donate: bool = False, post_update=None):
    """Build a jitted sample-parallel VI step with explicit collectives.

    Each device draws ``num_samples // n_devices`` samples from a key folded
    with its mesh position, computes the local reverse KLD and its grads,
    and psums both over the ``data`` axis.  ``beta_schedule(step) -> beta``
    enables the reference's annealing (``core.py:104``).

    ``post_update(model) -> model`` runs inside the step after the optimizer
    update (e.g. ``update_lipschitz`` for residual flows — whose inverse is
    reverse-mode differentiable here via the implicit-diff fixed point);
    requires ``init_train_state(..., carry_buffers=True)``.

    Returns ``step(state, key) -> (state, loss)``.
    """
    n_dev = mesh.shape[axis]
    if num_samples % n_dev != 0:
        raise ValueError(f"num_samples {num_samples} must divide over "
                         f"{n_dev} devices")
    local_samples = num_samples // n_dev
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

        def compute(p):
            model = combine(p, static) if buffers is None \
                else combine(combine(p, buffers), static)
            return model.reverse_kld(local_key, num_samples=local_samples,
                                     beta=beta, score_fn=score_fn)

        loss, grads = jax.value_and_grad(compute)(params)
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
        return TrainState(params=params, opt_state=opt_state,
                          step=state.step + 1, buffers=buffers), loss

    donate_kw = {"donate_argnums": (0,)} if donate else {}
    repl = replicated(mesh)
    return jax.jit(step, in_shardings=(repl, repl),
                   out_shardings=(repl, repl), **donate_kw)
