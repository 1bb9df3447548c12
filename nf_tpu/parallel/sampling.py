"""Sharded sampling: Monte-Carlo chains distributed over the mesh.

SNF/HAIS chains are independent, so they shard exactly like VI samples
(SURVEY §5 "long-context": the scaling axis of this workload is the
sample/chain dimension): every device folds the key with its mesh position,
runs its local chains, and the outputs concatenate over the ``data`` axis.
Weight reductions (log-Z, ESS) happen with one psum-backed logsumexp.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P


def make_sharded_sampler(mesh: Mesh, num_samples: int, axis: str = "data",
                         with_stats: bool = False):
    """Build ``sample(sampler, key) -> (samples, log_weights)`` where
    ``sampler`` is any pytree with ``.sample(key, n) -> (z, log_w)``
    (``HAIS``, ``NormalizingFlow``, a base distribution...).

    Chains/samples split evenly over ``axis``; outputs are globally-shaped
    arrays sharded on their leading dimension. RNG is counter-based and
    reproducible for a fixed device count.

    ``with_stats=True``: the sampler must expose ``.sample_with_stats(key,
    n) -> (z, log_w, acceptance)`` (``HAIS``; MCMC layers via their model's
    ``sample_with_mcmc_stats``) and the returned function yields
    ``(samples, log_weights, acceptance)`` with the per-layer/per-step
    acceptance rates **pmean'd over the mesh axis** — the psum'd MCMC
    acceptance collective of SURVEY §2.6 (each device's rate is a mean over
    its equal-size local chain batch, so the pmean IS the global rate).
    """
    n_dev = mesh.shape[axis]
    if num_samples % n_dev != 0:
        raise ValueError(f"num_samples {num_samples} must divide over "
                         f"{n_dev} devices")
    local = num_samples // n_dev

    if with_stats:
        @jax.jit
        @functools.partial(
            shard_map, mesh=mesh, in_specs=(P(), P()),
            out_specs=(P(axis), P(axis), P()))
        def sample(sampler, key):
            idx = jax.lax.axis_index(axis)
            z, log_w, acc = sampler.sample_with_stats(
                jax.random.fold_in(key, idx), local)
            acc = jax.tree_util.tree_map(
                lambda a: jax.lax.pmean(a, axis), acc)
            return z, log_w, acc

        return sample

    @jax.jit
    @functools.partial(
        shard_map, mesh=mesh, in_specs=(P(), P()),
        out_specs=(P(axis), P(axis)))
    def sample(sampler, key):
        idx = jax.lax.axis_index(axis)
        z, log_w = sampler.sample(jax.random.fold_in(key, idx), local)
        return z, log_w

    return sample


def log_normalizer(log_weights):
    """log Z estimate from importance log-weights (works on sharded
    arrays: logsumexp lowers to a psum-backed reduction)."""
    n = log_weights.shape[0]
    return jax.nn.logsumexp(log_weights) - jnp.log(n)
