"""Hamiltonian Annealed Importance Sampling
(reference ``normflows/sampling/hais.py:8-49``).

Chains are embarrassingly parallel over the sample dimension — shard
``num_samples`` across the mesh and the per-layer HMC kernels run fully
vectorized on each chip (SURVEY §5 "sample/chain parallelism")."""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..distributions.linear_interpolation import LinearInterpolation
from ..flows.stochastic import HamiltonianMonteCarlo
from ..utils.module import Module


class HAIS(Module):
    """Annealed importance sampling with HMC transitions."""

    prior: Any
    target: Any
    layers: tuple

    @classmethod
    def create(cls, betas, prior, target, num_leapfrog, step_size, log_mass):
        """``betas``: annealing schedule with 1 = beta_0 > ... > beta_n = 0
        (reference ``hais.py:17-35``)."""
        betas = np.asarray(betas)
        layers = []
        n = betas.shape[0] - 1
        for i in range(n - 1, 0, -1):
            intermediate = LinearInterpolation(dist1=target, dist2=prior,
                                               alpha=float(betas[i]))
            layers.append(HamiltonianMonteCarlo.create(
                intermediate, num_leapfrog,
                jnp.log(jnp.asarray(step_size)), jnp.asarray(log_mass)))
        return cls(prior=prior, target=target, layers=tuple(layers))

    def sample_with_stats(self, key, num_samples):
        """Like :meth:`sample`, additionally returning the per-annealing-
        layer HMC acceptance rate, shape ``(n_layers,)`` — first-class MCMC
        observability (the reference computes the accept mask per layer,
        ``stochastic.py:88-96``, but never surfaces it). Under a sharded
        sampler the rates pmean over the mesh
        (:func:`nf_tpu.parallel.sampling.make_sharded_sampler`)."""
        keys = jax.random.split(key, len(self.layers) + 1)
        samples, log_weights = self.prior.forward(keys[0], num_samples)
        log_weights = -log_weights
        acceptance = []
        for layer, k in zip(self.layers, keys[1:]):
            samples, lw_add, acc = layer.forward_with_stats(samples, key=k)
            log_weights = log_weights + lw_add
            acceptance.append(acc)
        log_weights = log_weights + self.target.log_prob(samples)
        acc = (jnp.concatenate(acceptance) if acceptance
               else jnp.zeros((0,), samples.dtype))
        return samples, log_weights, acc

    def sample(self, key, num_samples):
        """Draw weighted samples; returns (samples, log_weights)
        (reference ``hais.py:37-49``)."""
        samples, log_weights, _ = self.sample_with_stats(key, num_samples)
        return samples, log_weights
