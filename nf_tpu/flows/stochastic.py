"""Stochastic normalizing-flow layers: MCMC transitions as flow layers
(reference ``normflows/flows/stochastic.py``, arXiv 2002.06707).

These layers break the deterministic-bijection contract (inverse == forward)
and consume an RNG ``key``.  The MCMC step loops run as ``lax.scan`` with the
per-sample accept/reject logic fully vectorized — on TPU every chain in the
batch advances in lockstep with dense ``where`` selects.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp

from ..utils.module import static_field
from .base import Flow


class MetropolisHastings(Flow):
    """``steps`` MH iterations targeting ``target`` with ``proposal``
    (reference ``stochastic.py:6-49``).  log_det accumulates
    ``log p(z_old) - log p(z_new)`` over accepted moves."""

    target: Any
    proposal: Any
    steps: int = static_field(default=1)

    @classmethod
    def create(cls, target, proposal, steps):
        return cls(target=target, proposal=proposal, steps=steps)

    def forward_with_stats(self, z, context=None, key=None):
        """Like :meth:`forward`, additionally returning the per-MH-step mean
        acceptance rate over the chain batch, shape ``(steps,)`` — the
        first-class MCMC observability the reference computes but discards
        (its accept mask at ``stochastic.py:41`` is never surfaced). Inside
        a sharded sampler the caller pmeans this over the mesh
        (:func:`nf_tpu.parallel.sampling.make_sharded_sampler`)."""
        if key is None:
            raise ValueError("MetropolisHastings requires an RNG key.")
        num_samples = z.shape[0]
        log_p = self.target.log_prob(z)
        log_det0 = jnp.zeros(num_samples, dtype=z.dtype)

        def body(carry, k):
            z, log_det, log_p = carry
            k_prop, k_acc = jax.random.split(k)
            z_, log_p_diff = self.proposal.propose(k_prop, z)
            log_p_ = self.target.log_prob(z_)
            w = jax.random.uniform(k_acc, (num_samples,), z.dtype)
            log_w_accept = log_p_ - log_p + log_p_diff
            w_accept = jnp.clip(jnp.exp(log_w_accept), max=1.0)
            accept = w <= w_accept
            z = jnp.where(accept[:, None], z_, z)
            log_det = jnp.where(accept, log_det + log_p - log_p_, log_det)
            log_p = jnp.where(accept, log_p_, log_p)
            return (z, log_det, log_p), jnp.mean(accept.astype(z.dtype))

        keys = jax.random.split(key, self.steps)
        (z, log_det, _), acceptance = jax.lax.scan(
            body, (z, log_det0, log_p), keys)
        return z, log_det, acceptance

    def forward(self, z, context=None, key=None):
        z, log_det, _ = self.forward_with_stats(z, context=context, key=key)
        return z, log_det

    def inverse(self, z, context=None, key=None):
        # Equivalent to the forward pass (reference ``stochastic.py:47-49``)
        return self.forward(z, context=context, key=key)


class HamiltonianMonteCarlo(Flow):
    """HMC flow layer with trainable step size and mass
    (reference ``stochastic.py:52-109``)."""

    target: Any
    log_step_size: jax.Array
    log_mass: jax.Array
    steps: int = static_field(default=1)
    max_abs_grad: Optional[float] = static_field(default=None)

    @classmethod
    def create(cls, target, steps, log_step_size, log_mass,
               max_abs_grad=None):
        return cls(target=target, log_step_size=jnp.asarray(log_step_size),
                   log_mass=jnp.asarray(log_mass), steps=steps,
                   max_abs_grad=max_abs_grad)

    def grad_log_p(self, z):
        grad = jax.vmap(jax.grad(lambda zz: self.target.log_prob(zz[None])[0]))(z)
        if self.max_abs_grad:
            grad = jnp.clip(grad, -self.max_abs_grad, self.max_abs_grad)
        return grad

    def forward_with_stats(self, z, context=None, key=None):
        """Like :meth:`forward`, additionally returning the mean acceptance
        rate of the single MH correction over the chain batch, shape
        ``(1,)`` (one entry per MH decision, matching the per-step layout of
        :meth:`MetropolisHastings.forward_with_stats`)."""
        if key is None:
            raise ValueError("HamiltonianMonteCarlo requires an RNG key.")
        k_mom, k_acc = jax.random.split(key)
        p = jax.random.normal(k_mom, z.shape, z.dtype) \
            * jnp.exp(0.5 * self.log_mass)
        step_size = jnp.exp(self.log_step_size)

        def leapfrog(carry, _):
            z_new, p_new = carry
            p_half = p_new - (step_size / 2.0) * -self.grad_log_p(z_new)
            z_new = z_new + step_size * (p_half / jnp.exp(self.log_mass))
            p_new = p_half - (step_size / 2.0) * -self.grad_log_p(z_new)
            return (z_new, p_new), None

        (z_new, p_new), _ = jax.lax.scan(leapfrog, (z, p), None,
                                         length=self.steps)

        probabilities = jnp.exp(
            self.target.log_prob(z_new)
            - self.target.log_prob(z)
            - 0.5 * jnp.sum(p_new**2 / jnp.exp(self.log_mass), axis=1)
            + 0.5 * jnp.sum(p**2 / jnp.exp(self.log_mass), axis=1))
        uniforms = jax.random.uniform(k_acc, probabilities.shape, z.dtype)
        mask = uniforms < probabilities
        z_out = jnp.where(mask[:, None], z_new, z)
        log_det = self.target.log_prob(z) - self.target.log_prob(z_out)
        return z_out, log_det, jnp.mean(mask.astype(z.dtype))[None]

    def forward(self, z, context=None, key=None):
        z, log_det, _ = self.forward_with_stats(z, context=context, key=key)
        return z, log_det

    def inverse(self, z, context=None, key=None):
        return self.forward(z, context=context, key=key)
