"""Metropolis-Hastings proposals (reference
``normflows/distributions/mh_proposal.py``)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.module import Module, buffer_field, static_field

_LOG2PI = float(np.log(2 * np.pi))


class MHProposal(Module):
    """Proposal API: ``propose(key, z) -> (z', log p(z|z') - log p(z'|z))``
    (reference ``mh_proposal.py:6-44``)."""

    def sample(self, key, z):
        raise NotImplementedError

    def log_prob(self, z_, z):
        raise NotImplementedError

    def propose(self, key, z):
        raise NotImplementedError


class DiagGaussianProposal(MHProposal):
    """Symmetric Gaussian random-walk proposal
    (reference ``mh_proposal.py:47-83``)."""

    scale: jax.Array = buffer_field(default=None)
    shape: tuple = static_field(default=())

    @classmethod
    def create(cls, shape, scale, dtype=jnp.float32):
        if isinstance(shape, int):
            shape = (shape,)
        return cls(scale=jnp.asarray(scale, dtype)[None],
                   shape=tuple(shape))

    def sample(self, key, z):
        eps = jax.random.normal(key, (z.shape[0],) + self.shape, z.dtype)
        return eps * self.scale + z

    def log_prob(self, z_, z):
        d = int(np.prod(self.shape))
        return -0.5 * d * _LOG2PI - jnp.sum(
            jnp.log(self.scale) + 0.5 * ((z_ - z) / self.scale) ** 2,
            axis=tuple(range(1, z.ndim)))

    def propose(self, key, z):
        z_ = self.sample(key, z)
        log_p_diff = jnp.zeros(z.shape[0], z.dtype)  # symmetric proposal
        return z_, log_p_diff
