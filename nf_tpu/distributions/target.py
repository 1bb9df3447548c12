"""Analytic 2D target densities and rejection sampling
(reference ``normflows/distributions/target.py``).

The reference's rejection sampler grows a python list until enough samples are
accepted (``target.py:44-73``) — dynamic shapes.  Here sampling runs a
``lax.while_loop`` over fixed-size proposal batches with masked scatter into a
static output buffer, so the whole sampler jit-compiles on TPU.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.module import Module, static_field

_LOG2PI = float(np.log(2 * np.pi))


def rejection_sample(log_prob_fn, key, num_samples, n_dims, prop_scale=6.0,
                     prop_shift=-3.0, max_log_prob=0.0, dtype=jnp.float32):
    """Jit-friendly uniform-proposal rejection sampler (static shapes)."""

    def cond(state):
        _, _, count = state
        return count < num_samples

    def body(state):
        key, buf, count = state
        key, k1, k2 = jax.random.split(key, 3)
        eps = jax.random.uniform(k1, (num_samples, n_dims), dtype)
        z_ = prop_scale * eps + prop_shift
        prob = jax.random.uniform(k2, (num_samples,), dtype)
        accept = jnp.exp(log_prob_fn(z_) - max_log_prob) > prob
        # target slot for each accepted sample; rejected -> out of range (drop)
        slots = jnp.where(accept, count + jnp.cumsum(accept) - 1, num_samples)
        buf = buf.at[slots].set(z_, mode="drop")
        count = jnp.minimum(count + jnp.sum(accept), num_samples)
        return key, buf, count

    buf = jnp.zeros((num_samples, n_dims), dtype)
    _, buf, _ = jax.lax.while_loop(cond, body, (key, buf, jnp.asarray(0)))
    return buf


class Target(Module):
    """Abstract 2D test target with rejection sampling
    (reference ``target.py:8-73``)."""

    prop_scale: float = static_field(default=6.0)
    prop_shift: float = static_field(default=-3.0)
    n_dims: int = static_field(default=2)
    max_log_prob: float = static_field(default=0.0)

    def log_prob(self, z, context=None):
        raise NotImplementedError("The log probability is not implemented yet.")

    def sample(self, key, num_samples=1, context=None):
        return rejection_sample(self.log_prob, key, num_samples, self.n_dims,
                                self.prop_scale, self.prop_shift,
                                self.max_log_prob)


class TwoMoons(Target):
    """Bimodal two-moons density (reference ``target.py:100-132``)."""

    def log_prob(self, z, context=None):
        a = jnp.abs(z[:, 0])
        norm = jnp.sqrt(jnp.sum(z**2, axis=1))
        return (-0.5 * ((norm - 2) / 0.2) ** 2
                - 0.5 * ((a - 2) / 0.3) ** 2
                + jnp.log1p(jnp.exp(-4 * a / 0.09)))


class CircularGaussianMixture(Module):
    """2D Gaussian mixture on a circle (reference ``target.py:135-175``)."""

    n_modes: int = static_field(default=8)

    @property
    def scale(self):
        return float(2 / 3 * np.sin(np.pi / self.n_modes))

    def log_prob(self, z, context=None):
        idx = np.arange(self.n_modes)
        locs = np.stack([2 * np.sin(2 * np.pi / self.n_modes * idx),
                         2 * np.cos(2 * np.pi / self.n_modes * idx)], axis=1)
        locs = jnp.asarray(locs, z.dtype)
        d = jnp.sum((z[:, None, :] - locs) ** 2, axis=2) / (2 * self.scale**2)
        return (-jnp.log(2 * np.pi * self.scale**2 * self.n_modes)
                + jax.scipy.special.logsumexp(-d, axis=1))

    def sample(self, key, num_samples=1, context=None):
        k_eps, k_phi = jax.random.split(key)
        eps = jax.random.normal(k_eps, (num_samples, 2))
        phi = (2 * np.pi / self.n_modes
               * jax.random.randint(k_phi, (num_samples,), 0, self.n_modes))
        loc = jnp.stack([2 * jnp.sin(phi), 2 * jnp.cos(phi)], axis=1)
        return eps * self.scale + loc


class RingMixture(Target):
    """Mixture of concentric rings (reference ``target.py:178-196``)."""

    n_rings: int = static_field(default=2)

    @property
    def ring_scale(self):
        return 1 / 4 / self.n_rings

    def log_prob(self, z, context=None):
        norm = jnp.sqrt(jnp.sum(z**2, axis=1))
        radii = jnp.asarray(
            [2 / self.n_rings * (i + 1) for i in range(self.n_rings)], z.dtype)
        d = ((norm[:, None] - radii) ** 2) / (2 * self.ring_scale**2)
        return jax.scipy.special.logsumexp(-d, axis=1)


class TwoIndependent(Target):
    """Product of two independent equal-size targets — for augmented flows
    (reference ``target.py:76-97``)."""

    target1: Any = None
    target2: Any = None

    def log_prob(self, z, context=None):
        z1, z2 = jnp.split(z, 2, axis=1)
        return self.target1.log_prob(z1) + self.target2.log_prob(z2)

    def sample(self, key, num_samples=1, context=None):
        k1, k2 = jax.random.split(key)
        z1 = self.target1.sample(k1, num_samples)
        z2 = self.target2.sample(k2, num_samples)
        return jnp.concatenate([z1, z2], axis=1)


class ConditionalDiagGaussian(Target):
    """Gaussian target conditioned on context = [mean, std]
    (reference ``target.py:199-225``)."""

    def log_prob(self, z, context=None):
        d = z.shape[-1]
        loc = context[:, :d]
        scale = context[:, d:]
        return -0.5 * d * _LOG2PI - jnp.sum(
            jnp.log(scale) + 0.5 * ((z - loc) / scale) ** 2, axis=-1)

    def sample(self, key, num_samples=1, context=None):
        d = context.shape[-1] // 2
        loc = context[:, :d]
        scale = context[:, d:]
        eps = jax.random.normal(key, (num_samples, d), context.dtype)
        return loc + scale * eps
