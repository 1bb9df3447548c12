"""VAE decoders / likelihoods (reference ``normflows/distributions/decoder.py``)."""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.module import Module

_LOG2PI = float(np.log(2 * np.pi))


def _tile_x_to_z(x, z):
    """Repeat x along a sample axis to match a flattened z batch
    (reference ``decoder.py:63-67``)."""
    if z.shape[0] > x.shape[0]:
        reps = z.shape[0] // x.shape[0]
        x = jnp.repeat(x[:, None], reps, axis=1)
        x = x.reshape((-1,) + x.shape[2:])
    return x


class BaseDecoder(Module):
    """Abstract decoder p(x|z) (reference ``decoder.py:6-31``)."""

    def forward(self, z):
        raise NotImplementedError

    def log_prob(self, x, z):
        raise NotImplementedError


class NNDiagGaussianDecoder(BaseDecoder):
    """Diagonal Gaussian likelihood with NN mean/log-var
    (reference ``decoder.py:34-73``)."""

    net: Any

    def forward(self, z):
        mean_std = self.net(z)
        n_hidden = mean_std.shape[1] // 2
        mean = mean_std[:, :n_hidden]
        std = jnp.exp(0.5 * mean_std[:, n_hidden:])
        return mean, std

    def log_prob(self, x, z):
        mean_std = self.net(z)
        n_hidden = mean_std.shape[1] // 2
        mean = mean_std[:, :n_hidden]
        var = jnp.exp(mean_std[:, n_hidden:])
        x = _tile_x_to_z(x, z)
        # normalizer uses the DATA dimensionality (the reference uses the
        # latent z's, ``decoder.py:65-67`` — deliberate fix: a d_x-dim
        # Gaussian needs -d_x/2 log(2 pi))
        d = int(np.prod(mean.shape[1:]))
        return -0.5 * d * _LOG2PI - 0.5 * jnp.sum(
            jnp.log(var) + (x - mean) ** 2 / var,
            axis=tuple(range(1, x.ndim)))


class NNBernoulliDecoder(BaseDecoder):
    """Bernoulli likelihood with NN logits and numerically stable log-sigmoid
    (reference ``decoder.py:76-102``)."""

    net: Any

    def forward(self, z):
        return jax.nn.sigmoid(self.net(z))

    def log_prob(self, x, z):
        score = self.net(z)
        x = _tile_x_to_z(x, z)
        log_sig = jax.nn.log_sigmoid
        return jnp.sum(x * log_sig(score) + (1 - x) * log_sig(-score),
                       axis=tuple(range(1, x.ndim)))
