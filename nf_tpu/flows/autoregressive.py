"""Autoregressive flows (reference ``normflows/flows/affine/autoregressive.py``).

Forward = one MADE pass; inverse = D sequential MADE passes (the classic MAF
asymmetry, reference ``autoregressive.py:29-38``).  On TPU the inverse runs as
a ``lax.scan`` with static trip count D, so XLA compiles ONE MADE body instead
of unrolling D copies — same math, a fraction of the compile time and code
size (SURVEY §3.4).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.module import static_field
from ..utils.nn import sum_except_batch
from .base import Flow


class Autoregressive(Flow):
    """Elementwise transform whose parameters come from an autoregressive
    net (reference ``autoregressive.py:10-47``)."""

    autoregressive_net: Any

    def _elementwise_forward(self, inputs, autoregressive_params):
        raise NotImplementedError()

    def _elementwise_inverse(self, inputs, autoregressive_params):
        raise NotImplementedError()

    def forward(self, inputs, context=None, key=None):
        autoregressive_params = self.autoregressive_net(inputs, context,
                                                        key=key)
        return self._elementwise_forward(inputs, autoregressive_params)

    def inverse(self, inputs, context=None, key=None):
        num_inputs = int(np.prod(inputs.shape[1:]))

        def body(outputs, _):
            params = self.autoregressive_net(outputs, context, key=key)
            outputs, logabsdet = self._elementwise_inverse(inputs, params)
            return outputs, logabsdet

        outputs0 = jnp.zeros_like(inputs)
        outputs, logabsdets = jax.lax.scan(body, outputs0, None,
                                           length=num_inputs)
        return outputs, logabsdets[-1]


class MaskedAffineAutoregressive(Autoregressive):
    """Masked Affine Autoregressive Flow (MAF, arXiv 1705.07057;
    reference ``autoregressive.py:50-128``).  Scale map
    ``sigmoid(s + 2) + 1e-3``."""

    features: int = static_field(default=0)

    @classmethod
    def create(cls, key, features, hidden_features, context_features=None,
               num_blocks=2, use_residual_blocks=True, random_mask=False,
               activation=jax.nn.relu, dropout_probability=0.0,
               use_batch_norm=False, mixed_precision=False,
               bin_major_head=True, dtype=jnp.float32):
        from ..nets.made import MADE
        from ..nets.precision import MixedPrecision

        made = MADE.create(
            key, features=features, hidden_features=hidden_features,
            context_features=context_features, num_blocks=num_blocks,
            output_multiplier=2, use_residual_blocks=use_residual_blocks,
            random_mask=random_mask, activation=activation,
            dropout_probability=dropout_probability,
            use_batch_norm=use_batch_norm,
            bin_major_head=bin_major_head, dtype=dtype)
        if mixed_precision:
            made = MixedPrecision(net=made)
        return cls(autoregressive_net=made, features=features)

    def _bin_major(self):
        return getattr(self.autoregressive_net, "bin_major_head", None) \
            is not None

    def _scale_shift(self, autoregressive_params):
        if self._bin_major():
            # head emits (2*D, B) with rows param-major: scale/shift are
            # contiguous (D, B) planes instead of stride-2 slices of the
            # feature-major layout; callers transpose data to match
            p = autoregressive_params.reshape(2, self.features, -1)
            unconstrained_scale, shift = p[0], p[1]
        else:
            p = autoregressive_params.reshape(-1, self.features, 2)
            unconstrained_scale, shift = p[..., 0], p[..., 1]
        scale = jax.nn.sigmoid(unconstrained_scale + 2.0) + 1e-3
        return scale, shift

    def _elementwise_forward(self, inputs, autoregressive_params):
        scale, shift = self._scale_shift(autoregressive_params)
        if self._bin_major():
            outputs = (scale * inputs.T + shift).T
            return outputs, jnp.sum(jnp.log(scale), axis=0)
        outputs = scale * inputs + shift
        return outputs, sum_except_batch(jnp.log(scale))

    def _elementwise_inverse(self, inputs, autoregressive_params):
        scale, shift = self._scale_shift(autoregressive_params)
        if self._bin_major():
            outputs = ((inputs.T - shift) / scale).T
            return outputs, -jnp.sum(jnp.log(scale), axis=0)
        outputs = (inputs - shift) / scale
        return outputs, -sum_except_batch(jnp.log(scale))
