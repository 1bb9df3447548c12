"""MADE-conditioned RQ-spline autoregressive flow (reference
``normflows/flows/neural_spline/autoregressive.py``)."""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ...ops import splines
from ...ops import (
    rational_quadratic_spline,
    unconstrained_rational_quadratic_spline,
)
from ...utils.module import buffer_field, static_field
from ...utils.nn import PeriodicFeaturesElementwise, sum_except_batch
from ..autoregressive import Autoregressive


class MaskedPiecewiseRationalQuadraticAutoregressive(Autoregressive):
    """RQ-spline autoregressive transform with circular-coordinate support
    via periodic-feature preprocessing (reference
    ``neural_spline/autoregressive.py:17-134``)."""

    tail_bound_arr: Optional[jax.Array] = buffer_field(default=None)
    features: int = static_field(default=0)
    num_bins: int = static_field(default=10)
    tails: Any = static_field(default=None)
    tail_bound: float = static_field(default=1.0)
    softmax_scale: float = static_field(default=1.0)
    min_bin_width: float = static_field(default=splines.DEFAULT_MIN_BIN_WIDTH)
    min_bin_height: float = static_field(default=splines.DEFAULT_MIN_BIN_HEIGHT)
    min_derivative: float = static_field(default=splines.DEFAULT_MIN_DERIVATIVE)

    @classmethod
    def create(cls, key, features, hidden_features, context_features=None,
               num_bins=10, tails=None, tail_bound=1.0, num_blocks=2,
               use_residual_blocks=True, random_mask=False,
               permute_mask=False, activation=jax.nn.relu,
               dropout_probability=0.0, use_batch_norm=False,
               init_identity=True,
               min_bin_width=splines.DEFAULT_MIN_BIN_WIDTH,
               min_bin_height=splines.DEFAULT_MIN_BIN_HEIGHT,
               min_derivative=splines.DEFAULT_MIN_DERIVATIVE,
               mixed_precision=False, bin_major_head=False,
               dtype=jnp.float32):
        from ...nets.made import MADE
        from ...nets.precision import MixedPrecision

        if tails == "linear":
            mult = num_bins * 3 - 1
        elif tails == "circular":
            mult = num_bins * 3
        elif tails is None:
            mult = num_bins * 3 + 1
        else:
            mult = num_bins * 3 + 1  # per-feature mixed tails

        preprocessing = None
        if isinstance(tails, (list, tuple)):
            ind_circ = [i for i in range(features) if tails[i] == "circular"]
            if np.isscalar(tail_bound):
                scale_pf = np.pi / tail_bound
            else:
                scale_pf = np.pi / np.asarray(tail_bound)[ind_circ]
            preprocessing = PeriodicFeaturesElementwise.create(
                features, ind_circ, scale_pf, dtype=dtype)

        if bin_major_head and not (
                tails in ("linear", "circular")
                or (isinstance(tails, (list, tuple))
                    and set(tails) <= {"linear", "circular"})):
            bin_major_head = False  # unbounded (None) tails: generic feed
        made = MADE.create(
            key, features=features, hidden_features=hidden_features,
            context_features=context_features, num_blocks=num_blocks,
            output_multiplier=mult, use_residual_blocks=use_residual_blocks,
            random_mask=random_mask, permute_mask=permute_mask,
            activation=activation, dropout_probability=dropout_probability,
            use_batch_norm=use_batch_norm, preprocessing=preprocessing,
            bin_major_head=bin_major_head, dtype=dtype)

        if init_identity:
            # identity init of the final MADE layer
            # (reference ``autoregressive.py:72-77``)
            constant = float(np.log(np.exp(1 - min_derivative) - 1))
            final = made.final_layer
            final = final.replace(weight=jnp.zeros_like(final.weight),
                                  bias=jnp.full_like(final.bias, constant))
            made = made.replace(final_layer=final)
        if mixed_precision:
            made = MixedPrecision(net=made)

        tb_arr = None
        if not np.isscalar(tail_bound):
            tb_arr = jnp.asarray(tail_bound, dtype)
            tail_bound = 1.0
        if isinstance(tails, (list, tuple)):
            tails = tuple(tails)
        return cls(autoregressive_net=made, tail_bound_arr=tb_arr,
                   features=features, num_bins=num_bins, tails=tails,
                   tail_bound=float(tail_bound),
                   softmax_scale=1.0 / float(np.sqrt(hidden_features)),
                   min_bin_width=min_bin_width, min_bin_height=min_bin_height,
                   min_derivative=min_derivative)

    def _elementwise(self, inputs, autoregressive_params, inverse=False):
        if getattr(self.autoregressive_net, "bin_major_head", None) \
                is not None:
            return self._elementwise_bin_major(inputs, autoregressive_params,
                                               inverse)
        batch = inputs.shape[0]
        mult = autoregressive_params.shape[-1] // self.features
        p = autoregressive_params.reshape(batch, self.features, mult)
        uw = p[..., : self.num_bins] * self.softmax_scale
        uh = p[..., self.num_bins:2 * self.num_bins] * self.softmax_scale
        ud = p[..., 2 * self.num_bins:]
        tb = self.tail_bound_arr if self.tail_bound_arr is not None \
            else self.tail_bound
        if self.tails is None:
            outputs, logabsdet = rational_quadratic_spline(
                inputs, uw, uh, ud, inverse=inverse,
                min_bin_width=self.min_bin_width,
                min_bin_height=self.min_bin_height,
                min_derivative=self.min_derivative)
        else:
            tails = list(self.tails) if isinstance(self.tails, tuple) \
                else self.tails
            outputs, logabsdet = unconstrained_rational_quadratic_spline(
                inputs, uw, uh, ud, inverse=inverse, tails=tails,
                tail_bound=tb, min_bin_width=self.min_bin_width,
                min_bin_height=self.min_bin_height,
                min_derivative=self.min_derivative)
        return outputs, sum_except_batch(logabsdet)

    def _elementwise_bin_major(self, inputs, autoregressive_params, inverse):
        """Fused bin-major feed: the MADE head emits ``(mult*D, B)`` with
        rows param-major, a zero-copy view of the fused kernel's ``(K, N)``
        layout — only the 1-plane input/output transposes remain
        (docs/kernels.md). Requires 'linear'/'circular' (possibly mixed
        per-feature) tails (``MADE.create(bin_major_head=...)`` guarantees
        it); the plane-splitting/tail-slicing contract is shared with the
        coupling feed in ``feed.kmajor_spline_feed``."""
        from .feed import kmajor_spline_feed

        batch = inputs.shape[0]
        p = autoregressive_params.reshape(-1, self.features, batch)
        return kmajor_spline_feed(
            inputs, p, num_bins=self.num_bins, tails=self.tails,
            tail_bound=self.tail_bound, tail_bound_arr=self.tail_bound_arr,
            softmax_scale=self.softmax_scale, inverse=inverse,
            min_bin_width=self.min_bin_width,
            min_bin_height=self.min_bin_height,
            min_derivative=self.min_derivative)

    def _elementwise_forward(self, inputs, autoregressive_params):
        return self._elementwise(inputs, autoregressive_params, inverse=False)

    def _elementwise_inverse(self, inputs, autoregressive_params):
        return self._elementwise(inputs, autoregressive_params, inverse=True)
