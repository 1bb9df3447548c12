"""User-facing NSF layers (reference ``normflows/flows/neural_spline/wrapper.py``).

These build ResidualNet/MADE conditioners with alternating masks and identity
init.  **Direction convention** (reference ``wrapper.py:79-85``): the flow's
``forward`` calls the nsf transform's *inverse* and vice versa — preserved
exactly, and covered by log-det antisymmetry tests.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ...nets.precision import MixedPrecision
from ...nets.resnet import ResidualNet
from ...ops.splines import DEFAULT_MIN_DERIVATIVE
from ...utils.masks import create_alternating_binary_mask
from ...utils.module import static_field
from ...utils.nn import PeriodicFeaturesElementwise
from ..base import Flow
from .autoregressive import MaskedPiecewiseRationalQuadraticAutoregressive
from .coupling import Coupling, PiecewiseRationalQuadraticCoupling


def _identity_init_resnet(net):
    constant = float(np.log(np.exp(1 - DEFAULT_MIN_DERIVATIVE) - 1))
    final = net.final_layer
    final = final.replace(weight=jnp.zeros_like(final.weight),
                          bias=jnp.full_like(final.bias, constant))
    return net.replace(final_layer=final)


def _head_splits(mask, num_bins, tails):
    """(transform_features, mult) for a bin-major conditioner head, or None
    when the transform half's tails are mixed (generic feed only).

    Mirrors the parameter-count rule of
    ``PiecewiseRationalQuadraticCoupling.create`` (reference
    ``coupling.py:321-327``): scalar 'linear' -> 3K-1, scalar 'circular' ->
    3K, per-feature list (even homogeneous, for parameter parity) -> 3K+1.
    """
    _, transform_features = Coupling.split_mask(mask)
    if isinstance(tails, (list, tuple)):
        tails_t = {tails[i] for i in transform_features}
        if not tails_t <= {"linear", "circular"}:
            return None
        mult = 3 * num_bins + 1
    elif tails == "linear":
        mult = 3 * num_bins - 1
    elif tails == "circular":
        mult = 3 * num_bins
    else:
        return None
    return (len(transform_features), mult)


class CoupledRationalQuadraticSpline(Flow):
    """NSF coupling layer with ResidualNet conditioner
    (reference ``wrapper.py:14-85``)."""

    prqct: PiecewiseRationalQuadraticCoupling

    @classmethod
    def create(cls, key, num_input_channels, num_blocks, num_hidden_channels,
               num_context_channels=None, num_bins=8, tails="linear",
               tail_bound=3.0, activation=jax.nn.relu,
               dropout_probability=0.0, reverse_mask=False,
               init_identity=True, mixed_precision=False,
               bin_major_head=True, dtype=jnp.float32):
        mask = np.asarray(create_alternating_binary_mask(
            num_input_channels, even=reverse_mask))
        head = _head_splits(mask, num_bins, tails) if bin_major_head \
            else None

        def transform_net_create_fn(k, in_features, out_features):
            net = ResidualNet.create(
                k, in_features=in_features, out_features=out_features,
                hidden_features=num_hidden_channels,
                context_features=num_context_channels,
                num_blocks=num_blocks, activation=activation,
                dropout_probability=dropout_probability,
                use_batch_norm=False, bin_major_head=head, dtype=dtype)
            if init_identity:
                net = _identity_init_resnet(net)
            if mixed_precision:
                net = MixedPrecision(net=net)
            return net

        prqct = PiecewiseRationalQuadraticCoupling.create(
            key,
            mask=mask,
            transform_net_create_fn=transform_net_create_fn,
            num_bins=num_bins, tails=tails, tail_bound=tail_bound,
            # True corresponds to eqs (4)-(6) in the NSF paper
            apply_unconditional_transform=True, dtype=dtype)
        return cls(prqct=prqct)

    def forward(self, z, context=None, key=None):
        z, log_det = self.prqct.inverse(z, context=context, key=key)
        return z, log_det.reshape(-1)

    def inverse(self, z, context=None, key=None):
        z, log_det = self.prqct.forward(z, context=context, key=key)
        return z, log_det.reshape(-1)


class CircularCoupledRationalQuadraticSpline(Flow):
    """NSF coupling layer with circular coordinates
    (reference ``wrapper.py:88-183``)."""

    prqct: PiecewiseRationalQuadraticCoupling

    @classmethod
    def create(cls, key, num_input_channels, num_blocks, num_hidden_channels,
               ind_circ, num_context_channels=None, num_bins=8,
               tail_bound=3.0, activation=jax.nn.relu,
               dropout_probability=0.0, reverse_mask=False, mask=None,
               init_identity=True, mixed_precision=False,
               bin_major_head=True, dtype=jnp.float32):
        if mask is None:
            mask = np.asarray(create_alternating_binary_mask(
                num_input_channels, even=reverse_mask))
        mask = np.asarray(mask)
        identity_features, _ = Coupling.split_mask(mask)
        ind_circ = list(ind_circ)
        ind_circ_id = [i for i, idf in enumerate(identity_features)
                       if idf in ind_circ]

        if np.isscalar(tail_bound):
            scale_pf = np.pi / tail_bound
        else:
            scale_pf = np.pi / np.asarray(tail_bound)[
                np.asarray(identity_features)[ind_circ_id]]

        tails = ["circular" if i in ind_circ else "linear"
                 for i in range(num_input_channels)]
        head = _head_splits(mask, num_bins, tails) if bin_major_head \
            else None

        def transform_net_create_fn(k, in_features, out_features):
            pf = (PeriodicFeaturesElementwise.create(in_features, ind_circ_id,
                                                     scale_pf, dtype=dtype)
                  if ind_circ_id else None)
            net = ResidualNet.create(
                k, in_features=in_features, out_features=out_features,
                hidden_features=num_hidden_channels,
                context_features=num_context_channels,
                num_blocks=num_blocks, activation=activation,
                dropout_probability=dropout_probability,
                use_batch_norm=False, preprocessing=pf,
                bin_major_head=head, dtype=dtype)
            if init_identity:
                net = _identity_init_resnet(net)
            if mixed_precision:
                net = MixedPrecision(net=net)
            return net

        prqct = PiecewiseRationalQuadraticCoupling.create(
            key, mask=mask, transform_net_create_fn=transform_net_create_fn,
            num_bins=num_bins, tails=tails, tail_bound=tail_bound,
            apply_unconditional_transform=True, dtype=dtype)
        return cls(prqct=prqct)

    def forward(self, z, context=None, key=None):
        z, log_det = self.prqct.inverse(z, context=context, key=key)
        return z, log_det.reshape(-1)

    def inverse(self, z, context=None, key=None):
        z, log_det = self.prqct.forward(z, context=context, key=key)
        return z, log_det.reshape(-1)


class AutoregressiveRationalQuadraticSpline(Flow):
    """NSF autoregressive layer (reference ``wrapper.py:186-244``)."""

    mprqat: MaskedPiecewiseRationalQuadraticAutoregressive

    @classmethod
    def create(cls, key, num_input_channels, num_blocks, num_hidden_channels,
               num_context_channels=None, num_bins=8, tail_bound=3.0,
               activation=jax.nn.relu, dropout_probability=0.0,
               permute_mask=False, init_identity=True, mixed_precision=False,
               bin_major_head=True, dtype=jnp.float32):
        mprqat = MaskedPiecewiseRationalQuadraticAutoregressive.create(
            key, features=num_input_channels,
            hidden_features=num_hidden_channels,
            context_features=num_context_channels, num_bins=num_bins,
            tails="linear", tail_bound=tail_bound, num_blocks=num_blocks,
            use_residual_blocks=True, random_mask=False,
            permute_mask=permute_mask, activation=activation,
            dropout_probability=dropout_probability, use_batch_norm=False,
            init_identity=init_identity, mixed_precision=mixed_precision,
            bin_major_head=bin_major_head, dtype=dtype)
        return cls(mprqat=mprqat)

    def forward(self, z, context=None, key=None):
        z, log_det = self.mprqat.inverse(z, context=context)
        return z, log_det.reshape(-1)

    def inverse(self, z, context=None, key=None):
        z, log_det = self.mprqat.forward(z, context=context)
        return z, log_det.reshape(-1)


class CircularAutoregressiveRationalQuadraticSpline(Flow):
    """Circular NSF autoregressive layer (reference ``wrapper.py:247-311``)."""

    mprqat: MaskedPiecewiseRationalQuadraticAutoregressive

    @classmethod
    def create(cls, key, num_input_channels, num_blocks, num_hidden_channels,
               ind_circ, num_context_channels=None, num_bins=8,
               tail_bound=3.0, activation=jax.nn.relu,
               dropout_probability=0.0, permute_mask=True,
               init_identity=True, mixed_precision=False,
               bin_major_head=True, dtype=jnp.float32):
        tails = ["circular" if i in ind_circ else "linear"
                 for i in range(num_input_channels)]
        mprqat = MaskedPiecewiseRationalQuadraticAutoregressive.create(
            key, features=num_input_channels,
            hidden_features=num_hidden_channels,
            context_features=num_context_channels, num_bins=num_bins,
            tails=tails, tail_bound=tail_bound, num_blocks=num_blocks,
            use_residual_blocks=True, random_mask=False,
            permute_mask=permute_mask, activation=activation,
            dropout_probability=dropout_probability, use_batch_norm=False,
            init_identity=init_identity, mixed_precision=mixed_precision,
            bin_major_head=bin_major_head, dtype=dtype)
        return cls(mprqat=mprqat)

    def forward(self, z, context=None, key=None):
        z, log_det = self.mprqat.inverse(z, context=context)
        return z, log_det.reshape(-1)

    def inverse(self, z, context=None, key=None):
        z, log_det = self.mprqat.forward(z, context=context)
        return z, log_det.reshape(-1)
