"""Neural-spline coupling layers (reference
``normflows/flows/neural_spline/coupling.py``, originally from the nsf
codebase).

TPU-first notes: the identity/transform feature split uses static numpy index
vectors resolved at trace time into gathers/scatters with constant indices
(the reference uses ``masked_select``); the spline itself is the dense kernel
in ``nf_tpu.ops.splines``.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ... import ops
from ...ops import splines
from ...utils.module import buffer_field, static_field
from ...utils.nn import sum_except_batch
from ..base import Flow


class Coupling(Flow):
    """Mask-indexed coupling supporting 2D (NxD) and 4D (NxCxHxW) inputs
    (reference ``coupling.py:16-140``).  ``mask[i] > 0`` means feature i is
    transformed; the conditioner sees the identity features."""

    transform_net: Any
    unconditional_transform: Optional[Any]
    identity_features: tuple = static_field(default=())
    transform_features: tuple = static_field(default=())

    # ---- subclass hooks ----------------------------------------------------

    def _coupling_transform_forward(self, inputs, transform_params):
        raise NotImplementedError()

    def _coupling_transform_inverse(self, inputs, transform_params):
        raise NotImplementedError()

    @staticmethod
    def split_mask(mask):
        mask = np.asarray(mask)
        if mask.ndim != 1:
            raise ValueError("Mask must be a 1-dim tensor.")
        if mask.size == 0:
            raise ValueError("Mask can't be empty.")
        idx = np.arange(len(mask))
        return tuple(idx[mask <= 0].tolist()), tuple(idx[mask > 0].tolist())

    @property
    def features(self):
        return len(self.identity_features) + len(self.transform_features)

    def _scatter(self, template, identity_split, transform_split):
        out = jnp.empty_like(template)
        out = out.at[:, np.asarray(self.identity_features)].set(identity_split)
        out = out.at[:, np.asarray(self.transform_features)].set(
            transform_split)
        return out

    def _transform_params(self, identity_split, context, key):
        """Conditioner output for the transform half. Subclasses may
        return an alternative representation their ``_coupling_transform``
        understands (the RQ coupling returns transposed hidden features so
        the head matmul fuses into the spline kernel)."""
        return self.transform_net(identity_split, context, key=key)

    def forward(self, inputs, context=None, key=None):
        if inputs.ndim not in (2, 4):
            raise ValueError("Inputs must be a 2D or a 4D tensor.")
        identity_split = inputs[:, np.asarray(self.identity_features), ...]
        transform_split = inputs[:, np.asarray(self.transform_features), ...]

        transform_params = self._transform_params(identity_split, context,
                                                  key)
        transform_split, logabsdet = self._coupling_transform_forward(
            transform_split, transform_params)

        if self.unconditional_transform is not None:
            identity_split, logabsdet_id = \
                self.unconditional_transform.forward(identity_split,
                                                     context=context)
            logabsdet = logabsdet + logabsdet_id

        return self._scatter(inputs, identity_split, transform_split), \
            logabsdet

    def inverse(self, inputs, context=None, key=None):
        if inputs.ndim not in (2, 4):
            raise ValueError("Inputs must be a 2D or a 4D tensor.")
        identity_split = inputs[:, np.asarray(self.identity_features), ...]
        transform_split = inputs[:, np.asarray(self.transform_features), ...]

        logabsdet = 0.0
        if self.unconditional_transform is not None:
            identity_split, logabsdet = \
                self.unconditional_transform.inverse(identity_split,
                                                     context=context)

        transform_params = self._transform_params(identity_split, context,
                                                  key)
        transform_split, logabsdet_split = self._coupling_transform_inverse(
            transform_split, transform_params)
        logabsdet = logabsdet + logabsdet_split

        return self._scatter(inputs, identity_split, transform_split), \
            logabsdet


def _reshape_params(inputs, transform_params):
    """B x (C*P) x H x W -> B x C x H x W x P, or B x (D*P) -> B x D x P
    (reference ``coupling.py:150-160``)."""
    if inputs.ndim == 4:
        b, c, h, w = inputs.shape
        p = transform_params.reshape(b, c, -1, h, w)
        return jnp.transpose(p, (0, 1, 3, 4, 2))
    b, d = inputs.shape
    return transform_params.reshape(b, d, -1)


class PiecewiseRationalQuadraticCDF(Flow):
    """Elementwise RQ-spline flow with its own parameters — used as the
    unconditional transform on the identity half
    (reference ``coupling.py:170-259``)."""

    unnormalized_widths: jax.Array
    unnormalized_heights: jax.Array
    unnormalized_derivatives: jax.Array
    tail_bound_arr: Optional[jax.Array] = buffer_field(default=None)
    tails: Any = static_field(default=None)
    tail_bound: float = static_field(default=1.0)
    min_bin_width: float = static_field(default=splines.DEFAULT_MIN_BIN_WIDTH)
    min_bin_height: float = static_field(default=splines.DEFAULT_MIN_BIN_HEIGHT)
    min_derivative: float = static_field(default=splines.DEFAULT_MIN_DERIVATIVE)

    @classmethod
    def create(cls, shape, num_bins=10, tails=None, tail_bound=1.0,
               identity_init=True, key=None,
               min_bin_width=splines.DEFAULT_MIN_BIN_WIDTH,
               min_bin_height=splines.DEFAULT_MIN_BIN_HEIGHT,
               min_derivative=splines.DEFAULT_MIN_DERIVATIVE,
               dtype=jnp.float32):
        if isinstance(shape, int):
            shape = (shape,)
        shape = tuple(shape)
        if tails == "linear":
            num_derivatives = num_bins - 1
        elif tails == "circular":
            num_derivatives = num_bins
        else:
            num_derivatives = num_bins + 1
        if identity_init:
            uw = jnp.zeros(shape + (num_bins,), dtype)
            uh = jnp.zeros(shape + (num_bins,), dtype)
            constant = float(np.log(np.exp(1 - min_derivative) - 1))
            ud = jnp.full(shape + (num_derivatives,), constant, dtype)
        else:
            if key is None:
                key = jax.random.PRNGKey(0)
            k1, k2, k3 = jax.random.split(key, 3)
            uw = jax.random.uniform(k1, shape + (num_bins,), dtype)
            uh = jax.random.uniform(k2, shape + (num_bins,), dtype)
            ud = jax.random.uniform(k3, shape + (num_derivatives,), dtype)
        tb_arr = None
        if not np.isscalar(tail_bound):
            tb_arr = jnp.asarray(tail_bound, dtype)
            tail_bound = 1.0  # unused when array given
        if isinstance(tails, (list, tuple)):
            tails = tuple(tails)
        return cls(unnormalized_widths=uw, unnormalized_heights=uh,
                   unnormalized_derivatives=ud, tail_bound_arr=tb_arr,
                   tails=tails, tail_bound=float(tail_bound),
                   min_bin_width=min_bin_width, min_bin_height=min_bin_height,
                   min_derivative=min_derivative)

    def _spline(self, inputs, inverse):
        batch = inputs.shape[0]
        uw = jnp.broadcast_to(self.unnormalized_widths[None],
                              (batch,) + self.unnormalized_widths.shape)
        uh = jnp.broadcast_to(self.unnormalized_heights[None],
                              (batch,) + self.unnormalized_heights.shape)
        ud = jnp.broadcast_to(self.unnormalized_derivatives[None],
                              (batch,) + self.unnormalized_derivatives.shape)
        tb = self.tail_bound_arr if self.tail_bound_arr is not None \
            else self.tail_bound
        if (self.tail_bound_arr is not None
                and self.tail_bound_arr.ndim == 1 and inputs.ndim > 2):
            # per-channel bounds align to the channel axis of 4D inputs
            tb = tb.reshape((1, -1) + (1,) * (inputs.ndim - 2))
        if self.tails is None:
            outputs, logabsdet = ops.rational_quadratic_spline(
                inputs, uw, uh, ud, inverse=inverse,
                min_bin_width=self.min_bin_width,
                min_bin_height=self.min_bin_height,
                min_derivative=self.min_derivative)
        else:
            tails = list(self.tails) if isinstance(self.tails, tuple) \
                else self.tails
            outputs, logabsdet = ops.unconstrained_rational_quadratic_spline(
                inputs, uw, uh, ud, inverse=inverse, tails=tails,
                tail_bound=tb, min_bin_width=self.min_bin_width,
                min_bin_height=self.min_bin_height,
                min_derivative=self.min_derivative)
        return outputs, sum_except_batch(logabsdet)

    def forward(self, inputs, context=None, key=None):
        return self._spline(inputs, inverse=False)

    def inverse(self, inputs, context=None, key=None):
        return self._spline(inputs, inverse=True)


class PiecewiseRationalQuadraticCoupling(Coupling):
    """RQ-spline coupling (reference ``coupling.py:262-362``): per-feature
    tails, tensor tail bounds split between halves, softmax inputs scaled by
    sqrt(hidden) (``coupling.py:334-339``)."""

    tail_bound_arr: Optional[jax.Array] = buffer_field(default=None)
    num_bins: int = static_field(default=10)
    tails: Any = static_field(default=None)
    tail_bound: float = static_field(default=1.0)
    softmax_scale: float = static_field(default=1.0)
    min_bin_width: float = static_field(default=splines.DEFAULT_MIN_BIN_WIDTH)
    min_bin_height: float = static_field(default=splines.DEFAULT_MIN_BIN_HEIGHT)
    min_derivative: float = static_field(default=splines.DEFAULT_MIN_DERIVATIVE)

    @classmethod
    def create(cls, key, mask, transform_net_create_fn, num_bins=10,
               tails=None, tail_bound=1.0,
               apply_unconditional_transform=False, img_shape=None,
               min_bin_width=splines.DEFAULT_MIN_BIN_WIDTH,
               min_bin_height=splines.DEFAULT_MIN_BIN_HEIGHT,
               min_derivative=splines.DEFAULT_MIN_DERIVATIVE,
               dtype=jnp.float32):
        identity_features, transform_features = Coupling.split_mask(mask)

        # split per-feature tails/tail_bound between halves
        if isinstance(tails, (list, tuple)):
            tails_t = tuple(tails[i] for i in transform_features)
            tails_id = tuple(tails[i] for i in identity_features)
        else:
            tails_t = tails
            tails_id = tails

        tb_is_arr = not np.isscalar(tail_bound)
        if tb_is_arr:
            tb = np.asarray(tail_bound)
            tb_t = jnp.asarray(tb[np.asarray(transform_features)], dtype)
            tb_id = tb[np.asarray(identity_features)]
        else:
            tb_t = None
            tb_id = tail_bound

        if tails_t == "linear":
            mult = num_bins * 3 - 1
        elif tails_t == "circular":
            mult = num_bins * 3
        elif tails_t is None:
            mult = num_bins * 3 + 1
        else:  # per-feature: K+1 derivatives provided, mixed handled densely
            mult = num_bins * 3 + 1

        k_net, k_unc = jax.random.split(key)
        transform_net = transform_net_create_fn(
            k_net, len(identity_features), len(transform_features) * mult)

        unconditional = None
        if apply_unconditional_transform:
            shape = [len(identity_features)] + (list(img_shape) if img_shape
                                                else [])
            unconditional = PiecewiseRationalQuadraticCDF.create(
                shape, num_bins=num_bins, tails=tails_id, tail_bound=tb_id,
                key=k_unc, min_bin_width=min_bin_width,
                min_bin_height=min_bin_height, min_derivative=min_derivative,
                dtype=dtype)

        hidden = getattr(transform_net, "hidden_features", None) \
            or getattr(transform_net, "hidden_channels", None)
        if hidden is None:
            hidden = getattr(getattr(transform_net, "initial_layer", None),
                             "weight", np.zeros((1, 1))).shape[0]
        softmax_scale = 1.0 / float(np.sqrt(hidden)) if hidden else 1.0

        if isinstance(tails_t, (list, tuple)):
            tails_t = tuple(tails_t)
        return cls(transform_net=transform_net,
                   unconditional_transform=unconditional,
                   identity_features=identity_features,
                   transform_features=transform_features,
                   tail_bound_arr=tb_t, num_bins=num_bins, tails=tails_t,
                   tail_bound=(float(tail_bound) if not tb_is_arr else 1.0),
                   softmax_scale=softmax_scale,
                   min_bin_width=min_bin_width, min_bin_height=min_bin_height,
                   min_derivative=min_derivative)

    def _piecewise_cdf(self, inputs, transform_params, inverse):
        uw = transform_params[..., : self.num_bins] * self.softmax_scale
        uh = transform_params[..., self.num_bins:2 * self.num_bins] \
            * self.softmax_scale
        ud = transform_params[..., 2 * self.num_bins:]
        tb = self.tail_bound_arr if self.tail_bound_arr is not None \
            else self.tail_bound
        if self.tail_bound_arr is not None and inputs.ndim > 2:
            # per-feature bounds align to the CHANNEL axis of 4D inputs,
            # not the trailing width axis
            tb = tb.reshape((1, -1) + (1,) * (inputs.ndim - 2))
        if self.tails is None:
            return ops.rational_quadratic_spline(
                inputs, uw, uh, ud, inverse=inverse,
                min_bin_width=self.min_bin_width,
                min_bin_height=self.min_bin_height,
                min_derivative=self.min_derivative)
        tails = list(self.tails) if isinstance(self.tails, tuple) \
            else self.tails
        return ops.unconstrained_rational_quadratic_spline(
            inputs, uw, uh, ud, inverse=inverse, tails=tails, tail_bound=tb,
            min_bin_width=self.min_bin_width,
            min_bin_height=self.min_bin_height,
            min_derivative=self.min_derivative)

    def _homogeneous_tails(self):
        """See ``feed.homogeneous_tails`` (shared with the autoregressive
        feed); homogeneity lets e.g. the cylinder's one-circular-feature
        couplings use the fused bin-major feeds at reference
        parameter-count parity."""
        from .feed import homogeneous_tails

        return homogeneous_tails(self.tails)

    def _slice_ud_planes(self, ud, homo):
        """Drop the derivative planes the tail padding would overwrite when
        params carry the per-feature-tails K+1 count (leading-axis layout;
        shared contract in ``feed.slice_ud_planes``)."""
        from .feed import slice_ud_planes

        return slice_ud_planes(ud, self.num_bins, homo)

    def _transform_params(self, identity_split, context, key):
        """Route the conditioner through transposed execution when the
        fused head+spline kernel will consume it: the trunk emits
        ``(hidden, batch)`` features and the final head matmul moves
        inside the Pallas kernel (``ops.spline_head_fused``)."""
        from ...ops.spline_head_fused import fused_head_wanted
        from .feed import FusedFeed, fused_head_eligible

        if (identity_split.ndim == 2
                and fused_head_eligible(self.transform_net, self.tails,
                                        self.tail_bound_arr, self.num_bins)
                and fused_head_wanted(identity_split.shape[0]
                                      * len(self.transform_features))):
            return FusedFeed(self.transform_net.features_transposed(
                identity_split, context, key=key))
        return self.transform_net(identity_split, context, key=key)

    def _coupling_transform(self, inputs, transform_params, inverse):
        from .feed import FusedFeed

        if isinstance(transform_params, FusedFeed):
            from .feed import fused_head_spline_feed

            return fused_head_spline_feed(
                inputs, transform_params.h_t, self.transform_net,
                num_bins=self.num_bins, tails=self.tails,
                tail_bound=self.tail_bound,
                tail_bound_arr=self.tail_bound_arr,
                softmax_scale=self.softmax_scale, inverse=inverse,
                min_bin_width=self.min_bin_width,
                min_bin_height=self.min_bin_height,
                min_derivative=self.min_derivative)
        homo = self._homogeneous_tails()
        mixed = (isinstance(self.tails, tuple)
                 and set(self.tails) <= {"linear", "circular"})
        net_bin_major = getattr(self.transform_net, "bin_major_head", None)
        if net_bin_major is not None:
            # head emits (mult*D, B) with rows bin-major: zero-copy view to
            # (mult, D, B) planes
            b = inputs.shape[0]
            d = net_bin_major[0]
            p = transform_params.reshape(-1, d, b)
            if inputs.ndim == 2 and (homo is not None or mixed):
                from .feed import kmajor_spline_feed

                return kmajor_spline_feed(
                    inputs, p, num_bins=self.num_bins, tails=self.tails,
                    tail_bound=self.tail_bound,
                    tail_bound_arr=self.tail_bound_arr,
                    softmax_scale=self.softmax_scale, inverse=inverse,
                    min_bin_width=self.min_bin_width,
                    min_bin_height=self.min_bin_height,
                    min_derivative=self.min_derivative)
            # unsupported tails/rank: fall back to the generic feed
            transform_params = jnp.moveaxis(p, (0, 1, 2), (2, 1, 0)) \
                .reshape(b, -1)
        if inputs.ndim == 4 and homo is not None:
            # Bin-major fast feed: the conv conditioner output
            # (B, C*3K, H, W) views as (B, C, 3K, H, W) with the bin axis
            # already major of the spatial dims, so reaching the fused
            # kernel's (K, N) layout moves contiguous H*W chunks — instead
            # of the elementwise (N,K)->(K,N) transpose (3x the kernel's
            # own time; docs/kernels.md).
            b, c, h, w = inputs.shape
            p = transform_params.reshape(b, c, -1, h, w)
            p = jnp.transpose(p, (2, 0, 1, 3, 4))
            uw = p[: self.num_bins] * self.softmax_scale
            uh = p[self.num_bins:2 * self.num_bins] * self.softmax_scale
            ud = self._slice_ud_planes(p[2 * self.num_bins:], homo)
            tb = self.tail_bound_arr if self.tail_bound_arr is not None \
                else self.tail_bound
            if self.tail_bound_arr is not None:
                tb = tb.reshape((1, -1, 1, 1))  # per-channel bounds
            outputs, logabsdet = \
                splines.unconstrained_rational_quadratic_spline_kmajor(
                    inputs, uw, uh, ud, inverse=inverse, tails=homo,
                    tail_bound=tb, min_bin_width=self.min_bin_width,
                    min_bin_height=self.min_bin_height,
                    min_derivative=self.min_derivative)
            return outputs, sum_except_batch(logabsdet)
        params = _reshape_params(inputs, transform_params)
        outputs, logabsdet = self._piecewise_cdf(inputs, params, inverse)
        return outputs, sum_except_batch(logabsdet)

    def _coupling_transform_forward(self, inputs, transform_params):
        return self._coupling_transform(inputs, transform_params, False)

    def _coupling_transform_inverse(self, inputs, transform_params):
        return self._coupling_transform(inputs, transform_params, True)
