"""Shared bin-major ("k-major") spline-parameter feed.

A bin-major conditioner head (``nets/mlp.py Linear.call_transposed``,
``nets/made.py``, ``nets/resnet.py``) emits ``(mult*D, B)`` output with
rows param-major, a zero-copy view of the fused Pallas kernel's ``(K, N)``
layout (docs/kernels.md).  Both 2D feed sites — coupling
(``coupling.py PiecewiseRationalQuadraticCoupling._coupling_transform``)
and autoregressive (``autoregressive.py
MaskedPiecewiseRationalQuadraticAutoregressive._elementwise_bin_major``)
— share the plane-splitting / tail-slicing / tail-bound-broadcast contract
below; keeping it in one place keeps their numerics tied together
(reference semantics: ``normflows/utils/splines.py:100-219``).
"""

from __future__ import annotations

import jax.numpy as jnp

from ...ops import splines


def homogeneous_tails(tails):
    """'linear'/'circular' when every transformed feature shares that tail
    type (scalar, or a homogeneous per-feature list/tuple), else None.
    A homogeneous per-feature spec keeps the reference's 3K+1 parameter
    count (``coupling.py:321-327``) but is pointwise-equivalent to the
    scalar variant on a derivative sub-slice — first/last entries are
    overwritten by the tail padding (see
    ``ops.splines.unconstrained_rational_quadratic_spline``)."""
    if tails in ("linear", "circular"):
        return tails
    if isinstance(tails, (list, tuple)) and len(set(tails)) == 1 \
            and tails[0] in ("linear", "circular"):
        return tails[0]
    return None


def slice_ud_planes(ud, num_bins, homo):
    """Drop the derivative planes the tail padding would overwrite when
    params carry the per-feature-tails K+1 count (leading-axis layout)."""
    if ud.shape[0] == num_bins + 1:
        return ud[1:num_bins] if homo == "linear" else ud[:num_bins]
    return ud


def kmajor_spline_feed(inputs, planes, *, num_bins, tails, tail_bound,
                       tail_bound_arr, softmax_scale, inverse,
                       min_bin_width, min_bin_height, min_derivative):
    """Apply the fused k-major spline to ``(B, D)`` inputs with bin-major
    ``(mult, D, B)`` parameter planes; returns ``(outputs (B, D),
    log_det (B,))``.

    ``tails`` must be 'linear'/'circular' or a per-feature list/tuple of
    those (callers gate unsupported specs to the generic feed).  The only
    data movement is the 1-plane input/output transpose — the 3K+1 param
    planes are zero-copy views of the conditioner head's output.
    """
    uw = planes[:num_bins] * softmax_scale
    uh = planes[num_bins:2 * num_bins] * softmax_scale
    ud = planes[2 * num_bins:]
    homo = homogeneous_tails(tails)
    if homo is not None:
        ud = slice_ud_planes(ud, num_bins, homo)
        tails_arg = homo
    else:
        # mixed per-feature tails: all K+1 planes pass through; the
        # k-major entry applies the per-feature padding along the feature
        # axis (axis 0 of the transposed data)
        tails_arg = list(tails)
    tb = tail_bound_arr if tail_bound_arr is not None else tail_bound
    if tail_bound_arr is not None:
        tb = tb.reshape(-1, 1)  # per-feature bounds over (D, B) data
    y_t, ld_t = splines.unconstrained_rational_quadratic_spline_kmajor(
        inputs.T, uw, uh, ud, inverse=inverse, tails=tails_arg,
        tail_bound=tb, min_bin_width=min_bin_width,
        min_bin_height=min_bin_height, min_derivative=min_derivative)
    return y_t.T, jnp.sum(ld_t, axis=0)
