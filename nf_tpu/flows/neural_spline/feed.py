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

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ...ops import splines
from ...ops import spline_head_fused as _fused


class FusedFeed(NamedTuple):
    """Conditioner output for the fused head+spline path: the TRANSPOSED
    hidden activations ``(hidden, batch)`` from
    ``net.features_transposed`` — the head matmul itself happens inside
    the Pallas kernel (``ops.spline_head_fused``)."""

    h_t: jax.Array


def fused_head_eligible(net, tails, tail_bound_arr, num_bins):
    """Static dispatch test for the fused head+spline kernel: the
    conditioner must run transposed and carry a bin-major head whose row
    count is exactly the homogeneous-tail effective layout; mixed
    per-feature tails stay on the generic k-major feed. (Per-feature
    tail BOUNDS are fine — the kernel takes a (D,) bound.)"""
    homo = homogeneous_tails(tails)
    if homo is None:
        return False
    head = getattr(net, "bin_major_head", None)
    if head is None or not hasattr(net, "features_transposed"):
        return False
    feats, mult = head
    return mult == 2 * num_bins + _fused._dplanes(num_bins, homo)


def fused_head_spline_feed(inputs, h_t, net, *, num_bins, tails, tail_bound,
                           tail_bound_arr, softmax_scale, inverse,
                           min_bin_width, min_bin_height, min_derivative):
    """Fused-kernel twin of :func:`kmajor_spline_feed`: ``(B, D)`` inputs +
    transposed hidden activations; the head GEMM runs inside the kernel and
    the 3K parameter planes never touch HBM. Same outputs, same gradients
    (tests/test_fused_head.py pins both against the unfused path)."""
    homo = homogeneous_tails(tails)
    w_eff, b_eff = _fused.effective_head(
        net.final_layer.weight, net.final_layer.bias, num_bins=num_bins,
        feats=inputs.shape[1], tails=homo, softmax_scale=softmax_scale)
    tb = tail_bound_arr if tail_bound_arr is not None else tail_bound
    y_t, ld_t = _fused.fused_head_rqs(
        inputs.T, h_t, w_eff, b_eff, num_bins=num_bins, tails=homo,
        tail_bound=tb, inverse=inverse, min_bin_width=min_bin_width,
        min_bin_height=min_bin_height, min_derivative=min_derivative)
    return y_t.T, jnp.sum(ld_t, axis=0)


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
