"""Monotone rational-quadratic splines (Durkan et al., arXiv 1906.04032).

Numerical semantics match reference ``normflows/utils/splines.py:16-219``
(softmax bin widths/heights with min-bin floors, softplus derivatives,
compare-and-sum bin search, quadratic-root inverse, fused log-det), but the
implementation is TPU-first:

* **No boolean-mask gathers.**  The reference dispatches in/out-of-interval
  elements with ``inputs[inside_interval_mask]`` (``splines.py:77-92``) —
  dynamic shapes.  Here every element runs the spline on a clamped input and
  a dense ``jnp.where`` selects spline vs identity-tail output, which XLA
  fuses into one elementwise kernel.
* **Gradient-safe selects.**  Inputs are clamped into the interval before
  the spline math so the unselected branch never produces NaN/Inf (the
  ``where`` + NaN autodiff pitfall).
* **No runtime asserts.**  The inverse discriminant (reference
  ``splines.py:181``) is clamped at zero; monotonicity guarantees it is
  non-negative in exact arithmetic.
"""

from __future__ import annotations

from typing import Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np

DEFAULT_MIN_BIN_WIDTH = 1e-3
DEFAULT_MIN_BIN_HEIGHT = 1e-3
DEFAULT_MIN_DERIVATIVE = 1e-3

# global switch for the fused Pallas fast path (auto-dispatch on TPU)
_PALLAS_ENABLED = True


def set_pallas_enabled(flag: bool) -> None:
    """Globally enable/disable the fused Pallas spline kernel (debugging /
    A-B numerics comparisons). Auto-dispatch still requires a TPU backend."""
    global _PALLAS_ENABLED
    _PALLAS_ENABLED = bool(flag)


def searchsorted(bin_locations, inputs, eps=1e-6):
    """Index of the bin containing each input, by compare-and-sum
    (reference ``splines.py:11-13``)."""
    locs = bin_locations.at[..., -1].add(eps)
    return jnp.sum(inputs[..., None] >= locs, axis=-1) - 1


def _make_knots(unnormalized, num_bins, min_size, low, high):
    """softmax -> min-size floor -> cumsum -> rescale to [low, high].

    Returns (sizes, cum) with exact endpoints (reference
    ``splines.py:126-152``).  ``low``/``high`` may be arrays broadcastable to
    the element shape."""
    sizes = jax.nn.softmax(unnormalized, axis=-1)
    sizes = min_size + (1 - min_size * num_bins) * sizes
    cum = jnp.cumsum(sizes, axis=-1)
    cum = jnp.concatenate([jnp.zeros_like(cum[..., :1]), cum], axis=-1)
    lo = jnp.asarray(low, cum.dtype)
    hi = jnp.asarray(high, cum.dtype)
    lo_b = lo[..., None] if lo.ndim else lo
    hi_b = hi[..., None] if hi.ndim else hi
    cum = (hi_b - lo_b) * cum + lo_b
    # pin the endpoints exactly (reference ``splines.py:134-135,150-151``)
    first = jnp.broadcast_to(lo_b, cum[..., :1].shape).astype(cum.dtype)
    last = jnp.broadcast_to(hi_b, cum[..., -1:].shape).astype(cum.dtype)
    cum = jnp.concatenate([first, cum[..., 1:-1], last], axis=-1)
    sizes = cum[..., 1:] - cum[..., :-1]
    return sizes, cum


def rational_quadratic_spline(
    inputs,
    unnormalized_widths,
    unnormalized_heights,
    unnormalized_derivatives,
    inverse=False,
    left=0.0,
    right=1.0,
    bottom=0.0,
    top=1.0,
    min_bin_width=DEFAULT_MIN_BIN_WIDTH,
    min_bin_height=DEFAULT_MIN_BIN_HEIGHT,
    min_derivative=DEFAULT_MIN_DERIVATIVE,
):
    """Elementwise RQ-spline map on the interval, with log-det
    (reference ``splines.py:100-219``).

    Shapes: ``inputs`` (...,), widths/heights (..., K), derivatives (..., K+1).
    ``left/right/bottom/top`` are scalars or arrays broadcastable to inputs.
    Returns ``(outputs, logabsdet)``.
    """
    num_bins = unnormalized_widths.shape[-1]
    if min_bin_width * num_bins > 1.0:
        raise ValueError("Minimal bin width too large for the number of bins")
    if min_bin_height * num_bins > 1.0:
        raise ValueError("Minimal bin height too large for the number of bins")

    widths, cumwidths = _make_knots(unnormalized_widths, num_bins,
                                    min_bin_width, left, right)
    heights, cumheights = _make_knots(unnormalized_heights, num_bins,
                                      min_bin_height, bottom, top)
    derivatives = min_derivative + jax.nn.softplus(unnormalized_derivatives)

    if inverse:
        bin_idx = searchsorted(cumheights, inputs)
    else:
        bin_idx = searchsorted(cumwidths, inputs)
    bin_idx = jnp.clip(bin_idx, 0, num_bins - 1)

    # One-hot masked sum instead of ``take_along_axis``: XLA lowers the
    # gather (and, worse, its scatter-add transpose in the backward pass)
    # to serialized dynamic slices on TPU, while the masked sum is pure
    # fusable VPU work with a select gradient. ``where`` (not multiply)
    # keeps a non-finite value in an UNselected bin from poisoning every
    # element via 0*inf=NaN — matching the old gather's locality.
    onehot = bin_idx[..., None] == jnp.arange(num_bins)

    def take(arr):
        return jnp.sum(jnp.where(onehot, arr[..., :num_bins], 0), axis=-1)

    input_cumwidths = take(cumwidths)
    input_bin_widths = take(widths)
    input_cumheights = take(cumheights)
    delta = heights / widths
    input_delta = take(delta)
    input_derivatives = take(derivatives)
    input_derivatives_p1 = take(derivatives[..., 1:])
    input_heights = take(heights)

    d_sum = input_derivatives + input_derivatives_p1 - 2 * input_delta

    if inverse:
        dy = inputs - input_cumheights
        a = dy * d_sum + input_heights * (input_delta - input_derivatives)
        b = input_heights * input_derivatives - dy * d_sum
        c = -input_delta * dy
        discriminant = jnp.maximum(b**2 - 4 * a * c, 0.0)
        root = (2 * c) / (-b - jnp.sqrt(discriminant))
        outputs = root * input_bin_widths + input_cumwidths
        theta_1mt = root * (1 - root)
        denominator = input_delta + d_sum * theta_1mt
        derivative_numerator = input_delta**2 * (
            input_derivatives_p1 * root**2
            + 2 * input_delta * theta_1mt
            + input_derivatives * (1 - root) ** 2
        )
        logabsdet = jnp.log(derivative_numerator) - 2 * jnp.log(denominator)
        return outputs, -logabsdet
    else:
        theta = (inputs - input_cumwidths) / input_bin_widths
        theta_1mt = theta * (1 - theta)
        numerator = input_heights * (
            input_delta * theta**2 + input_derivatives * theta_1mt)
        denominator = input_delta + d_sum * theta_1mt
        outputs = input_cumheights + numerator / denominator
        derivative_numerator = input_delta**2 * (
            input_derivatives_p1 * theta**2
            + 2 * input_delta * theta_1mt
            + input_derivatives * (1 - theta) ** 2
        )
        logabsdet = jnp.log(derivative_numerator) - 2 * jnp.log(denominator)
        return outputs, logabsdet


def identity_tail_spline(inputs, uw, uh, ud_padded, tb, inverse,
                         min_bin_width=DEFAULT_MIN_BIN_WIDTH,
                         min_bin_height=DEFAULT_MIN_BIN_HEIGHT,
                         min_derivative=DEFAULT_MIN_DERIVATIVE):
    """Symmetric-interval spline with identity tails, on PADDED (K+1)
    derivatives: clamp into [-tb, tb], evaluate, where-select identity
    outside. Single source of the tail semantics — shared by the generic
    entry point, the k-major dense fallback, and the Pallas custom-VJP
    backward (``splines_pallas._dense_impl``)."""
    inside = (inputs >= -tb) & (inputs <= tb)
    # clamp so the spline math never sees out-of-interval values (keeps the
    # unselected where-branch finite for both value and gradient)
    clamped = jnp.clip(inputs, -tb, tb)
    spline_out, spline_ld = rational_quadratic_spline(
        clamped, uw, uh, ud_padded, inverse=inverse, left=-tb, right=tb,
        bottom=-tb, top=tb, min_bin_width=min_bin_width,
        min_bin_height=min_bin_height, min_derivative=min_derivative)
    outputs = jnp.where(inside, spline_out, inputs)
    logabsdet = jnp.where(inside, spline_ld, 0.0)
    return outputs, logabsdet


def unconstrained_rational_quadratic_spline(
    inputs,
    unnormalized_widths,
    unnormalized_heights,
    unnormalized_derivatives,
    inverse=False,
    tails="linear",
    tail_bound=1.0,
    min_bin_width=DEFAULT_MIN_BIN_WIDTH,
    min_bin_height=DEFAULT_MIN_BIN_HEIGHT,
    min_derivative=DEFAULT_MIN_DERIVATIVE,
    use_pallas=None,
):
    """RQ spline on [-tail_bound, tail_bound] with identity tails
    (reference ``splines.py:16-97``).

    ``tails``: 'linear' (derivatives padded; boundary derivative == 1),
    'circular' (one extra derivative; last == first), or a per-feature
    list/tuple mixing the two (derivatives must then already have K+1
    entries).  ``tail_bound`` may be a scalar or per-feature array.

    ``use_pallas``: route the evaluation through the fused Pallas TPU kernel
    (``splines_pallas.fused_unconstrained_rqs``). ``None`` = auto: on TPU
    for problem sizes past the kernel's break-even point.
    """
    constant = float(np.log(np.exp(1 - min_derivative) - 1))

    if tails == "linear":
        ud = jnp.pad(unnormalized_derivatives, [(0, 0)] * (
            unnormalized_derivatives.ndim - 1) + [(1, 1)])
        ud = ud.at[..., 0].set(constant)
        ud = ud.at[..., -1].set(constant)
    elif tails == "circular":
        ud = jnp.pad(unnormalized_derivatives, [(0, 0)] * (
            unnormalized_derivatives.ndim - 1) + [(0, 1)])
        ud = ud.at[..., -1].set(ud[..., 0])
    elif isinstance(tails, (list, tuple)):
        # per-feature tails over the last input axis; derivatives (..., D, K+1)
        lin = jnp.asarray(np.asarray([t == "linear" for t in tails]))
        circ = jnp.asarray(np.asarray([t == "circular" for t in tails]))
        ud = unnormalized_derivatives  # (..., D, K+1)
        first = jnp.where(lin, constant, ud[..., 0])
        last = jnp.where(lin, constant,
                         jnp.where(circ, ud[..., 0], ud[..., -1]))
        ud = ud.at[..., 0].set(first)
        ud = ud.at[..., -1].set(last)
    else:
        raise RuntimeError(f"{tails} tails are not implemented.")

    tb = jnp.asarray(tail_bound, inputs.dtype)
    tb = jnp.broadcast_to(tb, inputs.shape)

    if use_pallas is None:
        use_pallas = (_PALLAS_ENABLED
                      and jax.default_backend() == "tpu"
                      and inputs.size >= 4096)
    if use_pallas:
        from .splines_pallas import fused_unconstrained_rqs

        return fused_unconstrained_rqs(
            inputs, unnormalized_widths, unnormalized_heights, ud, tb,
            inverse=inverse, min_bin_width=min_bin_width,
            min_bin_height=min_bin_height, min_derivative=min_derivative)

    return identity_tail_spline(
        inputs, unnormalized_widths, unnormalized_heights, ud, tb, inverse,
        min_bin_width=min_bin_width, min_bin_height=min_bin_height,
        min_derivative=min_derivative)


def unconstrained_rational_quadratic_spline_kmajor(
    inputs,
    unnormalized_widths,
    unnormalized_heights,
    unnormalized_derivatives,
    inverse=False,
    tails="linear",
    tail_bound=1.0,
    min_bin_width=DEFAULT_MIN_BIN_WIDTH,
    min_bin_height=DEFAULT_MIN_BIN_HEIGHT,
    min_derivative=DEFAULT_MIN_DERIVATIVE,
    use_pallas=None,
):
    """Bin-MAJOR variant of :func:`unconstrained_rational_quadratic_spline`.

    ``unnormalized_widths``/``heights``: ``(K, *inputs.shape)``;
    ``unnormalized_derivatives``: ``(K-1, ...)`` for 'linear' tails /
    ``(K, ...)`` for 'circular' / ``(K+1, ...)`` for a per-feature
    list/tuple of tail types, which aligns with **axis 0 of ``inputs``**
    (the feature-major data layout the bin-major model feeds use:
    ``x`` arrives as ``(D, batch)``). This layout lets conditioners feed
    the fused Pallas kernel WITHOUT the elementwise ``(N,K) -> (K,N)``
    transpose (a conv's ``(B, C*3K, H, W)`` output is already bin-major of
    the spatial dims; a bin-major matmul head emits ``(3K*D, B)``
    directly). Tail derivative padding happens along axis 0 (cheap row
    concat). Off-TPU (or with the kernel disabled) the params move to
    bin-minor and run the dense path — numerics identical to the generic
    entry point.
    """
    constant = float(np.log(np.exp(1 - min_derivative) - 1))
    ud = unnormalized_derivatives
    if tails == "linear":
        edge = jnp.full_like(ud[:1], constant)
        ud = jnp.concatenate([edge, ud, edge], axis=0)
    elif tails == "circular":
        ud = jnp.concatenate([ud, ud[:1]], axis=0)
    elif isinstance(tails, (list, tuple)):
        # per-feature tails along inputs axis 0; ud has K+1 planes whose
        # first/last entries the padding overwrites (same semantics as the
        # generic entry's list branch, transposed)
        lin = np.asarray([t == "linear" for t in tails])
        circ = np.asarray([t == "circular" for t in tails])
        if not np.all(lin | circ):
            raise RuntimeError(f"{tails} tails are not implemented.")
        bshape = (len(tails),) + (1,) * (inputs.ndim - 1)
        lin_b = jnp.asarray(lin).reshape(bshape)
        circ_b = jnp.asarray(circ).reshape(bshape)
        first = jnp.where(lin_b, constant, ud[0])
        last = jnp.where(lin_b, constant,
                         jnp.where(circ_b, ud[0], ud[-1]))
        ud = jnp.concatenate([first[None], ud[1:-1], last[None]], axis=0)
    else:
        raise RuntimeError(
            f"{tails!r} tails are not supported by the k-major entry")

    tb = jnp.broadcast_to(jnp.asarray(tail_bound, inputs.dtype),
                          inputs.shape)

    if use_pallas is None:
        use_pallas = (_PALLAS_ENABLED
                      and jax.default_backend() == "tpu"
                      and inputs.size >= 4096)
    if use_pallas:
        from .splines_pallas import fused_unconstrained_rqs_kmajor

        return fused_unconstrained_rqs_kmajor(
            inputs, unnormalized_widths, unnormalized_heights, ud, tb,
            inverse=inverse, min_bin_width=min_bin_width,
            min_bin_height=min_bin_height, min_derivative=min_derivative)

    return identity_tail_spline(
        inputs, jnp.moveaxis(unnormalized_widths, 0, -1),
        jnp.moveaxis(unnormalized_heights, 0, -1),
        jnp.moveaxis(ud, 0, -1), tb, inverse,
        min_bin_width=min_bin_width, min_bin_height=min_bin_height,
        min_derivative=min_derivative)
