"""Fused Pallas TPU kernel for the unconstrained RQ-spline.

This is the framework's #1 hot numeric op (reference
``normflows/utils/splines.py:16-97`` composes it from ~30 eager torch ops
with boolean-mask gathers). The kernel fuses, per element, in one VMEM pass:

  softmax + min-bin floor + cumsum (knots) -> bin search -> knot select ->
  rational-quadratic evaluate (fwd or inv) + log-det -> identity-tail select

TPU-first layout decisions:

* **Bins on sublanes, elements on lanes.** Params arrive as ``(K, R, 128)``
  (elements flattened and viewed as ``R x 128`` planes). Every op in the
  kernel is an elementwise op or reduction over full ``(BR, 128)`` planes —
  the VPU's native shape. The per-bin loops are unrolled at trace time
  (K is a small static constant, 4-32).
* **No gathers.** The reference's ``take_along_axis`` bin-parameter lookup
  becomes a masked accumulation ``sum_k (idx==k) * arr_k`` — pure VPU.
* **Custom VJP.** The backward pass reuses the dense jnp implementation via
  ``jax.vjp`` (rematerialized), so training sees identical gradients to the
  reference semantics while sampling/eval rides the fused kernel.

On non-TPU backends the kernel runs in interpreter mode, so the same code
path is exercised by the CPU test suite.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .splines import (
    DEFAULT_MIN_BIN_HEIGHT,
    DEFAULT_MIN_BIN_WIDTH,
    DEFAULT_MIN_DERIVATIVE,
    rational_quadratic_spline,
)

_LANES = 128
_BLOCK_ROWS = 32  # (32, 128) f32 planes; VMEM per block ~ (3K+2) * 16 KB


def _rqs_kernel(x_ref, w_ref, h_ref, d_ref, tb_ref, out_ref, ld_ref, *,
                num_bins, inverse, min_bin_width, min_bin_height,
                min_derivative):
    """One (BR, 128) plane of elements; all bin loops unrolled.

    Measured compute-bound on v5e (block size and the XLA-side param
    transpose don't move it), so the body minimizes VPU op count:

    * bin masks come straight from the bin-search step functions
      (``mask_k = s_k - s_{k+1}``) — no ``idx`` and no per-bin compare
      chains in the selects;
    * softplus runs on the TWO selected boundary derivatives, not all
      ``K+1`` planes (saves ``2(K-1)`` transcendentals per element);
    * the softmax min-size floor folds into one fused scale plane.
    """
    K = num_bins
    x = x_ref[...]
    tb = tb_ref[...]

    def normalized_sizes(ref, n, min_size):
        rows = [ref[k] for k in range(n)]
        m = rows[0]
        for r in rows[1:]:
            m = jnp.maximum(m, r)
        exps = [jnp.exp(r - m) for r in rows]
        total = exps[0]
        for e in exps[1:]:
            total = total + e
        # min_size + (1 - min_size*n) * softmax  ==  min_size + si * exp_k
        si = (1.0 - min_size * n) / total
        return [min_size + e * si for e in exps]

    def knots(sizes, lo, hi):
        """Cumulative knots with exact endpoint pinning
        (reference ``splines.py:134-135,150-151``)."""
        span = hi - lo
        cums = [lo]
        acc = None
        for k in range(K - 1):
            acc = sizes[k] if acc is None else acc + sizes[k]
            cums.append(lo + span * acc)
        cums.append(hi)
        pinned = [cums[k + 1] - cums[k] for k in range(K)]
        return pinned, cums

    widths, cumw = knots(
        normalized_sizes(w_ref, K, min_bin_width), -tb, tb)
    heights, cumh = knots(
        normalized_sizes(h_ref, K, min_bin_height), -tb, tb)

    xin = jnp.clip(x, -tb, tb)

    # Bin-search step functions on the interior knots
    # (reference ``splines.py:11-13``); ``xin`` is clipped so the first/last
    # steps are constant and the bin masks are their successive differences:
    # mask_k = [c_k <= xin < c_{k+1}] = s_k - s_{k+1}, s_0 = 1, s_K = 0.
    cref = cumh if inverse else cumw
    ones = jnp.ones_like(x)
    steps = [ones] + [(xin >= cref[k]).astype(x.dtype)
                      for k in range(1, K)] + [jnp.zeros_like(x)]
    # boolean one-hot masks; where-select (not multiply) so a non-finite
    # value in an unselected bin cannot poison other elements via 0*inf
    masks = [(steps[k] - steps[k + 1]) > 0.5 for k in range(K)]

    def select(rows):
        out = jnp.where(masks[0], rows[0], 0.0)
        for k in range(1, K):
            out = out + jnp.where(masks[k], rows[k], 0.0)
        return out

    in_cw = select(cumw[:K])
    in_w = select(widths)
    in_ch = select(cumh[:K])
    in_h = select(heights)
    in_d = min_derivative + jax.nn.softplus(
        select([d_ref[k] for k in range(K)]))
    in_dp1 = min_derivative + jax.nn.softplus(
        select([d_ref[k + 1] for k in range(K)]))
    in_delta = in_h / in_w
    d_sum = in_d + in_dp1 - 2.0 * in_delta

    if inverse:
        dy = xin - in_ch
        a = dy * d_sum + in_h * (in_delta - in_d)
        b = in_h * in_d - dy * d_sum
        c = -in_delta * dy
        disc = jnp.maximum(b * b - 4.0 * a * c, 0.0)
        root = (2.0 * c) / (-b - jnp.sqrt(disc))
        y = root * in_w + in_cw
        t1mt = root * (1.0 - root)
        denom = in_delta + d_sum * t1mt
        dnum = in_delta * in_delta * (
            in_dp1 * root * root + 2.0 * in_delta * t1mt
            + in_d * (1.0 - root) * (1.0 - root))
        ld = -(jnp.log(dnum) - 2.0 * jnp.log(denom))
    else:
        theta = (xin - in_cw) / in_w
        t1mt = theta * (1.0 - theta)
        numer = in_h * (in_delta * theta * theta + in_d * t1mt)
        denom = in_delta + d_sum * t1mt
        y = in_ch + numer / denom
        dnum = in_delta * in_delta * (
            in_dp1 * theta * theta + 2.0 * in_delta * t1mt
            + in_d * (1.0 - theta) * (1.0 - theta))
        ld = jnp.log(dnum) - 2.0 * jnp.log(denom)

    inside = (x >= -tb) & (x <= tb)
    out_ref[...] = jnp.where(inside, y, x)
    ld_ref[...] = jnp.where(inside, ld, 0.0)


def _pallas_impl(x, uw, uh, ud, tb, *, inverse, min_bin_width,
                 min_bin_height, min_derivative, interpret):
    """x (N,), uw/uh (K, N), ud (K+1, N), tb (N,) -> (y (N,), ld (N,))."""
    n = x.shape[0]
    num_bins = uw.shape[0]
    block = _BLOCK_ROWS * _LANES
    n_pad = max(-(-n // block) * block, block)
    if n_pad != n:
        pad = n_pad - n
        # pad with in-interval values so the dropped lanes stay finite
        x = jnp.pad(x, (0, pad))
        tb = jnp.pad(tb, (0, pad), constant_values=1.0)
        uw = jnp.pad(uw, ((0, 0), (0, pad)))
        uh = jnp.pad(uh, ((0, 0), (0, pad)))
        ud = jnp.pad(ud, ((0, 0), (0, pad)))
    rows = n_pad // _LANES
    x2 = x.reshape(rows, _LANES)
    tb2 = tb.reshape(rows, _LANES)
    w3 = uw.reshape(num_bins, rows, _LANES)
    h3 = uh.reshape(num_bins, rows, _LANES)
    d3 = ud.reshape(num_bins + 1, rows, _LANES)

    grid = rows // _BLOCK_ROWS
    kernel = functools.partial(
        _rqs_kernel, num_bins=num_bins, inverse=inverse,
        min_bin_width=min_bin_width, min_bin_height=min_bin_height,
        min_derivative=min_derivative)
    plane = pl.BlockSpec((_BLOCK_ROWS, _LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    stack = lambda k: pl.BlockSpec((k, _BLOCK_ROWS, _LANES),
                                   lambda i: (0, i, 0),
                                   memory_space=pltpu.VMEM)
    y2, ld2 = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[plane, stack(num_bins), stack(num_bins),
                  stack(num_bins + 1), plane],
        out_specs=(plane, plane),
        out_shape=(jax.ShapeDtypeStruct((rows, _LANES), x.dtype),
                   jax.ShapeDtypeStruct((rows, _LANES), x.dtype)),
        interpret=interpret,
    )(x2, w3, h3, d3, tb2)
    return y2.reshape(-1)[:n], ld2.reshape(-1)[:n]


def _dense_impl(x, uw, uh, ud, tb, *, inverse, min_bin_width,
                min_bin_height, min_derivative):
    """Dense jnp reference of the exact kernel semantics (padded derivatives,
    symmetric interval) — used for the custom-VJP backward pass.

    x (N,), uw/uh (N, K), ud (N, K+1), tb (N,).
    """
    from .splines import identity_tail_spline

    return identity_tail_spline(
        x, uw, uh, ud, tb, inverse, min_bin_width=min_bin_width,
        min_bin_height=min_bin_height, min_derivative=min_derivative)


@functools.lru_cache(maxsize=None)
def _make_op(inverse, min_bin_width, min_bin_height, min_derivative,
             interpret):

    def impl(x, uw, uh, ud, tb):
        y, ld = _pallas_impl(
            x, uw.T, uh.T, ud.T, tb, inverse=inverse,
            min_bin_width=min_bin_width, min_bin_height=min_bin_height,
            min_derivative=min_derivative, interpret=interpret)
        return y, ld

    @jax.custom_vjp
    def op(x, uw, uh, ud, tb):
        return impl(x, uw, uh, ud, tb)

    def fwd(x, uw, uh, ud, tb):
        return impl(x, uw, uh, ud, tb), (x, uw, uh, ud, tb)

    def bwd(res, ct):
        x, uw, uh, ud, tb = res
        _, vjp = jax.vjp(
            lambda a, b, c, d: _dense_impl(
                a, b, c, d, tb, inverse=inverse,
                min_bin_width=min_bin_width,
                min_bin_height=min_bin_height,
                min_derivative=min_derivative),
            x, uw, uh, ud)
        gx, gw, gh, gd = vjp(ct)
        return gx, gw, gh, gd, jnp.zeros_like(tb)

    op.defvjp(fwd, bwd)
    return op


@functools.lru_cache(maxsize=None)
def _make_op_kmajor(inverse, min_bin_width, min_bin_height, min_derivative,
                    interpret):
    """Variant taking params already bin-MAJOR: uw/uh (K, N), ud (K+1, N).

    This is the fast feed for conv conditioners: their output
    ``(B, C*3K, H, W)`` views as ``(B, C, 3K, H, W)`` with the bin axis
    already major of the spatial dims, so getting to ``(K, N)`` moves
    contiguous H*W-sized chunks — unlike the minor-dim-8 element shuffles
    of the ``(N, K) -> (K, N)`` transpose the generic path pays
    (measured ~0.32 ms per 64 MB array, 3x the kernel's own time)."""

    def impl(x, uw, uh, ud, tb):
        return _pallas_impl(
            x, uw, uh, ud, tb, inverse=inverse,
            min_bin_width=min_bin_width, min_bin_height=min_bin_height,
            min_derivative=min_derivative, interpret=interpret)

    @jax.custom_vjp
    def op(x, uw, uh, ud, tb):
        return impl(x, uw, uh, ud, tb)

    def fwd(x, uw, uh, ud, tb):
        return impl(x, uw, uh, ud, tb), (x, uw, uh, ud, tb)

    def bwd(res, ct):
        # dense reference works bin-minor; transpose in, transpose the
        # cotangents back out (training backward only)
        x, uw, uh, ud, tb = res
        _, vjp = jax.vjp(
            lambda a, b, c, d: _dense_impl(
                a, b.T, c.T, d.T, tb, inverse=inverse,
                min_bin_width=min_bin_width,
                min_bin_height=min_bin_height,
                min_derivative=min_derivative),
            x, uw, uh, ud)
        gx, gw, gh, gd = vjp(ct)
        return gx, gw, gh, gd, jnp.zeros_like(tb)

    op.defvjp(fwd, bwd)
    return op


def fused_unconstrained_rqs(
    inputs,
    unnormalized_widths,
    unnormalized_heights,
    padded_derivatives,
    tail_bound,
    inverse=False,
    min_bin_width=DEFAULT_MIN_BIN_WIDTH,
    min_bin_height=DEFAULT_MIN_BIN_HEIGHT,
    min_derivative=DEFAULT_MIN_DERIVATIVE,
    interpret=None,
):
    """Fused-kernel unconstrained RQ spline with identity tails.

    ``padded_derivatives`` must already hold all K+1 boundary-adjusted
    derivatives (the tail-type padding of reference ``splines.py:43-56`` is
    done by the caller, so linear/circular/mixed tails all share this
    kernel). ``tail_bound`` broadcasts to ``inputs``. Differentiable via a
    custom VJP that reruns the dense path backward.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    shape = inputs.shape
    num_bins = unnormalized_widths.shape[-1]
    n = int(np.prod(shape)) if shape else 1
    x = inputs.reshape(n)
    tb = jnp.broadcast_to(jnp.asarray(tail_bound, inputs.dtype),
                          shape).reshape(n)
    uw = unnormalized_widths.reshape(n, num_bins)
    uh = unnormalized_heights.reshape(n, num_bins)
    ud = padded_derivatives.reshape(n, num_bins + 1)
    op = _make_op(bool(inverse), float(min_bin_width),
                  float(min_bin_height), float(min_derivative),
                  bool(interpret))
    y, ld = op(x, uw, uh, ud, tb)
    return y.reshape(shape), ld.reshape(shape)


def fused_unconstrained_rqs_kmajor(
    inputs,
    unnormalized_widths,
    unnormalized_heights,
    padded_derivatives,
    tail_bound,
    inverse=False,
    min_bin_width=DEFAULT_MIN_BIN_WIDTH,
    min_bin_height=DEFAULT_MIN_BIN_HEIGHT,
    min_derivative=DEFAULT_MIN_DERIVATIVE,
    interpret=None,
):
    """Like :func:`fused_unconstrained_rqs` but with the bin axis MAJOR:
    ``unnormalized_widths``/``heights`` shaped ``(K, *inputs.shape)`` and
    ``padded_derivatives`` ``(K+1, *inputs.shape)`` — no feed transpose
    (see :func:`_make_op_kmajor`)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    shape = inputs.shape
    num_bins = unnormalized_widths.shape[0]
    n = int(np.prod(shape)) if shape else 1
    x = inputs.reshape(n)
    tb = jnp.broadcast_to(jnp.asarray(tail_bound, inputs.dtype),
                          shape).reshape(n)
    uw = unnormalized_widths.reshape(num_bins, n)
    uh = unnormalized_heights.reshape(num_bins, n)
    ud = padded_derivatives.reshape(num_bins + 1, n)
    op = _make_op_kmajor(bool(inverse), float(min_bin_width),
                         float(min_bin_height), float(min_derivative),
                         bool(interpret))
    y, ld = op(x, uw, uh, ud, tb)
    return y.reshape(shape), ld.reshape(shape)
