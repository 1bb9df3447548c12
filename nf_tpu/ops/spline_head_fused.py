"""Fused conditioner-head + RQ-spline Pallas kernel (fwd + analytic bwd).

The bin-major conditioner head already emits spline parameters as
``params = W @ h^T`` with rows param-major (``nets/mlp.py
Linear.call_transposed``) — a zero-copy view of the spline kernel's
``(K, N)`` plane layout. This op moves that LAST matmul inside the Pallas
kernel: per batch block it loads an ``(H, BLOCK_B)`` slab of hidden
activations plus the whole ``(M, H)`` head weight, computes the params on
the MXU **in VMEM**, row-slices the ``(D, BLOCK_B)`` per-bin planes
(static, contiguous — no relayout), and evaluates the shared spline plane
math (``splines_pallas._rqs_math``). The 3K+1 parameter planes never
round-trip HBM: per-element traffic drops from ``H/D + 2*(3K+1) + 3``
planes to ``H/D + 3``.

Measured (v5e, f32, D=8 B=256k H=128 K=8, two-point chain fit,
``benchmarks/exp_fused_head.py``): 3.57 Gelem/s vs 1.11 for the exact
unfused model path (XLA head GEMM + k-major spline kernel) — 3.2x — and
vs the 2.07 as-fed row whose same-footprint copy bound is 2.23 (i.e. the
unfused feed was already at ~94% of its speed-of-light; only removing the
planes could beat it).

The backward is fused too: it recomputes ``params`` (one more MXU pass —
cheaper than storing 3K+1 planes as residuals), runs the hand-derived
analytic spline transpose (``splines_pallas._rqs_bwd_math``), assembles
the parameter cotangent planes in VMEM scratch, and emits

* ``gx``   per block (spline input cotangent),
* ``gh = W^T @ gparams`` per block (flows back into the conditioner),
* ``gW = gparams @ h^T`` and ``gb = sum(gparams)`` accumulated across the
  sequential grid in revisited output blocks.

Reference semantics: ``normflows/utils/splines.py:100-219`` (the spline),
``normflows/flows/neural_spline/coupling.py:321-327`` (the 3K+1 per-feature
parameterization the head rows carry).
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
)
from .splines_pallas import _rqs_bwd_math, _rqs_math

_DEF_BLOCK_B = 2048  # lanes per grid step; VMEM ~ (2*(3K)D + H) * 4B * this

# trace-time mode: "auto" = fused on TPU for N >= threshold, "on" = always
# (interpreter off-TPU; used by the CPU tests), "off" = never.
_MODE = "auto"
_MIN_ELEMENTS = 4096


def set_fused_head_mode(mode: str) -> None:
    """Select dispatch for the fused head+spline kernel: ``"auto"``
    (default: TPU and ``B*D >= 4096``), ``"on"`` (force; interpreter mode
    off-TPU — CPU tests), ``"off"`` (always the unfused feed). Trace-time
    read, like ``splines.set_pallas_enabled``."""
    if mode not in ("auto", "on", "off"):
        raise ValueError(f"unknown fused-head mode: {mode!r}")
    global _MODE
    _MODE = mode


def fused_head_wanted(n_elements: int) -> bool:
    """Dispatch decision for the model feeds (trace-time). The global
    ``splines.set_pallas_enabled(False)`` A/B switch disables this kernel
    too — it IS a Pallas kernel, and the A/B scripts rely on that switch
    forcing the dense path."""
    from . import splines

    if _MODE == "off" or not splines._PALLAS_ENABLED:
        return False
    if _MODE == "on":
        return True
    return (jax.default_backend() == "tpu"
            and n_elements >= _MIN_ELEMENTS)


def _dplanes(num_bins, tails):
    """Number of derivative rows the effective head weight carries."""
    return num_bins - 1 if tails == "linear" else num_bins


def _build_d_list(d_in, x_like, num_bins, tails, min_derivative):
    """K+1 boundary-adjusted derivative planes from the effective rows:
    linear pads both ends with the softplus-inverse-of-1 constant
    (synthesized in VMEM — those planes cost no HBM at all), circular
    closes the circle with plane 0 (reference ``splines.py:43-56``)."""
    if tails == "linear":
        c = float(np.log(np.exp(1.0 - min_derivative) - 1.0))
        edge = jnp.full_like(x_like, c)
        return [edge] + d_in + [edge]
    return d_in + [d_in[0]]


def _head_kernel(h_ref, w_ref, b_ref, x_ref, tb_ref, out_ref, ld_ref, *,
                 num_bins, feats, tails, inverse, min_bin_width,
                 min_bin_height, min_derivative):
    K, D = num_bins, feats
    params = jnp.dot(w_ref[...], h_ref[...],
                     preferred_element_type=h_ref.dtype)
    params = params + b_ref[:, 0:1]

    def plane(p):
        return params[p * D:(p + 1) * D]

    w = [plane(k) for k in range(K)]
    h = [plane(K + k) for k in range(K)]
    d = _build_d_list([plane(2 * K + k) for k in range(_dplanes(K, tails))],
                      x_ref[...], K, tails, min_derivative)
    tb = tb_ref[:, 0:1]
    y, ld = _rqs_math(
        x_ref[...], w, h, d, tb, num_bins=K, inverse=inverse,
        min_bin_width=min_bin_width, min_bin_height=min_bin_height,
        min_derivative=min_derivative)
    out_ref[...] = y
    ld_ref[...] = ld


def _head_bwd_kernel(h_ref, w_ref, b_ref, x_ref, tb_ref, cty_ref, ctl_ref,
                     gx_ref, gh_ref, gw_ref, gb_ref, gp_scratch, *,
                     num_bins, feats, tails, inverse, min_bin_width,
                     min_bin_height, min_derivative):
    K, D = num_bins, feats
    nd = _dplanes(K, tails)
    m = (2 * K + nd) * D
    params = jnp.dot(w_ref[...], h_ref[...],
                     preferred_element_type=h_ref.dtype)
    params = params + b_ref[:, 0:1]

    def plane(p):
        return params[p * D:(p + 1) * D]

    w = [plane(k) for k in range(K)]
    h = [plane(K + k) for k in range(K)]
    d = _build_d_list([plane(2 * K + k) for k in range(nd)],
                      x_ref[...], K, tails, min_derivative)
    tb = tb_ref[:, 0:1]
    gx, gw, gh, gd = _rqs_bwd_math(
        x_ref[...], w, h, d, tb, cty_ref[...], ctl_ref[...],
        num_bins=K, inverse=inverse, min_bin_width=min_bin_width,
        min_bin_height=min_bin_height, min_derivative=min_derivative)
    gx_ref[...] = gx

    # parameter-cotangent planes -> effective head rows (VMEM scratch)
    if tails == "linear":
        gd_eff = [gd[j + 1] for j in range(nd)]  # boundary planes are
        # synthesized constants: no head rows, no gradient (matches the
        # unfused path, where slice_ud_planes drops them)
    else:
        gd_eff = [gd[0] + gd[K]] + [gd[j] for j in range(1, K)]
    for k in range(K):
        gp_scratch[k * D:(k + 1) * D] = gw[k]
        gp_scratch[(K + k) * D:(K + k + 1) * D] = gh[k]
    for j in range(nd):
        gp_scratch[(2 * K + j) * D:(2 * K + j + 1) * D] = gd_eff[j]
    gparams = gp_scratch[...]

    # conditioner cotangent: gh = W^T @ gparams (per block)
    gh_ref[...] = jax.lax.dot_general(
        w_ref[...], gparams, (((0,), (0,)), ((), ())),
        preferred_element_type=h_ref.dtype)

    # weight/bias cotangents accumulate across the sequential grid
    gw_part = jax.lax.dot_general(
        gparams, h_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=h_ref.dtype)
    gb_part = jnp.broadcast_to(
        jnp.sum(gparams, axis=1, keepdims=True), (m, 128))

    @pl.when(pl.program_id(0) == 0)
    def _():
        gw_ref[...] = gw_part
        gb_ref[...] = gb_part

    @pl.when(pl.program_id(0) > 0)
    def _():
        gw_ref[...] = gw_ref[...] + gw_part
        gb_ref[...] = gb_ref[...] + gb_part


def _pad_b(arrs, batch, block_b):
    pad = (-batch) % block_b
    if pad == 0:
        return arrs, batch
    return tuple(jnp.pad(a, ((0, 0), (0, pad))) for a in arrs), batch + pad


def _common_specs(hidden, m, feats, block_b):
    blk = lambda rows: pl.BlockSpec((rows, block_b), lambda j: (0, j),
                                    memory_space=pltpu.VMEM)
    const = lambda shape: pl.BlockSpec(shape, lambda j: (0, 0),
                                       memory_space=pltpu.VMEM)
    return blk, const


@functools.lru_cache(maxsize=None)
def _make_op(num_bins, feats, tails, inverse, min_bin_width, min_bin_height,
             min_derivative, block_b, interpret):
    K, D = num_bins, feats
    nd = _dplanes(K, tails)
    m = (2 * K + nd) * D
    kw = dict(num_bins=K, feats=D, tails=tails, inverse=inverse,
              min_bin_width=min_bin_width, min_bin_height=min_bin_height,
              min_derivative=min_derivative)

    def fwd_impl(x_t, h_t, w, b, tb):
        batch = x_t.shape[1]
        hidden = h_t.shape[0]
        (h2, x2), bpad = _pad_b((h_t, x_t), batch, block_b)
        blk, const = _common_specs(hidden, m, D, block_b)
        bb = jnp.broadcast_to(b[:, None], (m, 128)).astype(x_t.dtype)
        tbb = jnp.broadcast_to(
            jnp.asarray(tb, x_t.dtype).reshape(-1, 1), (D, 128))
        y, ld = pl.pallas_call(
            functools.partial(_head_kernel, **kw),
            grid=(bpad // block_b,),
            in_specs=[blk(hidden), const((m, hidden)), const((m, 128)),
                      blk(D), const((D, 128))],
            out_specs=(blk(D), blk(D)),
            out_shape=(jax.ShapeDtypeStruct((D, bpad), x_t.dtype),
                       jax.ShapeDtypeStruct((D, bpad), x_t.dtype)),
            interpret=interpret,
        )(h2, w, bb, x2, tbb)
        return y[:, :batch], ld[:, :batch]

    def bwd_impl(x_t, h_t, w, b, tb, cty, ctl):
        batch = x_t.shape[1]
        hidden = h_t.shape[0]
        (h2, x2, cty2, ctl2), bpad = _pad_b((h_t, x_t, cty, ctl), batch,
                                            block_b)
        blk, const = _common_specs(hidden, m, D, block_b)
        bb = jnp.broadcast_to(b[:, None], (m, 128)).astype(x_t.dtype)
        tbb = jnp.broadcast_to(
            jnp.asarray(tb, x_t.dtype).reshape(-1, 1), (D, 128))
        gx, gh, gw, gb = pl.pallas_call(
            functools.partial(_head_bwd_kernel, **kw),
            grid=(bpad // block_b,),
            in_specs=[blk(hidden), const((m, hidden)), const((m, 128)),
                      blk(D), const((D, 128)), blk(D), blk(D)],
            out_specs=(blk(D), blk(hidden), const((m, hidden)),
                       const((m, 128))),
            out_shape=(
                jax.ShapeDtypeStruct((D, bpad), x_t.dtype),
                jax.ShapeDtypeStruct((hidden, bpad), x_t.dtype),
                jax.ShapeDtypeStruct((m, hidden), x_t.dtype),
                jax.ShapeDtypeStruct((m, 128), x_t.dtype),
            ),
            scratch_shapes=[pltpu.VMEM((m, block_b), x_t.dtype)],
            interpret=interpret,
        )(h2, w, bb, x2, tbb, cty2, ctl2)
        return gx[:, :batch], gh[:, :batch], gw, gb[:, 0]

    @jax.custom_vjp
    def op(x_t, h_t, w, b, tb):
        return fwd_impl(x_t, h_t, w, b, tb)

    def fwd(x_t, h_t, w, b, tb):
        return fwd_impl(x_t, h_t, w, b, tb), (x_t, h_t, w, b, tb)

    def bwd(res, ct):
        x_t, h_t, w, b, tb = res
        gx, gh, gw, gb = bwd_impl(x_t, h_t, w, b, tb, ct[0], ct[1])
        return gx, gh, gw, gb, jnp.zeros_like(jnp.asarray(tb))

    op.defvjp(fwd, bwd)
    return op


def fused_head_rqs(
    x_t,
    h_t,
    head_weight,
    head_bias,
    *,
    num_bins,
    tails="linear",
    tail_bound=1.0,
    inverse=False,
    min_bin_width=DEFAULT_MIN_BIN_WIDTH,
    min_bin_height=DEFAULT_MIN_BIN_HEIGHT,
    min_derivative=DEFAULT_MIN_DERIVATIVE,
    block_b=_DEF_BLOCK_B,
    interpret=None,
):
    """Head GEMM + unconstrained RQ spline in one kernel.

    ``x_t`` (D, B) feature-major inputs; ``h_t`` (H, B) transposed hidden
    activations (``net.features_transposed``); ``head_weight``
    ((2K+nd)*D, H) the EFFECTIVE bin-major head rows (widths, heights, then
    the nd = K-1 interior / K circular derivative rows — softmax_scale
    already folded in); ``head_bias`` matching ((2K+nd)*D,).
    ``tails``: 'linear' or 'circular' (homogeneous; callers gate mixed
    specs to the unfused feed). ``tail_bound``: scalar or per-feature
    ``(D,)``. Returns ``(y (D, B), log_det (D, B))``; differentiable via
    the fused analytic backward (cotangents for x, h, W, b).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    feats, batch = x_t.shape
    if head_bias is None:
        head_bias = jnp.zeros((head_weight.shape[0],), x_t.dtype)
    tb = jnp.broadcast_to(jnp.asarray(tail_bound, x_t.dtype).reshape(-1),
                          (feats,))
    op = _make_op(int(num_bins), int(feats), str(tails), bool(inverse),
                  float(min_bin_width), float(min_bin_height),
                  float(min_derivative), int(min(block_b, _round_block(batch))),
                  bool(interpret))
    return op(x_t, h_t, head_weight, head_bias, tb)


def _round_block(batch):
    """Largest sane block for small batches (keeps padding <= one block)."""
    b = 128
    while b < _DEF_BLOCK_B and b < batch:
        b *= 2
    return b


def effective_head(weight, bias, *, num_bins, feats, tails, softmax_scale):
    """Fold the width/height softmax scale into the head rows (the unfused
    feed multiplies the uw/uh planes by it, ``feed.kmajor_spline_feed``:
    ``s*(W@h+b) == (s*W)@h + s*b``).

    Homogeneous-tail heads already emit exactly the kernel's effective row
    count (mult = 3K-1 linear / 3K circular — see
    ``PiecewiseRationalQuadraticCoupling.create``), so no slicing is
    needed. Both outputs are ordinary traced functions of the head
    parameters, so autodiff routes the kernel's cotangents back through
    the scaling."""
    K, D = num_bins, feats
    if bias is None:
        bias = jnp.zeros((weight.shape[0],), weight.dtype)
    assert weight.shape[0] == (2 * K + _dplanes(K, tails)) * D, weight.shape
    wh_rows = 2 * K * D
    if softmax_scale == 1.0:
        return weight, bias
    w_eff = jnp.concatenate(
        [weight[:wh_rows] * softmax_scale, weight[wh_rows:]], axis=0)
    b_eff = jnp.concatenate(
        [bias[:wh_rows] * softmax_scale, bias[wh_rows:]], axis=0)
    return w_eff, b_eff
