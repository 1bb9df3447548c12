"""Fused conditioner-head + RQ-spline kernel: prototype + A/B + roofline.

Round-4 verdict asked for one of two outcomes on the as-fed spline feed
(pinned 2.07 Gelem/s vs the 5.6 Gelem/s kernel body):

  (a) compute the bin-major head's final matmul INSIDE the Pallas kernel so
      the 3K+1 spline-parameter planes never round-trip HBM, and show the
      as-fed number >=2x; or
  (b) bound 2.07 as the as-fed speed-of-light with a same-footprint copy
      kernel.

This experiment does BOTH measurements:

``roofline``: re-runs the suite's exact as-fed bin-major body
(fresh ``(K, N)`` params per chain step -> pad -> fused spline kernel) next
to a SAME-FOOTPRINT copy chain (identical producer, identical pad, and a
copy kernel with the spline kernel's exact in/out specs that reads every
plane and writes both outputs). If spline ~= copy, 2.07 is the measured
HBM speed-of-light of that op structure, and only removing planes (fusion)
can beat it.

``fused``: prototypes (a). The model path today is
``params = W @ h^T`` (head GEMM, ``nets/mlp.py Linear.call_transposed``)
-> ``(3K+1, D, B)`` plane view -> fused spline (``flows/neural_spline/
feed.py``). The fused kernel keeps that EXACT layout but runs the GEMM in
VMEM per batch block: per grid step it loads an ``(H, BLOCK_B)`` slab of
hidden activations plus the whole ``(M, H)`` head weight (M = (3K-1)*D for
linear tails), computes ``params = W @ h_blk`` on the MXU, row-slices the
``(D, BLOCK_B)`` per-bin planes (static, contiguous — zero relayout), and
evaluates the shared spline plane math. HBM traffic per element drops from
``H/D + 2*(3K+1) + 3`` planes to ``H/D + 3``.

A/B is against the exact unfused model path (XLA GEMM + k-major spline
kernel) with the same fresh-``h`` producer in both arms, exact-f32 matmul
precision both sides (reference formulas: normflows/utils/splines.py:
100-219; head feed: docs/kernels.md).

Usage: python benchmarks/exp_fused_head.py [roofline] [fused] [check]
"""

import functools
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/tmp/nf_tpu_jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from bench_suite import timed_chain
from nf_tpu.ops import splines
from nf_tpu.ops.splines_pallas import (
    _BLOCK_ROWS,
    _LANES,
    _block_specs,
    _pad_reshape,
    _rqs_math,
)

HERE = os.path.dirname(os.path.abspath(__file__))
OUT = os.path.join(HERE, "out")

# benchmark shapes: N = D*B = 2M spline elements, hidden width H, K bins —
# the suite's as-fed row at the same N/K, with a model-realistic head
D, B, H, K = 8, 1 << 18, 128, 8
TB = 2.5


# ----------------------------------------------------- fused head kernel ---
def _rqs_head_kernel(h_ref, w_ref, b_ref, x_ref, out_ref, ld_ref, *,
                     num_bins, feats, inverse, tail_bound, min_bin_width,
                     min_bin_height, min_derivative):
    """params = W @ h_blk + b in VMEM; spline planes are static row slices.

    ``h_ref`` (H, BLOCK_B), ``w_ref`` (M, H) with rows bin-major
    (plane p rows p*D..(p+1)*D — the layout bin-major heads already emit),
    ``b_ref`` (M, 128) lane-broadcast bias, ``x_ref`` (D, BLOCK_B).
    Linear tails: the two boundary derivative planes are the softplus-inverse
    constant, synthesized in VMEM (no HBM rows for them at all).
    """
    Kb, Dn = num_bins, feats
    params = jnp.dot(w_ref[...], h_ref[...],
                     preferred_element_type=jnp.float32)
    params = params + b_ref[:, 0:1]

    def plane(p):
        return params[p * Dn:(p + 1) * Dn]

    w = [plane(k) for k in range(Kb)]
    h = [plane(Kb + k) for k in range(Kb)]
    d_in = [plane(2 * Kb + k) for k in range(Kb - 1)]
    c = float(np.log(np.exp(1.0 - min_derivative) - 1.0))
    edge = jnp.full_like(x_ref[...], c)
    d = [edge] + d_in + [edge]
    y, ld = _rqs_math(
        x_ref[...], w, h, d, tail_bound, num_bins=Kb, inverse=inverse,
        min_bin_width=min_bin_width, min_bin_height=min_bin_height,
        min_derivative=min_derivative)
    out_ref[...] = y
    ld_ref[...] = ld


def fused_head_rqs(x_t, h_t, w, b, *, num_bins=K, tail_bound=TB,
                   inverse=False, block_b=2048, interpret=None,
                   min_bin_width=splines.DEFAULT_MIN_BIN_WIDTH,
                   min_bin_height=splines.DEFAULT_MIN_BIN_HEIGHT,
                   min_derivative=splines.DEFAULT_MIN_DERIVATIVE):
    """x_t (D, B), h_t (H, B), w ((3K-1)*D, H) bin-major rows, b ((3K-1)*D,)
    -> (y (D, B), ld (D, B)). Forward prototype, linear tails, scalar tb."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    feats, batch = x_t.shape
    hidden = h_t.shape[0]
    m = w.shape[0]
    assert m == (3 * num_bins - 1) * feats and h_t.shape[1] == batch
    assert batch % block_b == 0, (batch, block_b)
    grid = (batch // block_b,)
    bb = jnp.broadcast_to(b[:, None], (m, 128)).astype(x_t.dtype)
    kernel = functools.partial(
        _rqs_head_kernel, num_bins=num_bins, feats=feats, inverse=inverse,
        tail_bound=float(tail_bound), min_bin_width=min_bin_width,
        min_bin_height=min_bin_height, min_derivative=min_derivative)
    y, ld = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((hidden, block_b), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((m, hidden), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((m, 128), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((feats, block_b), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((feats, block_b), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((feats, block_b), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(jax.ShapeDtypeStruct((feats, batch), x_t.dtype),
                   jax.ShapeDtypeStruct((feats, batch), x_t.dtype)),
        interpret=interpret,
    )(h_t, w, bb, x_t)
    return y, ld


def unfused_head_rqs(x_t, h_t, w, b, *, num_bins=K, tail_bound=TB,
                     inverse=False):
    """The exact current model path: XLA head GEMM (call_transposed
    semantics) -> (mult, D, B) plane view -> k-major fused spline kernel."""
    feats, batch = x_t.shape
    params = jnp.dot(w, h_t, preferred_element_type=x_t.dtype) + b[:, None]
    pr = params.reshape(3 * num_bins - 1, feats, batch)
    uw, uh, ud = pr[:num_bins], pr[num_bins:2 * num_bins], pr[2 * num_bins:]
    return splines.unconstrained_rational_quadratic_spline_kmajor(
        x_t, uw, uh, ud, inverse=inverse, tails="linear",
        tail_bound=tail_bound)


def make_inputs(key, d=D, batch=B, hidden=H, num_bins=K):
    ks = jax.random.split(key, 4)
    x_t = jax.random.normal(ks[0], (d, batch)) * 2.0
    h_t = jax.random.normal(ks[1], (hidden, batch))
    m = (3 * num_bins - 1) * d
    w = jax.random.normal(ks[2], (m, hidden)) * (0.3 / np.sqrt(hidden))
    b = jax.random.normal(ks[3], (m,)) * 0.1
    return x_t, h_t, w, b


def cmd_check():
    """Fused == unfused numerics (exact f32 both sides)."""
    x_t, h_t, w, b = make_inputs(jax.random.PRNGKey(0), batch=4096)
    with jax.default_matmul_precision("float32"):
        y1, l1 = jax.jit(lambda *a: fused_head_rqs(*a, block_b=2048))(
            x_t, h_t, w, b)
        y2, l2 = jax.jit(unfused_head_rqs)(x_t, h_t, w, b)
    dy = float(jnp.max(jnp.abs(y1 - y2)))
    dl = float(jnp.max(jnp.abs(l1 - l2)))
    print(f"check: max|dy|={dy:.3e} max|dld|={dl:.3e}")
    assert dy < 1e-4 and dl < 1e-3, (dy, dl)
    # inverse direction too
    with jax.default_matmul_precision("float32"):
        y1, l1 = jax.jit(lambda *a: fused_head_rqs(
            *a, block_b=2048, inverse=True))(x_t, h_t, w, b)
        y2, l2 = jax.jit(lambda *a: unfused_head_rqs(
            *a, inverse=True))(x_t, h_t, w, b)
    dy = float(jnp.max(jnp.abs(y1 - y2)))
    dl = float(jnp.max(jnp.abs(l1 - l2)))
    print(f"check(inverse): max|dy|={dy:.3e} max|dld|={dl:.3e}")
    assert dy < 1e-4 and dl < 1e-3, (dy, dl)
    print("CHECK OK")


def cmd_fused(results):
    """A/B: fused head+spline vs the unfused model path, same fresh-h
    producer and carry structure, f32."""
    x0, h_t0, w, b = make_inputs(jax.random.PRNGKey(1))
    n = D * B

    def body_fused(block_b):
        def body(c):
            h_t = h_t0 + c[0, 0] * 1e-12  # fresh activations every step
            y, ld = fused_head_rqs(c, h_t, w, b, block_b=block_b)
            return jnp.clip(y + ld * 1e-9, -3.0, 3.0)
        return body

    def body_unfused(c):
        h_t = h_t0 + c[0, 0] * 1e-12
        y, ld = unfused_head_rqs(c, h_t, w, b)
        return jnp.clip(y + ld * 1e-9, -3.0, 3.0)

    dt = timed_chain(body_unfused, x0, 16, label="head_unfused")
    results["head_spline_unfused"] = dict(
        value=round(n / dt / 1e9, 3), unit="Gelem/s", D=D, B=B, H=H, K=K)
    print(f"unfused (XLA GEMM + kmajor kernel): {n / dt / 1e9:.2f} Gelem/s")
    for block_b in (1024, 2048, 4096):
        dt = timed_chain(body_fused(block_b), x0, 16,
                         label=f"head_fused_{block_b}")
        results[f"head_spline_fused_b{block_b}"] = dict(
            value=round(n / dt / 1e9, 3), unit="Gelem/s", D=D, B=B, H=H, K=K)
        print(f"fused (GEMM in kernel, block_b={block_b}): "
              f"{n / dt / 1e9:.2f} Gelem/s")


# ------------------------------------------------ as-fed copy roofline ---
def _copy_kernel(x_ref, w_ref, h_ref, d_ref, tb_ref, out_ref, ld_ref, *,
                 num_bins):
    """Same in/out specs as the spline kernel; touches every input plane
    with one add each (so nothing is DCE'd) and writes both outputs —
    the pure-stream bound of the as-fed footprint."""
    acc = x_ref[...] + tb_ref[...]
    for k in range(num_bins):
        acc = acc + w_ref[k] + h_ref[k]
    for k in range(num_bins + 1):
        acc = acc + d_ref[k]
    out_ref[...] = acc
    ld_ref[...] = x_ref[...]


def _copy_impl(x, uw, uh, ud, tb):
    n = x.shape[0]
    num_bins = uw.shape[0]
    (x2, w3, h3, d3, tb2), rows = _pad_reshape(x, uw, uh, ud, tb)
    plane, stack = _block_specs(num_bins)
    y2, ld2 = pl.pallas_call(
        functools.partial(_copy_kernel, num_bins=num_bins),
        grid=(rows // _BLOCK_ROWS,),
        in_specs=[plane, stack(num_bins), stack(num_bins),
                  stack(num_bins + 1), plane],
        out_specs=(plane, plane),
        out_shape=(jax.ShapeDtypeStruct((rows, _LANES), x.dtype),
                   jax.ShapeDtypeStruct((rows, _LANES), x.dtype)),
        interpret=jax.default_backend() != "tpu",
    )(x2, w3, h3, d3, tb2)
    return y2.reshape(-1)[:n], ld2.reshape(-1)[:n]


def cmd_roofline(results):
    """The suite's as-fed bin-major body vs the same-footprint copy chain."""
    n = D * B
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 4)
    uw_t = jax.random.normal(ks[1], (K, n))
    uh_t = jax.random.normal(ks[2], (K, n))
    ud_t = jax.random.normal(ks[3], (K - 1, n))
    x0 = jax.random.normal(ks[0], (n,)) * 3
    c = float(np.log(np.exp(1 - splines.DEFAULT_MIN_DERIVATIVE) - 1))

    def body_spline(x):
        eps = x[None, :] * 1e-12
        y, ld = splines.unconstrained_rational_quadratic_spline_kmajor(
            x, uw_t + eps, uh_t + eps, ud_t + eps, tails="linear",
            tail_bound=TB)
        return jnp.clip(y + ld * 1e-9, -3.0, 3.0)

    def body_copy(x):
        # identical producer + identical tail-pad concat, copy-kernel sink
        eps = x[None, :] * 1e-12
        w, h, d = uw_t + eps, uh_t + eps, ud_t + eps
        edge = jnp.full_like(d[:1], c)
        d = jnp.concatenate([edge, d, edge], axis=0)
        tb = jnp.broadcast_to(jnp.asarray(TB, x.dtype), x.shape)
        y, ld = _copy_impl(x, w, h, d, tb)
        return jnp.clip(y + ld * 1e-9, -3.0, 3.0)

    dt = timed_chain(body_spline, x0, 16, label="asfed_spline")
    results["asfed_kmajor_spline"] = dict(value=round(n / dt / 1e9, 3),
                                          unit="Gelem/s", elements=n, K=K)
    print(f"as-fed k-major spline: {n / dt / 1e9:.2f} Gelem/s")
    dt = timed_chain(body_copy, x0, 16, label="asfed_copy")
    results["asfed_kmajor_copy"] = dict(value=round(n / dt / 1e9, 3),
                                        unit="Gelem/s", elements=n, K=K)
    print(f"as-fed same-footprint copy: {n / dt / 1e9:.2f} Gelem/s")


def main():
    what = set(sys.argv[1:]) or {"check", "roofline", "fused"}
    results = {}
    if "check" in what:
        cmd_check()
    if "roofline" in what:
        cmd_roofline(results)
    if "fused" in what:
        cmd_fused(results)
    if results:
        os.makedirs(OUT, exist_ok=True)
        path = os.path.join(OUT, "fused_head.json")
        merged = {}
        if os.path.exists(path):
            with open(path) as f:
                merged = json.load(f)
        merged.update(results)
        with open(path, "w") as f:
            json.dump(merged, f, indent=2)
        print("wrote", path)


if __name__ == "__main__":
    main()
