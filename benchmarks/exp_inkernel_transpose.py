"""Can the RQ-spline kernel take (N, K) params directly and relayout
in VMEM, instead of paying XLA's HBM->HBM transposes?

Measures three kernels over the same 2M x 8 f32 operand:
  A. baseline: pre-transposed (K, R, 128) input, sum planes (pure read);
  B. natural (BLOCK, K) input + in-kernel jnp.transpose -> per-bin planes;
  C. XLA-side transpose feeding kernel A (what the real model path pays) —
     with the transpose input made loop-VARYING so constant folding cannot
     hide it (mirrors conditioner-produced params).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bench_suite import _best_wall, compile_scan_chain, warmup_with_retries
from nf_tpu.utils.profiling import enable_compilation_cache

N = 1 << 21
K = 8
BR = 32
BLOCK = BR * 128
ROWS = N // 128


def kern_pre(w_ref, out_ref):
    acc = w_ref[0]
    for k in range(1, K):
        acc = acc + w_ref[k] * float(k)
    out_ref[...] = acc


def kern_nat(w_ref, out_ref):
    w = w_ref[...]                      # (BLOCK, K)
    wt = jnp.transpose(w)               # (K, BLOCK) in-VMEM relayout
    planes = wt.reshape(K, BR, 128)
    acc = planes[0]
    for k in range(1, K):
        acc = acc + planes[k] * float(k)
    out_ref[...] = acc


def run_pre(w3):
    plane = pl.BlockSpec((BR, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    stack = pl.BlockSpec((K, BR, 128), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM)
    return pl.pallas_call(kern_pre, grid=(ROWS // BR,), in_specs=[stack],
                          out_specs=plane,
                          out_shape=jax.ShapeDtypeStruct((ROWS, 128),
                                                         jnp.float32))(w3)


def run_nat(w2):
    blk = pl.BlockSpec((BLOCK, K), lambda i: (i, 0),
                       memory_space=pltpu.VMEM)
    plane = pl.BlockSpec((BR, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    return pl.pallas_call(kern_nat, grid=(N // BLOCK,), in_specs=[blk],
                          out_specs=plane,
                          out_shape=jax.ShapeDtypeStruct((ROWS, 128),
                                                         jnp.float32))(w2)


def bench(name, body, x0, reps=16):
    c1 = compile_scan_chain(body, reps)
    c2 = compile_scan_chain(body, 4 * reps)
    warmup_with_retries(c1, x0)
    warmup_with_retries(c2, x0)
    t1, t2 = _best_wall(c1, x0), _best_wall(c2, x0)
    d = (t2 - t1) / (3 * reps)
    if d <= 0:
        d = t2 / (4 * reps)
    print(f"{name:36s} {d*1e3:7.3f} ms/app  {N/d/1e9:6.2f} Gelem/s",
          flush=True)


def main():
    enable_compilation_cache()
    print("backend:", jax.default_backend(), flush=True)
    key = jax.random.PRNGKey(0)
    w2 = jax.random.normal(key, (N, K))
    w3 = (w2.T.reshape(K, ROWS, 128) + 0.0).block_until_ready()

    # A: pre-transposed; carry a (ROWS,128) plane, add into w3's first plane
    def body_a(x):
        y = run_pre(w3.at[0].add(x * 1e-12))
        return jnp.tanh(y * 1e-6) + x * 0.999

    bench("A pre-transposed (K,R,128) read", body_a, jnp.zeros((ROWS, 128)))

    # B: natural layout + in-kernel transpose; same varying carry
    def body_b(x):
        y = run_nat(w2.at[:, 0].add(x.reshape(-1) * 1e-12))
        return jnp.tanh(y * 1e-6) + x * 0.999

    bench("B natural (N,K) + in-kernel T", body_b, jnp.zeros((ROWS, 128)))

    # C: XLA transpose per iteration (loop-varying input, no const fold)
    def body_c(x):
        wv = w2.at[:, 0].add(x.reshape(-1) * 1e-12)
        w3v = wv.T.reshape(K, ROWS, 128)
        y = run_pre(w3v)
        return jnp.tanh(y * 1e-6) + x * 0.999

    bench("C XLA transpose feeding A", body_c, jnp.zeros((ROWS, 128)))
    bench_kmajor_feed()


def bench_kmajor_feed():
    """Model-realistic feed comparison: params start in the conv output
    layout (B, C, 3K, H, W), loop-varying. Generic path: relayout to
    (..., K) minor then (N,K)->(K,N) transpose. K-major path: one
    chunk-contiguous transpose to (3K, B, C, H, W), no elementwise
    shuffles."""
    from nf_tpu.ops import splines

    b, c, h, w = 64, 8, 32, 32
    K = 8
    key = jax.random.PRNGKey(0)
    conv_out = jax.random.normal(key, (b, c, 3 * K - 1, h, w))
    x0 = jax.random.normal(key, (b, c, h, w)) * 2

    def body_generic(x):
        p = conv_out + x[:, :, None] * 1e-12
        p = jnp.transpose(p, (0, 1, 3, 4, 2))  # bin-minor relayout
        uw, uh = p[..., :K], p[..., K:2 * K]
        ud = p[..., 2 * K:]
        y, ld = splines.unconstrained_rational_quadratic_spline(
            x, uw, uh, ud, tails="linear", tail_bound=3.0, use_pallas=True)
        return jnp.clip(y + ld * 1e-9, -3.0, 3.0)

    def body_kmajor(x):
        p = conv_out + x[:, :, None] * 1e-12
        p = jnp.transpose(p, (2, 0, 1, 3, 4))  # chunk moves only
        uw, uh = p[:K], p[K:2 * K]
        ud = p[2 * K:]
        y, ld = splines.unconstrained_rational_quadratic_spline_kmajor(
            x, uw, uh, ud, tails="linear", tail_bound=3.0, use_pallas=True)
        return jnp.clip(y + ld * 1e-9, -3.0, 3.0)

    n = x0.size
    for name, body in (("generic feed (bin-minor + transpose)",
                        body_generic),
                       ("k-major feed (chunk moves)", body_kmajor)):
        reps = 16
        c1 = compile_scan_chain(body, reps)
        c2 = compile_scan_chain(body, 4 * reps)
        warmup_with_retries(c1, x0)
        warmup_with_retries(c2, x0)
        t1, t2 = _best_wall(c1, x0), _best_wall(c2, x0)
        d = (t2 - t1) / (3 * reps)
        if d <= 0:
            d = t2 / (4 * reps)
        print(f"{name:40s} {d*1e3:7.3f} ms/app  {n/d/1e9:6.3f} Gelem/s",
              flush=True)


if __name__ == "__main__":
    main()
