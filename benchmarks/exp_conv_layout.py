"""NCHW vs NHWC conv-stack timing on TPU.

nf_tpu uses NCHW (reference parity). XLA-TPU prefers channels-minor
layouts; if it inserts transposes around NCHW convs, image models pay for
it. This measures a Glow-like conditioner stack (3x3 -> 1x1 -> 3x3 convs,
value+grad) in both data layouts at matched shapes.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from bench_suite import _best_wall, compile_scan_chain, warmup_with_retries
from nf_tpu.utils.profiling import enable_compilation_cache

B, C_IN, C_H, C_OUT, S = 128, 24, 256, 48, 16


def make_params(key, nhwc):
    ks = jax.random.split(key, 3)
    if nhwc:  # HWIO
        w1 = jax.random.normal(ks[0], (3, 3, C_IN, C_H)) * 0.05
        w2 = jax.random.normal(ks[1], (1, 1, C_H, C_H)) * 0.05
        w3 = jax.random.normal(ks[2], (3, 3, C_H, C_OUT)) * 0.05
    else:  # OIHW
        w1 = jax.random.normal(ks[0], (C_H, C_IN, 3, 3)) * 0.05
        w2 = jax.random.normal(ks[1], (C_H, C_H, 1, 1)) * 0.05
        w3 = jax.random.normal(ks[2], (C_OUT, C_H, 3, 3)) * 0.05
    return (w1, w2, w3)


def stack(x, ws, nhwc):
    dn = ("NHWC", "HWIO", "NHWC") if nhwc else ("NCHW", "OIHW", "NCHW")
    pads = [[(1, 1), (1, 1)], [(0, 0), (0, 0)], [(1, 1), (1, 1)]]
    for w, p in zip(ws, pads):
        x = jax.lax.conv_general_dilated(x, w, (1, 1), p,
                                         dimension_numbers=dn)
        x = jax.nn.leaky_relu(x)
    return x


def bench(nhwc, reps=8):
    key = jax.random.PRNGKey(0)
    ws = make_params(key, nhwc)
    shape = (B, S, S, C_IN) if nhwc else (B, C_IN, S, S)
    x = jax.random.normal(key, shape)

    def body(x):
        def loss(ws):
            return jnp.sum(stack(x, ws, nhwc) ** 2)
        g = jax.grad(loss)(ws)
        # fold grads back into a fresh input for the chain dependency
        return x * 0.999 + 1e-12 * g[0].sum()

    r1, r2 = reps, 4 * reps
    c1, c2 = compile_scan_chain(body, r1), compile_scan_chain(body, r2)
    warmup_with_retries(c1, x)
    warmup_with_retries(c2, x)
    t1, t2 = _best_wall(c1, x), _best_wall(c2, x)
    d = (t2 - t1) / (r2 - r1)
    if d <= 0:
        d = t2 / r2
    name = "NHWC" if nhwc else "NCHW"
    print(f"{name}: {d*1e3:7.3f} ms per fwd+bwd stack "
          f"({B / d:,.0f} images/s)", flush=True)
    return d


def bench_shape(nhwc, b, c_in, c_h, c_out, s, reps=8):
    """One conditioner stack at explicit shapes (value+grad)."""
    global B, C_IN, C_H, C_OUT, S
    B, C_IN, C_H, C_OUT, S = b, c_in, c_h, c_out, s
    return bench(nhwc, reps=reps)


def main():
    enable_compilation_cache()
    print("backend:", jax.default_backend(), flush=True)
    if "--glow-full" in sys.argv:
        # FULL reference recipe (L=3, K=16, hidden=256, b=128): the three
        # levels' coupling-conditioner shapes. ch_i = 3*2^(L+1-i), split in
        # half for the coupling -> conv in=ch/2, out=ch (shift+scale),
        # spatial 32/2^(L-i). The conditioners are ~all of Glow's FLOPs, so
        # this IS the full-recipe layout experiment without refactoring the
        # flow layers to NHWC.
        total = {False: 0.0, True: 0.0}
        for (ci, co, s) in [(24, 48, 4), (12, 24, 8), (6, 12, 16)]:
            for nhwc in (False, True):
                print(f"  level shape in={ci} out={co} {s}x{s} "
                      f"{'NHWC' if nhwc else 'NCHW'}:", flush=True)
                d = bench_shape(nhwc, 128, ci, 256, co, s)
                total[nhwc] += d * 16  # K=16 blocks per level
        print(f"full-recipe conditioner total (x16 blocks/level): "
              f"NCHW {total[False]*1e3:.2f} ms  NHWC {total[True]*1e3:.2f} "
              f"ms  NHWC speedup {total[False]/total[True]:.2f}x",
              flush=True)
        return
    d_nchw = bench(False)
    d_nhwc = bench(True)
    print(f"NHWC speedup over NCHW: {d_nchw / d_nhwc:.2f}x", flush=True)


if __name__ == "__main__":
    main()
