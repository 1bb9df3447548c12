"""Demonstrate the relay's fixed per-launch overhead (the reason for the
two-point timing methodology in ``bench_suite.py``).

Three measurements at the same element count:

1. the fused Pallas RQ-spline, naive wall/REPS at two REPS values — the
   per-app number shrinks as REPS grows (fixed cost amortizing), proving a
   launch-overhead floor;
2. a trivial Pallas copy kernel over the SAME operand footprint — lands on
   the same floor despite doing ~no compute;
3. the two-point fit — the launch overhead cancels, leaving device time.

Run: cd /root/repo && python benchmarks/exp_overhead_floor.py
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
from nf_tpu.ops import splines_pallas as sp
from nf_tpu.utils.profiling import enable_compilation_cache

N = 1 << 21
K = 8


def copy_kernel(x_ref, w_ref, h_ref, d_ref, out_ref, ld_ref):
    # touch every operand so nothing is DCE'd; trivial compute
    out_ref[...] = x_ref[...] + w_ref[0] + h_ref[0]
    ld_ref[...] = d_ref[0]


def copy_impl(x2, w3, h3, d3, rows):
    br = 32
    plane = pl.BlockSpec((br, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    stack = lambda k: pl.BlockSpec((k, br, 128), lambda i: (0, i, 0),
                                   memory_space=pltpu.VMEM)
    return pl.pallas_call(
        copy_kernel, grid=(rows // br,),
        in_specs=[plane, stack(K), stack(K), stack(K + 1)],
        out_specs=(plane, plane),
        out_shape=(jax.ShapeDtypeStruct((rows, 128), x2.dtype),) * 2,
    )(x2, w3, h3, d3)


def main():
    enable_compilation_cache()
    print("backend:", jax.default_backend(), flush=True)
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 5)
    x = jax.random.normal(ks[0], (N,)) * 3
    uw = jax.random.normal(ks[1], (N, K))
    uh = jax.random.normal(ks[2], (N, K))
    ud = jax.random.normal(ks[3], (N, K + 1))

    def spline_body(xc):
        y, ld = sp.fused_unconstrained_rqs(xc, uw, uh, ud, 2.5)
        return jnp.clip(y + ld * 1e-9, -3.0, 3.0)

    rows = N // 128
    w3 = uw.T.reshape(K, rows, 128)
    h3 = uh.T.reshape(K, rows, 128)
    d3 = ud.T.reshape(K + 1, rows, 128)

    def copy_body(x2):
        y, ld = copy_impl(x2, w3, h3, d3, rows)
        return jnp.clip(y + ld * 1e-9, -3.0, 3.0)

    for name, body, x0 in (("spline", spline_body, x),
                           ("copy  ", copy_body, x.reshape(rows, 128))):
        walls = {}
        for r in (4, 16, 64):
            c = compile_scan_chain(body, r)
            warmup_with_retries(c, x0)
            walls[r] = _best_wall(c, x0)
            print(f"{name} reps={r:3d}: naive {walls[r]/r*1e3:7.3f} ms/app "
                  f"(total {walls[r]*1e3:8.2f} ms)", flush=True)
        d = (walls[64] - walls[16]) / 48
        c_fixed = walls[16] - 16 * d
        print(f"{name} two-point: device {d*1e3:.3f} ms/app "
              f"({N/max(d,1e-12)/1e9:.2f} Gelem/s), fixed overhead "
              f"{c_fixed*1e3:.1f} ms/launch", flush=True)


if __name__ == "__main__":
    main()
