"""Is the Pallas RQ-spline at an overhead floor or a real roofline?

Sweeps N and compares against (a) a trivial Pallas copy kernel over the
same operand set and (b) a pure-XLA elementwise op of the same footprint.
If time scales ~linearly with N the 1 Gelem/s is real; if it's flat, the
measurements sit on a dispatch/relay floor.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nf_tpu.ops import splines_pallas as sp
from nf_tpu.utils.profiling import enable_compilation_cache

K = 8
REPS = 16


def chain(body, x0, reps=REPS):
    @jax.jit
    def run(x):
        return lax.scan(lambda c, _: (body(c), None), x, None, length=reps)[0]
    for attempt in range(3):
        try:
            r = run(x0)
            jax.block_until_ready(r)
            break
        except Exception as e:
            if attempt == 2:
                raise
            print(f"  retry after: {type(e).__name__}", flush=True)
            time.sleep(5)
    t0 = time.perf_counter()
    r = run(x0)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / reps


def copy_kernel(x_ref, w_ref, h_ref, d_ref, out_ref, ld_ref):
    # touch every operand so nothing is DCE'd; trivial compute
    out_ref[...] = x_ref[...] + w_ref[0] + h_ref[0]
    ld_ref[...] = d_ref[0]


def copy_impl(x, w3, h3, d3, rows):
    br = 32
    plane = pl.BlockSpec((br, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    stack = lambda k: pl.BlockSpec((k, br, 128), lambda i: (0, i, 0),
                                   memory_space=pltpu.VMEM)
    return pl.pallas_call(
        copy_kernel, grid=(rows // br,),
        in_specs=[plane, stack(K), stack(K), stack(K + 1)],
        out_specs=(plane, plane),
        out_shape=(jax.ShapeDtypeStruct((rows, 128), x.dtype),) * 2,
    )(x, w3, h3, d3)


def main():
    enable_compilation_cache()
    print("backend:", jax.default_backend(), flush=True)
    key = jax.random.PRNGKey(0)
    for logn in (19, 21, 23):
        n = 1 << logn
        ks = jax.random.split(key, 5)
        x = jax.random.normal(ks[0], (n,)) * 3
        uw = jax.random.normal(ks[1], (n, K))
        uh = jax.random.normal(ks[2], (n, K))
        ud = jax.random.normal(ks[3], (n, K + 1))

        def full(xc):
            y, ld = sp.fused_unconstrained_rqs(xc, uw, uh, ud, 2.5)
            return jnp.clip(y + ld * 1e-9, -3.0, 3.0)
        dt = chain(full, x)
        print(f"spline  N=2^{logn}: {n/dt/1e9:7.2f} Gelem/s  {dt*1e3:8.3f} ms",
              flush=True)

        rows = n // 128
        w3 = uw.T.reshape(K, rows, 128)
        h3 = uh.T.reshape(K, rows, 128)
        d3 = ud.T.reshape(K + 1, rows, 128)
        x2 = x.reshape(rows, 128)

        def cp(xc):
            y, ld = copy_impl(xc, w3, h3, d3, rows)
            return jnp.clip(y + ld * 1e-9, -3.0, 3.0)
        dt = chain(cp, x2)
        print(f"copyker N=2^{logn}: {n/dt/1e9:7.2f} Gelem/s  {dt*1e3:8.3f} ms",
              flush=True)

        def xla_ew(xc):
            y = xc + uw.sum(-1) + uh.sum(-1) + ud.sum(-1)
            return jnp.clip(y * (1.0 + 1e-9), -3.0, 3.0)
        dt = chain(xla_ew, x)
        print(f"xla_ew  N=2^{logn}: {n/dt/1e9:7.2f} Gelem/s  {dt*1e3:8.3f} ms",
              flush=True)


if __name__ == "__main__":
    main()
