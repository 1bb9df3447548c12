"""Experiment: where does the Pallas RQ-spline's time go?

Isolates (a) the XLA-side (N,K)->(K,N) param transpose, (b) the kernel
body, (c) block-size sensitivity.  Roofline: K=8 reads (3K+2)*4 = 104 B
and writes 8 B per element; at ~820 GB/s HBM a v5e should reach ~7 Gelem/s.
Measured headline is 0.62 Gelem/s, so ~10x headroom to explain.

Run on TPU: cd /root/repo && python benchmarks/exp_spline_layout.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax import lax

from nf_tpu.ops import splines_pallas as sp
from nf_tpu.utils.profiling import enable_compilation_cache

N = 1 << 21
K = 8
REPS = 16


def timed(fn, *args, reps=REPS):
    f = jax.jit(fn)
    for attempt in range(3):
        try:
            r = f(*args)
            jax.block_until_ready(r)
            break
        except Exception as e:  # flaky remote-compile transport
            if attempt == 2:
                raise
            print(f"  retry after: {type(e).__name__}", flush=True)
            time.sleep(5)
    t0 = time.perf_counter()
    r = f(*args)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / reps


def chain(body, x0, reps=REPS):
    def run(x):
        return lax.scan(lambda c, _: (body(c), None), x, None, length=reps)[0]
    return timed(run, x0, reps=reps)


def main():
    enable_compilation_cache()
    print("backend:", jax.default_backend(), flush=True)
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 5)
    x = jax.random.normal(ks[0], (N,)) * 3
    uw = jax.random.normal(ks[1], (N, K))
    uh = jax.random.normal(ks[2], (N, K))
    ud = jax.random.normal(ks[3], (N, K + 1))
    tb = jnp.full((N,), 2.5)

    def report(name, dt):
        print(f"{name:44s} {N / dt / 1e9:8.2f} Gelem/s   {dt*1e3:8.3f} ms",
              flush=True)

    # (1) current full path (transpose inside)
    def full(xc):
        y, ld = sp.fused_unconstrained_rqs(xc, uw, uh, ud, 2.5)
        return jnp.clip(y + ld * 1e-9, -3.0, 3.0)
    report("full path (with transpose)", chain(full, x))

    # (2) kernel-only: params already (K, N)
    uwT, uhT, udT = uw.T, uh.T, ud.T
    uwT, uhT, udT = map(jnp.asarray, (uwT, uhT, udT))
    def kernel_only(xc):
        y, ld = sp._pallas_impl(
            xc, uwT, uhT, udT, tb, inverse=False,
            min_bin_width=sp.DEFAULT_MIN_BIN_WIDTH,
            min_bin_height=sp.DEFAULT_MIN_BIN_HEIGHT,
            min_derivative=sp.DEFAULT_MIN_DERIVATIVE,
            interpret=False)
        return jnp.clip(y + ld * 1e-9, -3.0, 3.0)
    report("kernel only (pre-transposed)", chain(kernel_only, x))

    # (3) transpose alone
    def tr(c):
        a, b, d = (uw + c[0]).T, (uh + c[0]).T, (ud + c[0]).T
        return jnp.stack([a.sum(), b.sum(), d.sum()])
    report("XLA transpose of params alone", chain(tr, jnp.zeros(3)))

    # (4) block-rows sweep on kernel-only
    for br in (64, 128, 256):
        sp._BLOCK_ROWS = br
        report(f"kernel only, BLOCK_ROWS={br}", chain(kernel_only, x))
    sp._BLOCK_ROWS = 32


if __name__ == "__main__":
    main()
