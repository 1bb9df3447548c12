"""Separate fixed per-execution (relay) overhead from true device time.

Model: wall(chain with R reps) = C + R * d.  Sweep R for the copy kernel
and the spline; fit C (fixed overhead per executable launch) and d (true
per-application device time).
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

K = 8
N = 1 << 21


def wall(body, x0, reps):
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
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        r = run(x0)
        jax.block_until_ready(r)
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    enable_compilation_cache()
    print("backend:", jax.default_backend(), flush=True)
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 5)
    x = jax.random.normal(ks[0], (N,)) * 3
    uw = jax.random.normal(ks[1], (N, K))
    uh = jax.random.normal(ks[2], (N, K))
    ud = jax.random.normal(ks[3], (N, K + 1))

    def spline(xc):
        y, ld = sp.fused_unconstrained_rqs(xc, uw, uh, ud, 2.5)
        return jnp.clip(y + ld * 1e-9, -3.0, 3.0)

    rs = (4, 16, 64, 256)
    ws = []
    for r in rs:
        w = wall(spline, x, r)
        ws.append(w)
        print(f"spline reps={r:4d}: total {w*1e3:9.3f} ms   "
              f"per-app {w/r*1e3:7.3f} ms", flush=True)
    # least-squares fit  w = C + r*d
    import numpy as np
    A = np.stack([np.ones(len(rs)), np.asarray(rs, float)], 1)
    (C, d), *_ = np.linalg.lstsq(A, np.asarray(ws), rcond=None)
    print(f"fit: fixed C = {C*1e3:.2f} ms/launch, device d = {d*1e3:.4f} "
          f"ms/app -> {N/d/1e9:.2f} Gelem/s true", flush=True)


if __name__ == "__main__":
    main()
