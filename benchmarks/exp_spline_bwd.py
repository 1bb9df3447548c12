"""Spline TRAINING-path micro-benchmark: fused Pallas backward vs the dense
one-hot VJP (round-1 behavior) vs the all-dense path.

Chains REPS value+grad evaluations of the k-major unconstrained RQ spline
inside one jitted lax.scan with a data dependency (x and all three param
stacks are perturbed by their own cotangents each rep), timed at two chain
lengths so the axon relay's fixed launch overhead cancels
(CLAUDE.md / bench_suite two-point fit).

    python benchmarks/exp_spline_bwd.py [--n 2097152] [--bins 8] [--reps 8]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--n", type=int, default=1 << 21)
    p.add_argument("--bins", type=int, default=8)
    p.add_argument("--reps", type=int, default=8)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/nf_tpu_jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from nf_tpu.ops import splines, splines_pallas

    N, K, R = args.n, args.bins, args.reps
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    x0 = jax.random.normal(ks[0], (N,)) * 2.5
    uw0 = jax.random.normal(ks[1], (K, N))
    uh0 = jax.random.normal(ks[2], (K, N))
    ud0 = jax.random.normal(ks[3], (K - 1, N))
    tb = 3.0

    def build(use_pallas):
        def loss(x, uw, uh, ud):
            y, ld = splines.unconstrained_rational_quadratic_spline_kmajor(
                x, uw, uh, ud, tails="linear", tail_bound=tb,
                use_pallas=use_pallas)
            return jnp.sum(y) + jnp.sum(ld)

        vg = jax.value_and_grad(loss, argnums=(0, 1, 2, 3))

        def chain(reps):
            @jax.jit
            def run(x, uw, uh, ud):
                def body(carry, _):
                    x, uw, uh, ud = carry
                    _, (gx, gw, gh, gd) = vg(x, uw, uh, ud)
                    eps = 1e-6
                    return (x + eps * gx, uw + eps * gw, uh + eps * gh,
                            ud + eps * gd), None

                carry, _ = jax.lax.scan(body, (x, uw, uh, ud), None,
                                        length=reps)
                return jnp.sum(carry[0])

            return run

        return chain

    def best(f, tries=3):
        # the axon relay MEMOIZES identical (executable, args) calls —
        # feed a fresh input each call and fetch the scalar to the host
        b = float("inf")
        for i in range(tries):
            xs = x0 + float(i + 1)
            t0 = time.perf_counter()
            float(f(xs, uw0, uh0, ud0))
            b = min(b, time.perf_counter() - t0)
        return b

    results = {}
    configs = [
        ("pallas_fwd_analytic_bwd", True, True, "analytic"),
        ("pallas_fwd_autodiff_bwd", True, True, "autodiff"),
        ("pallas_fwd_dense_bwd", True, False, "analytic"),
        ("dense_fwd_dense_bwd", False, False, "analytic"),
    ]
    for name, use_pallas, fused_bwd, bwd_kernel in configs:
        splines_pallas.set_pallas_bwd_enabled(fused_bwd)
        splines_pallas.set_pallas_bwd_kernel(bwd_kernel)
        chain = build(use_pallas)
        r1, r4 = chain(R), chain(4 * R)
        float(r1(x0, uw0, uh0, ud0))  # compile
        float(r4(x0, uw0, uh0, ud0))
        t1 = best(r1)
        t4 = best(r4)
        dt = (t4 - t1) / (3 * R)
        if dt <= 0:
            dt = t4 / (4 * R)
        gelem = N / dt / 1e9
        results[name] = {"ms_per_vg": round(dt * 1e3, 3),
                         "gelem_per_s": round(gelem, 3)}
        print(f"{name:24s} {dt*1e3:8.3f} ms/value+grad  "
              f"{gelem:7.2f} Gelem/s", flush=True)
    splines_pallas.set_pallas_bwd_enabled(True)
    splines_pallas.set_pallas_bwd_kernel("analytic")

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "spline_bwd.json")
    with open(out, "w") as f:
        json.dump({"n": N, "bins": K, "reps": R, "platform":
                   jax.default_backend(), "results": results}, f, indent=2)
    print("wrote", out)


if __name__ == "__main__":
    main()
