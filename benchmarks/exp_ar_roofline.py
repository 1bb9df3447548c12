"""AR-NSF D-pass inverse: how far from the sequential speed-of-light?

The suite's ``ar_nsf_k4_dim8_sampling`` row (10.98M samples/s after the
bin-major head work) is 9.9x round 3, but nothing bounds it: the inverse
is D=8 *dependent* MADE forwards per layer under ``lax.scan``
(``flows/autoregressive.py:40-49``; reference
``flows/affine/autoregressive.py:29-38`` runs the same loop eagerly), so
its floor is the latency of the bare MADE pass chain — tiny matmuls whose
cost is launch/latency, not FLOPs.

This experiment measures, with the suite's two-point scan-chain fit:

1. ``made_pass`` — one bare conditioner forward (the exact
   ``autoregressive_net`` of the benchmarked model, same batch) chained
   sequentially: the irreducible per-pass latency.
2. ``ar_floor`` — K*D dependent MADE passes + the base-sample and
   LU-solve cost approximated as free: ``batch / (K * D * made_pass)``.
3. The measured end-to-end sampling row, re-run in the same window.

The ratio (floor / measured) is the efficiency of everything the sampler
adds on top of the conditioner chain (spline inverse eval, LU permute
solves, RNG). docs/kernels.md quotes the result next to the spline
kernel's own efficiency bound.

Usage: python benchmarks/exp_ar_roofline.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/nf_tpu_jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from bench_suite import _build_ar_nsf, timed_chain

BATCH, DIM, K, HIDDEN = 4096, 8, 4, 64


def main():
    model = _build_ar_nsf(jax.random.PRNGKey(0), dim=DIM, K=K, hidden=HIDDEN)
    net = model.flows[0].mprqat.autoregressive_net

    def body_made(x):
        p = net(x)  # (mult*D, B) bin-major head output
        # fold the params back into a fresh (B, D) input: sequential dep
        return x + p[:DIM].T * 1e-12

    x0 = jax.random.normal(jax.random.PRNGKey(1), (BATCH, DIM))
    # the bare pass is ~10 us: thousands of reps are needed to put the R1
    # span above the relay's ~30 ms launch overhead + wall jitter
    t_made = timed_chain(body_made, x0, 4096, label="made_pass")
    floor = BATCH / (K * DIM * t_made)
    print(f"bare MADE pass: {t_made * 1e6:.2f} us  "
          f"=> K*D-pass floor {floor / 1e6:.2f} M samples/s")

    def body_sample(k):
        k, sub = jax.random.split(k)
        z, log_q = model.sample(sub, BATCH)
        return jax.random.fold_in(k, (jnp.sum(log_q) > 0).astype(jnp.int32))

    dt = timed_chain(body_sample, jax.random.PRNGKey(2), 12,
                     label="ar_sample")
    measured = BATCH / dt
    print(f"measured sampling: {measured / 1e6:.2f} M samples/s  "
          f"({measured / floor * 100:.0f}% of the MADE-chain floor)")

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)), "out")
    os.makedirs(out, exist_ok=True)
    with open(os.path.join(out, "ar_roofline.json"), "w") as f:
        json.dump({
            "made_pass_us": round(t_made * 1e6, 3),
            "floor_samples_per_s": round(floor, 1),
            "measured_samples_per_s": round(measured, 1),
            "efficiency_vs_floor": round(measured / floor, 4),
            "batch": BATCH, "dim": DIM, "K": K, "hidden": HIDDEN,
        }, f, indent=2)
    print("wrote", os.path.join(out, "ar_roofline.json"))


if __name__ == "__main__":
    main()
