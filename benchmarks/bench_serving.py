"""Serving-path throughput: AOT-compiled sampler / bucketed log_prob and
the reloaded StableHLO artifact, timed with the relay-safe two-point
scan-chain methodology (CLAUDE.md).

The serving layer's executables take host-side keys/arrays per request, so
unlike the training benches we time REPS chained applications inside ONE
jit per measurement (`timed_chain`) to cancel the ~30 ms relay launch
overhead — the number reported is per-request device time at saturation,
not client-observed latency.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

import nf_tpu.models as models
from bench_suite import record, timed_chain
from nf_tpu.serving import (
    compile_log_prob,
    compile_sampler,
    export_log_prob,
    load_exported,
)


def bench_serving(batch=65536, K=8, reps=4):
    key = jax.random.PRNGKey(0)
    model = models.build_nsf(key, dim=2, K=K, hidden=64, num_bins=8)

    # --- AOT sampler: chained inside one jit (device-side throughput) ---
    def sample_body(k):
        k, sub = jax.random.split(k)
        z, log_q = model.sample(sub, batch)
        return jax.random.fold_in(k, (jnp.sum(log_q) > 0).astype(jnp.int32))

    dt = timed_chain(sample_body, jax.random.PRNGKey(1), reps,
                     label="serving_sample")
    record(f"serving_nsf_k{K}_sampler", batch / dt, "samples/s",
           note="device-side; AOT executable adds one dispatch per request")

    # --- bucketed density scoring ---
    x = model.sample(jax.random.PRNGKey(2), batch)[0]

    def lp_body(x):
        lp = model.log_prob(x)
        return x + (jnp.mean(lp) * 0).astype(x.dtype)

    dt = timed_chain(lp_body, x, reps, label="serving_logprob")
    record(f"serving_nsf_k{K}_log_prob", batch / dt, "evals/s")

    # --- request-path sanity: the AOT executables and the reloaded
    # StableHLO artifact agree with the jitted model ---
    served = compile_log_prob(model, (256, 2))
    art = load_exported(export_log_prob(model, (256, 2)))
    xs = x[:256]
    a = served(xs)
    b = art(xs)
    c = model.log_prob(xs)
    err = float(jnp.max(jnp.abs(a - c))), float(jnp.max(jnp.abs(b - c)))
    print(f"serving parity: AOT err {err[0]:.1e}, artifact err {err[1]:.1e}",
          flush=True)
    assert max(err) < 1e-3, err


def main():
    from nf_tpu.utils.profiling import enable_compilation_cache

    enable_compilation_cache()
    print(f"backend: {jax.default_backend()}", flush=True)
    bench_serving()

    from bench_suite import RESULTS
    import json

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "results.json")
    data = {"metrics": {}}
    if os.path.exists(path):
        with open(path) as f:
            data = json.load(f)
    data.setdefault("metrics", {}).update(RESULTS)
    with open(path, "w") as f:
        json.dump(data, f, indent=2)
    print("merged", len(RESULTS), "rows into", path)


if __name__ == "__main__":
    main()
