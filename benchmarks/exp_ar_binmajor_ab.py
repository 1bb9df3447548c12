"""Attribute the AR-NSF sampling jump: bin-major vs feature-major MADE head.

The suite's `ar_nsf_k4_dim8_sampling` row moved 1.11M -> ~11M samples/s
between rounds 3 and 4; the only model-path change is the bin-major
conditioner head (wrapper default `bin_major_head=True`). This times the
SAME stack with the head flag on/off under the suite's timed_chain
methodology to pin the attribution.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from bench_suite import timed_chain
from nf_tpu.utils.profiling import enable_compilation_cache


def build(key, bin_major, dim=8, K=4, hidden=64, num_bins=8):
    import nf_tpu.flows as nff
    from nf_tpu import core
    from nf_tpu.distributions import DiagGaussian

    keys = jax.random.split(key, 2 * K)
    flows = []
    for i in range(K):
        flows.append(nff.AutoregressiveRationalQuadraticSpline.create(
            keys[2 * i], num_input_channels=dim, num_blocks=2,
            num_hidden_channels=hidden, num_bins=num_bins,
            bin_major_head=bin_major))
        flows.append(nff.LULinearPermute.create(keys[2 * i + 1], dim))
    return core.NormalizingFlow(q0=DiagGaussian.create(dim),
                                flows=tuple(flows))


def main(batch=4096, reps=12):
    enable_compilation_cache()
    print("backend:", jax.default_backend(), flush=True)
    for bin_major in (True, False):
        model = build(jax.random.PRNGKey(0), bin_major)

        def body(k):
            k, sub = jax.random.split(k)
            z, log_q = model.sample(sub, batch)
            return jax.random.fold_in(
                k, (jnp.sum(log_q) > 0).astype(jnp.int32))

        name = "bin-major" if bin_major else "feature-major"
        dt = timed_chain(body, jax.random.PRNGKey(1), reps,
                         label=f"ar_sample_{name}")
        print(f"{name}: {batch / dt:,.0f} samples/s "
              f"({dt * 1e3:.3f} ms/sample-batch)", flush=True)


if __name__ == "__main__":
    main()
