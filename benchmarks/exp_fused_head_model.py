"""Model-level A/B of the fused head+spline path on the real chip.

Checks on-device numerics (fused vs unfused log_prob/sample on the same
params) and times the suite's NSF rows with the fused-head mode on/off,
plus a wider-D model, to set the auto-dispatch policy (the D=1 transform
half of a dim-2 NSF runs the kernel's (1, BLOCK) planes at 1/8 VPU fill —
measure whether that still wins before letting auto route it).

Usage: python benchmarks/exp_fused_head_model.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/nf_tpu_jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from bench_suite import timed_chain
import nf_tpu.models as models
from nf_tpu.ops import spline_head_fused as shf

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "out")


def check_numerics(results):
    for dim in (2, 8):
        model = models.build_nsf(jax.random.PRNGKey(0), dim=dim, K=4,
                                 hidden=128, num_bins=8)
        x = jax.random.normal(jax.random.PRNGKey(1), (8192, dim))
        shf.set_fused_head_mode("on")
        lp_f = np.asarray(jax.jit(model.log_prob)(x))
        z_f, lq_f = jax.jit(lambda k: model.sample(k, 4096))(
            jax.random.PRNGKey(2))
        shf.set_fused_head_mode("off")
        lp_r = np.asarray(jax.jit(model.log_prob)(x))
        z_r, lq_r = jax.jit(lambda k: model.sample(k, 4096))(
            jax.random.PRNGKey(2))
        shf.set_fused_head_mode("auto")
        gap_lp = float(np.max(np.abs(lp_f - lp_r)))
        gap_z = float(np.max(np.abs(np.asarray(z_f) - np.asarray(z_r))))
        print(f"dim={dim}: on-device fused-vs-unfused max|dlogp|={gap_lp:.2e}"
              f" max|dz|={gap_z:.2e}")
        results[f"numerics_dim{dim}"] = dict(dlogp=gap_lp, dz=gap_z)
        assert gap_lp < 2e-2 and gap_z < 1e-2, (dim, gap_lp, gap_z)
        # identical-trace sanity: TPU default matmul precision differs
        # between the in-kernel f32 MXU dot and XLA's bf16-pass GEMM, so
        # small drift is expected; the CPU tests pin exact parity.


def bench(results):
    for dim, batch in ((2, 1 << 14), (8, 1 << 14), (16, 1 << 14)):
        model = models.build_nsf(jax.random.PRNGKey(0), dim=dim, K=8,
                                 hidden=128, num_bins=8)

        def body_lp(x):
            lp = model.log_prob(x)
            return x + 1e-12 * lp[:, None]

        def body_s(k):
            k, sub = jax.random.split(k)
            z, lq = model.sample(sub, batch)
            return jax.random.fold_in(
                k, (jnp.sum(lq) > 0).astype(jnp.int32))

        x0 = jax.random.normal(jax.random.PRNGKey(1), (batch, dim))
        for mode in ("off", "on"):
            shf.set_fused_head_mode(mode)
            dt = timed_chain(body_lp, x0, 32, label=f"lp_d{dim}_{mode}")
            results[f"nsf_dim{dim}_log_prob_{mode}"] = round(batch / dt, 1)
            print(f"dim={dim} log_prob fused={mode}: "
                  f"{batch / dt / 1e6:.2f} M evals/s", flush=True)
            dt = timed_chain(body_s, jax.random.PRNGKey(3), 16,
                             label=f"s_d{dim}_{mode}")
            results[f"nsf_dim{dim}_sample_{mode}"] = round(batch / dt, 1)
            print(f"dim={dim} sample   fused={mode}: "
                  f"{batch / dt / 1e6:.2f} M samples/s", flush=True)
        shf.set_fused_head_mode("auto")


def main():
    results = {}
    check_numerics(results)
    bench(results)
    os.makedirs(OUT, exist_ok=True)
    with open(os.path.join(OUT, "fused_head_model.json"), "w") as f:
        json.dump(results, f, indent=2)
    print("wrote", os.path.join(OUT, "fused_head_model.json"))


if __name__ == "__main__":
    main()
