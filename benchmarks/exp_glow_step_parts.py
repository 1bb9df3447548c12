"""Where do the Glow step's 9.4 ms go? Subtractive composition timing.

``exp_conv_gemm_ab.py`` measured the conditioner stacks in isolation at
34-42% of MXU peak — summed over all 48 blocks that is only ~2.5 ms of
value+grad, yet the full-recipe step takes ~9.4 ms. This experiment times
the step's layers of composition to locate the other ~7 ms:

  fwd        forward_kld value only (log_prob direction, no backward)
  vg         value_and_grad of the same loss (no optimizer)
  full       the flagship train step (value_and_grad + adamax + NaN-guard)
  full_donate  same with jax.jit buffer donation for the state
  full_noscan  same but the 16 GlowBlocks per level unrolled (scan=False)

All rows: recipe L=3 K=16 h=256 b=128 f32, two-point Python-loop fit
(launch overhead cancels). The deltas attribute time to backward, to the
optimizer/update machinery, and to the scan-vs-unroll choice — the
remaining gap between `vg` and the isolated conv sum is graph-level
scheduling/fusion of the 48 small blocks plus the non-conv flow ops
(couplings, LU mixings, actnorms, squeezes, base log_prob).

Usage: python benchmarks/exp_glow_step_parts.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import optax

jax.config.update("jax_compilation_cache_dir", "/tmp/nf_tpu_jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import nf_tpu.models as models
from bench_suite import _two_point_steps, _force
from nf_tpu.parallel import init_train_state, make_forward_kld_step
from nf_tpu.utils.module import combine, partition

B, L, K, HID = 128, 3, 16, 256
OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "out")


def main():
    results = {}
    key = jax.random.PRNGKey(0)
    x = jax.random.uniform(key, (B, 3, 32, 32), minval=0.01, maxval=0.99)
    y = jnp.zeros((B,), jnp.int32)

    def build(scan):
        model = models.build_glow_multiscale(
            key, input_shape=(3, 32, 32), L=L, K=K, hidden_channels=HID,
            scan=scan)
        return model.init_from_data(x, y)

    model = build(scan=True)
    params, static = partition(model)

    # ---- fwd: loss value only
    @jax.jit
    def fwd(p, xx):
        return combine(p, static).forward_kld(xx, y)

    _force(fwd(params, x))

    def fwd_step(s):
        p, i = s
        loss = fwd(p, x + i * 1e-9)
        return (p, i + 1), loss

    dt = _two_point_steps(fwd_step, (params, jnp.float32(0)), 16)
    results["fwd_ms"] = round(dt * 1e3, 3)
    print(f"fwd (loss only):      {dt * 1e3:7.3f} ms", flush=True)

    # ---- vg: value_and_grad, no optimizer
    @jax.jit
    def vg(p, xx):
        return jax.value_and_grad(
            lambda q: combine(q, static).forward_kld(xx, y))(p)

    _force(vg(params, x)[0])

    def vg_step(s):
        p, i = s
        loss, g = vg(p, x + i * 1e-9)
        return (p, i + 1), loss

    dt = _two_point_steps(vg_step, (params, jnp.float32(0)), 8)
    results["vg_ms"] = round(dt * 1e3, 3)
    print(f"value_and_grad:       {dt * 1e3:7.3f} ms", flush=True)

    # ---- full step variants
    opt = optax.adamax(1e-3)
    # (an unrolled scan=False variant was dropped: the L=3 K=16 unrolled
    # train step costs 10+ min of remote compile for a secondary question)
    for name, scan, donate in (("full", True, False),
                               ("full_donate", True, True)):
        m = model if scan else build(scan=False)
        state, static2 = init_train_state(m, opt)
        step = make_forward_kld_step(static2, opt, donate=donate)
        try:
            if donate:
                # donation invalidates the input state; rebuild per timing
                # try is wrong for throughput — chain the donated output
                state, loss = step(state, (x, y))
                _force(loss)

                def one(s):
                    return step(s, (x, y))

                dt = _two_point_steps(one, state, 8)
            else:
                state, loss = step(state, (x, y))
                _force(loss)
                dt = _two_point_steps(lambda s: step(s, (x, y)), state, 8)
        except Exception as e:  # noqa: BLE001
            # the relay rejects host fetches of buffers aliased into a
            # donated executable (InvalidArgument) — record and move on;
            # `full` already shows the optimizer machinery costs ~0.3 ms,
            # so donation has nothing left to buy at this model size
            results[f"{name}_error"] = str(e).splitlines()[0][:120]
            print(f"{name:20s}  FAILED ({type(e).__name__}; relay "
                  f"donated-buffer fetch)", flush=True)
            continue
        results[f"{name}_ms"] = round(dt * 1e3, 3)
        print(f"{name:20s}  {dt * 1e3:7.3f} ms "
              f"({B / dt:8.0f} images/s)", flush=True)

    results["isolated_conv_sum_ms"] = 2.5  # exp_conv_gemm_ab: 16*(0.118 +
    # 0.031 + ~0.01) value+grad at L0/L1/L2 shapes
    os.makedirs(OUT, exist_ok=True)
    with open(os.path.join(OUT, "glow_step_parts.json"), "w") as f:
        json.dump(results, f, indent=2)
    print("wrote", os.path.join(OUT, "glow_step_parts.json"))


if __name__ == "__main__":
    main()
