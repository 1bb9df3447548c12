"""Scaling harness: samples/s and log-prob-evals/s vs device count.

On pod hardware this produces the BASELINE.md scaling curve (target >= 80%
linear to 2 hosts). With one chip, run it on a virtual CPU mesh to validate
the sharded programs end-to-end:

    python benchmarks/scaling.py --virtual-devices 8

Writes ``benchmarks/scaling.json``.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--virtual-devices", type=int, default=0)
    p.add_argument("--num-samples", type=int, default=1 << 14)
    p.add_argument("--steps", type=int, default=20)
    args = p.parse_args()

    if args.virtual_devices:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count"
              f"={args.virtual_devices}").strip()
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax
        jax.config.update("jax_platforms", "cpu")
    else:
        import jax

    import optax

    import nf_tpu.models as models
    from nf_tpu.distributions import TwoModes
    from nf_tpu.parallel import (
        init_train_state,
        make_mesh,
        make_reverse_kld_step,
    )

    devices = jax.devices()
    key = jax.random.PRNGKey(0)
    model = models.build_realnvp(key, dim=2, K=16, hidden=[128, 128],
                                 target=TwoModes())
    opt = optax.adam(1e-3)

    counts = [n for n in (1, 2, 4, 8, 16, 32) if n <= len(devices)]
    results = {}
    for n in counts:
        mesh = make_mesh(("data",), devices=devices[:n])
        state, static = init_train_state(model, opt)
        step = make_reverse_kld_step(static, opt, mesh,
                                     num_samples=args.num_samples)
        state, loss = step(state, key)  # compile
        jax.block_until_ready(loss)
        t0 = time.perf_counter()
        k = key
        for _ in range(args.steps):
            k, sub = jax.random.split(k)
            state, loss = step(state, sub)
        jax.block_until_ready(loss)
        dt = (time.perf_counter() - t0) / args.steps
        sps = args.num_samples / dt
        eff = sps / (results[1]["samples_per_s"] * n) if 1 in results else 1.0
        results[n] = {"samples_per_s": round(sps, 1),
                      "step_ms": round(dt * 1e3, 2),
                      "parallel_efficiency": round(eff, 3)}
        print(f"devices={n:3d}  {sps:14.0f} samples/s  "
              f"{dt * 1e3:8.2f} ms/step  eff={eff:.2f}", flush=True)

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "scaling.json")
    with open(out, "w") as f:
        json.dump({"platform": jax.default_backend(),
                   "num_samples": args.num_samples,
                   "by_device_count": results}, f, indent=2)
    print("wrote", out)


if __name__ == "__main__":
    main()
