"""Scaling harness: samples/s and log-prob-evals/s vs device count.

On pod hardware this produces the BASELINE.md scaling curve (target >= 80%
linear to 2 hosts). With one chip, run it on a virtual CPU mesh to validate
the sharded programs end-to-end:

    python benchmarks/scaling.py --virtual-devices 8

Multi-HOST validation (the full jax.distributed + gloo + per-process path,
run entirely on this machine's CPU): the parent respawns itself as N
coordinated worker processes, each owning --virtual-devices local devices,
and the sharded VI step runs over the combined global mesh:

    python benchmarks/scaling.py --num-processes 2 --virtual-devices 4

CPU-process timings validate functionality, not the >=80% DCN-scaling
target (that needs pod hardware); results still record parallel efficiency
so regressions in the collective layout are visible.

Writes ``benchmarks/scaling.json``.
"""

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def spawn_processes(args):
    """Re-exec this script as ``--num-processes`` coordinated workers."""
    import socket

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    env = dict(os.environ)
    env["XLA_FLAGS"] = (f"--xla_force_host_platform_device_count="
                        f"{args.virtual_devices or 1}")
    env.pop("PYTHONPATH", None)
    procs = []
    for pid in range(args.num_processes):
        cmd = [sys.executable, os.path.abspath(__file__),
               "--num-processes", str(args.num_processes),
               "--process-id", str(pid), "--port", str(port),
               "--virtual-devices", str(args.virtual_devices),
               "--num-samples", str(args.num_samples),
               "--steps", str(args.steps)]
        procs.append(subprocess.Popen(
            cmd, env=env,
            stdout=None if pid == 0 else subprocess.DEVNULL,
            stderr=subprocess.STDOUT if pid == 0 else subprocess.DEVNULL))
    rc = [p.wait() for p in procs]
    if any(rc):
        raise SystemExit(f"worker exit codes: {rc}")


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--virtual-devices", type=int, default=0)
    p.add_argument("--num-samples", type=int, default=1 << 14)
    p.add_argument("--steps", type=int, default=20)
    p.add_argument("--num-processes", type=int, default=1)
    p.add_argument("--process-id", type=int, default=None,
                   help="internal: set when respawned as a worker")
    p.add_argument("--port", type=int, default=None)
    args = p.parse_args()

    if args.num_processes > 1 and args.process_id is None:
        return spawn_processes(args)

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

    if args.process_id is not None:
        from nf_tpu.parallel.multihost import initialize_distributed

        initialize_distributed(
            coordinator_address=f"localhost:{args.port}",
            num_processes=args.num_processes, process_id=args.process_id,
            platform="cpu" if args.virtual_devices else None)

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

    if args.process_id is not None:
        # multi-process: every process must own addressable devices in any
        # mesh it runs, so the sub-mesh ladder is replaced by two points —
        # a LOCAL single-device baseline (each process over its own first
        # device; no cross-process collectives) and the full global mesh.
        # Their ratio gives a real parallel efficiency for the collective
        # layout instead of a hardcoded 1.0.
        counts = [1, len(devices)]
    else:
        counts = [n for n in (1, 2, 4, 8, 16, 32) if n <= len(devices)]
    results = {}
    for n in counts:
        local = jax.local_devices()
        mesh_devices = (local[:1] if (args.process_id is not None and n == 1)
                        else devices[:n])
        mesh = make_mesh(("data",), devices=mesh_devices)
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

    if args.process_id not in (None, 0):
        return
    name = ("scaling.json" if args.process_id is None
            else f"scaling_{args.num_processes}proc.json")
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)), name)
    with open(out, "w") as f:
        json.dump({"platform": jax.default_backend(),
                   "num_processes": args.num_processes,
                   "num_samples": args.num_samples,
                   # Virtual devices oversubscribe the host: efficiency on a
                   # 1-core machine measures functionality, not DCN scaling.
                   "host_cpu_cores": os.cpu_count(),
                   "by_device_count": results}, f, indent=2)
    print("wrote", out)


if __name__ == "__main__":
    main()
