"""Subprocess worker for tests/test_multihost.py.

Runs a small data-parallel MLE training job through the multi-host stack
(`initialize_distributed` + `per_process_batches` + `make_forward_kld_step`)
on the CPU backend and writes its loss history to a JSON file. Launched N
times by the test with process_id 0..N-1; also runnable with
--num-processes 1 (no distributed init) as the single-process control whose
losses must match the multi-process run exactly.
"""

import argparse
import json
import os
import sys

# repo root on sys.path (python puts the script dir, tests/, there instead;
# PYTHONPATH is off-limits per CLAUDE.md)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--process-id", type=int, required=True)
    p.add_argument("--num-processes", type=int, required=True)
    p.add_argument("--port", type=int, default=29544)
    p.add_argument("--out", type=str, required=True)
    p.add_argument("--steps", type=int, default=5)
    p.add_argument("--global-batch", type=int, default=64)
    p.add_argument("--hybrid", action="store_true",
                   help="also exercise make_hybrid_mesh (data x sample)")
    p.add_argument("--train-binary", action="store_true",
                   help="exercise `nf_tpu.train --distributed` instead of "
                        "the library-level step")
    p.add_argument("--train-binary-image", action="store_true",
                   help="same, via the image stack (tiny Glow)")
    p.add_argument("--accum-steps", type=int, default=1,
                   help="gradient accumulation in the train-binary paths")
    args = p.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    from nf_tpu.parallel.multihost import (
        host_local_to_global,
        initialize_distributed,
        make_hybrid_mesh,
        per_process_batches,
    )

    if args.num_processes > 1:
        pi, pc = initialize_distributed(
            coordinator_address=f"localhost:{args.port}",
            num_processes=args.num_processes, process_id=args.process_id,
            platform="cpu")
        assert (pi, pc) == (args.process_id, args.num_processes)

    if args.train_binary or args.train_binary_image:
        # end-to-end CLI path: train.main re-enters initialize_distributed
        # (idempotent no-op) via --distributed and runs the sharded loop
        import jax.numpy as jnp

        from nf_tpu import train as train_bin

        if args.train_binary_image:
            argv = ["--model", "glow", "--iters", str(args.steps),
                    "--levels", "1", "--num_layers", "1", "--hidden", "8",
                    "--image_size", "8",
                    "--batch_size", str(args.global_batch),
                    "--log_every", "100"]
        else:
            argv = ["--model", "realnvp", "--loss", "forward_kld",
                    "--target", "two_moons", "--iters", str(args.steps),
                    "--num_layers", "2", "--hidden", "16",
                    "--batch_size", str(args.global_batch),
                    "--log_every", "1"]
        if args.accum_steps > 1:
            argv += ["--accum_steps", str(args.accum_steps)]
        if args.num_processes > 1:
            argv.append("--distributed")
        state = train_bin.main(argv)
        param_sum = float(sum(
            jnp.sum(jnp.abs(l))
            for l in jax.tree_util.tree_leaves(state.params)))
        with open(args.out, "w") as f:
            json.dump({"process_id": args.process_id,
                       "process_count": jax.process_count(),
                       "final_step": int(state.step),
                       "param_sum": param_sum}, f)
        print("train-binary worker done", flush=True)
        return

    import optax

    import nf_tpu.models as models
    from nf_tpu.parallel import (
        init_train_state,
        make_forward_kld_step,
        make_mesh,
    )

    mesh = make_mesh(("data",))
    model = models.build_realnvp(jax.random.PRNGKey(0), dim=2, K=4,
                                 hidden=[32, 32])
    # fixed host-side dataset, identical on every process
    rng = np.random.default_rng(5)
    theta = rng.random(512) * 2 * np.pi
    data = np.stack([2 * np.cos(theta), np.sin(theta)],
                    1).astype(np.float32) + rng.normal(
                        0, 0.1, (512, 2)).astype(np.float32)

    first = next(per_process_batches(data, args.global_batch, mesh, seed=9))
    model = model.init_from_data(first)

    opt = optax.adam(1e-2)
    state, static = init_train_state(model, opt)
    step = make_forward_kld_step(static, opt, mesh)

    losses = []
    batches = per_process_batches(data, args.global_batch, mesh,
                                  num_iters=args.steps, seed=9)
    for batch in batches:
        state, loss = step(state, batch)
        losses.append(float(loss))

    result = {"process_id": args.process_id,
              "process_count": jax.process_count(),
              "global_devices": jax.device_count(),
              "local_devices": jax.local_device_count(),
              "losses": losses}

    if args.hybrid:
        import jax.numpy as jnp
        from jax.sharding import NamedSharding, PartitionSpec as P

        local = jax.local_device_count()
        hmesh = make_hybrid_mesh(
            ("data", "sample"), ici_shape=(1, local),
            dcn_shape=(args.num_processes, 1))
        x = np.arange(args.num_processes * local * 2,
                      dtype=np.float32).reshape(-1, 2)
        garr = host_local_to_global(
            hmesh, x[args.process_id * local:(args.process_id + 1) * local])
        total = jax.jit(
            lambda a: jnp.sum(a),
            out_shardings=NamedSharding(hmesh, P()))(garr)
        result["hybrid_sum"] = float(total)
        result["hybrid_expected"] = float(np.sum(x))

    with open(args.out, "w") as f:
        json.dump(result, f)
    print("worker done:", result, flush=True)


if __name__ == "__main__":
    main()
