"""Image-NSF train step: fused-Pallas vs gather-free dense spline A/B
(same model/params), two-point launch-overhead cancellation."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import optax

import nf_tpu.models as models
from bench_suite import _two_point_steps, record
from nf_tpu.ops import splines, splines_pallas
from nf_tpu.parallel import init_train_state, make_forward_kld_step
from nf_tpu.utils.profiling import enable_compilation_cache


def run(use_pallas, fused_bwd=True, bwd_kernel="analytic", batch=64, L=2,
        K=4, hidden=64, reps=16):
    splines.set_pallas_enabled(use_pallas)
    splines_pallas.set_pallas_bwd_enabled(fused_bwd)
    splines_pallas.set_pallas_bwd_kernel(bwd_kernel)
    key = jax.random.PRNGKey(0)
    model = models.build_image_nsf(key, input_shape=(3, 32, 32), L=L, K=K,
                                   hidden_channels=hidden)
    x = jax.random.uniform(key, (batch, 3, 32, 32), minval=0.01, maxval=0.99)
    model = model.init_from_data(x)
    opt = optax.adam(1e-3)
    state, static = init_train_state(model, opt)
    step = make_forward_kld_step(static, opt)
    state, loss = step(state, x)
    float(loss)  # host fetch: block_until_ready can no-op on the relay
    dt = _two_point_steps(lambda s: step(s, x), state, reps)
    if use_pallas:
        name = ("pallas" if bwd_kernel == "analytic"
                else "pallas_autodiff_bwd") if fused_bwd \
            else "pallas_dense_bwd"
    else:
        name = "dense"
    record(f"image_nsf_l2_k4_train_step_{name}", batch / dt, "images/s",
           ms_per_step=dt * 1e3)
    splines.set_pallas_enabled(True)
    splines_pallas.set_pallas_bwd_enabled(True)
    splines_pallas.set_pallas_bwd_kernel("analytic")


def main():
    import argparse
    import json

    from bench_suite import RESULTS

    ap = argparse.ArgumentParser()
    ap.add_argument("--out", type=str, default=None,
                    help="write metrics to this path (run_suite_median.py)")
    args = ap.parse_args()

    enable_compilation_cache()
    print("backend:", jax.default_backend(), flush=True)
    run(True, fused_bwd=True)    # fused fwd + analytic fused bwd (default)
    run(True, fused_bwd=True, bwd_kernel="autodiff")  # round-2 vjp kernel
    run(True, fused_bwd=False)   # round-1: fused fwd, dense one-hot bwd
    run(False)                   # all-dense one-hot path
    if args.out:
        with open(args.out, "w") as f:
            json.dump({"backend": jax.default_backend(),
                       "metrics": RESULTS}, f, indent=2)
        print("wrote", args.out)


if __name__ == "__main__":
    main()
