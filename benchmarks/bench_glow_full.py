"""Full reference Glow recipe (L=3 K=16 h=256, b=128) train-step timing,
f32 and bf16-mixed-precision, with two-point launch-overhead cancellation."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import optax

import nf_tpu.models as models
from bench_suite import _step_flops, _two_point_steps, record
from nf_tpu.parallel import init_train_state, make_forward_kld_step
from nf_tpu.utils.profiling import enable_compilation_cache


def save_results():
    """Merge this script's rows into results.json (they were previously
    print-only, so BASELINE.md had no persisted full-recipe bf16 row)."""
    import json

    from bench_suite import RESULTS

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


# TPU v5e (v5 lite) single-chip peaks for roofline fractions:
HBM_PEAK_GBPS = 819.0
MXU_PEAK_BF16_TFLOPS = 197.0


def _step_cost(step_fn, *args):
    """(flops, bytes_accessed) of one compiled step from XLA cost
    analysis — the basis for the HBM/MXU roofline fractions."""
    try:
        c = jax.jit(step_fn).lower(*args).compile().cost_analysis()
        c = c[0] if isinstance(c, (list, tuple)) else c
        if not c:
            return None, None
        return (float(c.get("flops") or 0) or None,
                float(c.get("bytes accessed") or 0) or None)
    except Exception:
        return None, None


def run(mixed_precision, batch=128, L=3, K=16, hidden=256, reps=8,
        remat=False):
    key = jax.random.PRNGKey(0)
    model = models.build_glow_multiscale(
        key, input_shape=(3, 32, 32), L=L, K=K, hidden_channels=hidden,
        scan=True, remat=remat, mixed_precision=mixed_precision)
    x = jax.random.uniform(key, (batch, 3, 32, 32), minval=0.01, maxval=0.99)
    y = jnp.zeros((batch,), jnp.int32)
    model = model.init_from_data(x, y)
    opt = optax.adamax(1e-3)
    state, static = init_train_state(model, opt)
    step = make_forward_kld_step(static, opt)
    state, loss = step(state, (x, y))
    float(loss)  # host fetch: block_until_ready can no-op on the relay
    dt = _two_point_steps(lambda s: step(s, (x, y)), state, reps)
    suffix = ("_bf16" if mixed_precision else "") + (
        f"_b{batch}" if batch != 128 else "") + ("_remat" if remat else "")
    fl, by = _step_cost(step, state, (x, y))
    extra = {}
    if fl:
        extra["tflops_per_s"] = round(fl / dt / 1e12, 2)
        extra["mxu_fraction_bf16peak"] = round(
            fl / dt / 1e12 / MXU_PEAK_BF16_TFLOPS, 4)
    if by:
        extra["hbm_gbps"] = round(by / dt / 1e9, 1)
        extra["hbm_fraction"] = round(by / dt / 1e9 / HBM_PEAK_GBPS, 3)
    record(f"glow_full_l3_k16_h256_train_step{suffix}", batch / dt,
           "images/s", ms_per_step=dt * 1e3, loss=float(loss), **extra)


def run_per_level(batch=256, K=16, hidden=256, reps=8,
                  mixed_precision=True):
    """Per-level roofline accounting (VERDICT r2 item 4): each Glow level's
    16-block stack as its own L=1 model at that level's channel/spatial
    geometry — level 0: 12ch 16x16, level 1: 24ch 8x8, level 2: 48ch 4x4
    (CIFAR L=3 recipe channel arithmetic, ref glow.ipynb cell 2)."""
    level_inputs = [("L0_12ch_16x16", (3, 32, 32)),
                    ("L1_24ch_8x8", (6, 16, 16)),
                    ("L2_48ch_4x4", (12, 8, 8))]
    for name, input_shape in level_inputs:
        key = jax.random.PRNGKey(0)
        model = models.build_glow_multiscale(
            key, input_shape=input_shape, L=1, K=K, hidden_channels=hidden,
            scan=True, mixed_precision=mixed_precision)
        x = jax.random.uniform(key, (batch,) + input_shape,
                               minval=0.01, maxval=0.99)
        y = jnp.zeros((batch,), jnp.int32)
        model = model.init_from_data(x, y)
        opt = optax.adamax(1e-3)
        state, static = init_train_state(model, opt)
        step = make_forward_kld_step(static, opt)
        state, loss = step(state, (x, y))
        float(loss)
        dt = _two_point_steps(lambda s: step(s, (x, y)), state, reps)
        fl, by = _step_cost(step, state, (x, y))
        extra = {}
        if fl:
            extra["tflops_per_s"] = round(fl / dt / 1e12, 2)
            extra["mxu_fraction_bf16peak"] = round(
                fl / dt / 1e12 / MXU_PEAK_BF16_TFLOPS, 4)
        if by:
            extra["hbm_gbps"] = round(by / dt / 1e9, 1)
            extra["hbm_fraction"] = round(by / dt / 1e9 / HBM_PEAK_GBPS, 3)
        record(f"glow_level_{name}_k16_train_step_b{batch}", batch / dt,
               "images/s", ms_per_step=dt * 1e3, **extra)


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--per-level", action="store_true",
                    help="per-level roofline rows only")
    ap.add_argument("--out", type=str, default=None,
                    help="write metrics to this path instead of merging "
                         "into results.json (used by run_suite_median.py)")
    args = ap.parse_args()

    def _finish():
        if args.out:
            import json

            from bench_suite import RESULTS

            with open(args.out, "w") as f:
                json.dump({"backend": jax.default_backend(),
                           "metrics": RESULTS}, f, indent=2)
            print("wrote", args.out)
        else:
            save_results()

    enable_compilation_cache()
    print("backend:", jax.default_backend(), flush=True)
    if args.per_level:
        run_per_level()
        _finish()
        return
    run(False)
    run(True)
    # batch scaling: b=128 underfills the chip on the small convs
    # (BASELINE.md achieved-FLOPs analysis); b=256+ rows quantify it
    run(False, batch=256)
    run(True, batch=256)
    # the tuned max-throughput ceiling (VERDICT r2 item 4): largest batch
    # that fits, bf16 conditioners, remat where HBM requires it
    for batch, remat in ((512, False), (512, True), (1024, True)):
        try:
            run(True, batch=batch, reps=4, remat=remat)
        except Exception as e:  # can exceed HBM on a single v5e
            print(f"b={batch} bf16 remat={remat} row skipped: "
                  f"{type(e).__name__}: {e}")
    _finish()


if __name__ == "__main__":
    main()
