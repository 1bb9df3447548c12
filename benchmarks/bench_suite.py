"""Multi-metric TPU benchmark suite.

Methodology: the axon relay distorts naive timings in BOTH directions —
async dispatch loops under-report, and every executable launch carries a
large fixed overhead (measured ~30-35 ms: a trivial Pallas copy kernel
"takes" the same 2 ms/rep at REPS=16 as the real spline kernel,
``benchmarks/exp_reps_sweep.py``). So every metric (a) chains REPS
applications inside ONE jitted ``lax.scan`` with a data dependency, and
(b) measures TWO chain lengths R and 4R and reports the two-point fit
``d = (wall(4R) - wall(R)) / 3R`` — the launch overhead C in
``wall(R) = C + R*d`` cancels exactly, leaving true per-application device
time.

Writes ``benchmarks/results.json`` and prints one line per metric.
``python bench.py`` at the repo root remains the single-line headline the
driver records; this suite is the broader perf story.

Per-metric ``reps`` are sized so the R1 span is >=~40 ms of device time
(from measured per-application times): the 4R-R delta must sit well above
the relay's +-5-10 ms wall jitter or the two-point slope is noise (the
round-2 suite used fixed small reps and the fast rows swung up to ~10x
run-to-run). Train-step rows are Python-loop dispatches (launches
pipeline; no compile cost for longer runs); chain rows compile one scan
per length, deterministic across runs so the compilation cache hits.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax import lax

import nf_tpu.models as models
from nf_tpu.ops import splines

RESULTS = {}


def record(name, value, unit, **extra):
    RESULTS[name] = dict(value=round(value, 2), unit=unit, **extra)
    print(f"{name:40s} {value:14.1f} {unit}", flush=True)


def _force(r):
    """Force real completion: fetch one scalar to the host. On the axon
    relay ``block_until_ready`` can be a NO-OP for buffers that were never
    materialized by a host fetch (measured: a fresh chain's block returned
    in 0.03 ms while the actual compile+run took 134 s and was only paid by
    the first fetch), so wall-timing a block_until_ready measures nothing.
    Only a host fetch is a reliable sync point."""
    leaf = jax.tree_util.tree_leaves(r)[0]
    return float(jnp.asarray(leaf).ravel()[0])


def _perturb(x0, i):
    """Per-try input perturbation so the relay's identical-(executable,args)
    memoization cannot serve a cached result (see CLAUDE.md). Floats get a
    tiny additive epsilon; integer arrays (e.g. uint32 PRNG keys) get +i."""
    if isinstance(x0, jax.Array):
        if jnp.issubdtype(x0.dtype, jnp.inexact):
            return x0 + jnp.asarray(1e-6 * (i + 1), x0.dtype)
        if jnp.issubdtype(x0.dtype, jnp.integer):
            return x0 + jnp.asarray(i + 1, x0.dtype)
    return x0


def _best_wall(fn, x0, tries=5):
    """Best-of-N wall time of ``fn(x0)`` with a host-fetch sync and a
    perturbed input per try (both required on the relay, see _force)."""
    best = float("inf")
    for i in range(tries):
        xp = _perturb(x0, i)
        _force(xp)  # materialize the perturbed input outside the timed span
        t0 = time.perf_counter()
        _force(fn(xp))
        best = min(best, time.perf_counter() - t0)
    return best


def warmup_with_retries(fn, *args, attempts=3):
    """First call (compile) with retries around flaky remote-compile
    transport errors on the relay. Fetches a scalar: block_until_ready
    alone does not guarantee the remote compile actually finished."""
    for attempt in range(attempts):
        try:
            r = fn(*args)
            _force(r)
            return
        except Exception as e:  # pragma: no cover - transport flake
            if attempt == attempts - 1:
                raise
            print(f"  retry after: {type(e).__name__}", flush=True)
            time.sleep(5)


def _two_point_fit(t1, t2, r1, r2, label):
    """Slope of wall(R) = C + R*d. A non-positive slope means relay noise
    swamped the extra reps; fall back to the conservative upper bound
    wall(R2)/R2 (includes launch overhead, so it UNDERSTATES throughput)
    rather than recording an absurd number."""
    d = (t2 - t1) / (r2 - r1)
    if d <= 0:
        print(f"  [{label}] two-point slope <= 0 (noise); reporting "
              f"conservative wall/reps upper bound", flush=True)
        return t2 / r2
    return d


def compile_scan_chain(make_body, n):
    """jit a length-``n`` lax.scan chain of ``make_body`` applications."""

    @jax.jit
    def chain(x):
        return lax.scan(lambda c, _: (make_body(c), None), x, None,
                        length=n)[0]
    return chain


def timed_chain(make_body, x0, reps, label="chain"):
    """Two-point scan-chain timing; returns true seconds per application
    (fixed launch overhead cancelled — see module docstring)."""
    r1, r2 = reps, 4 * reps
    c1 = compile_scan_chain(make_body, r1)
    c2 = compile_scan_chain(make_body, r2)
    warmup_with_retries(c1, x0)
    warmup_with_retries(c2, x0)
    t1 = _best_wall(c1, x0)
    t2 = _best_wall(c2, x0)
    return _two_point_fit(t1, t2, r1, r2, label)


def _step_flops(step_fn, *args):
    """FLOPs of one compiled train step from XLA cost analysis (None if the
    backend doesn't report them)."""
    try:
        c = jax.jit(step_fn).lower(*args).compile().cost_analysis()
        c = c[0] if isinstance(c, (list, tuple)) else c
        return float(c.get("flops")) if c else None
    except Exception:
        return None


def _two_point_steps(one_step, state0, reps):
    """Two-point timing for a jitted train step driven by a Python loop of
    async dispatches: wall(R) = C + R*d; the fixed dispatch/launch overhead
    C cancels between R and 4R."""

    def run(n):
        best = float("inf")
        for i in range(3):
            # Perturb every float leaf so no (executable, args) pair repeats
            # across tries (relay memoization, see _perturb/_force).
            eps = 1e-9 * (i + 1)
            s = jax.tree_util.tree_map(
                lambda a: a + eps
                if hasattr(a, "dtype") and jnp.issubdtype(a.dtype, jnp.inexact)
                else a, state0)
            _force(s)
            t0 = time.perf_counter()
            for _ in range(n):
                s, loss = one_step(s)
            _force(loss)  # host fetch: the only reliable relay sync point
            best = min(best, time.perf_counter() - t0)
        return best

    t1, t2 = run(reps), run(4 * reps)
    return _two_point_fit(t1, t2, reps, 4 * reps, "steps")


def bench_realnvp_roundtrip(batch=1 << 16, K=16, hidden=128, reps=32):
    key = jax.random.PRNGKey(0)
    model = models.build_realnvp(key, dim=2, K=K, hidden=[hidden, hidden])

    def body(x):
        z, ld_f = model.forward_and_log_det(x)
        x2, ld_i = model.inverse_and_log_det(z)
        return x2 + 1e-12 * (ld_f + ld_i)[:, None]

    dt = timed_chain(body, jax.random.normal(key, (batch, 2)), reps)
    record("realnvp_k16_roundtrip", batch / dt, "samples/s")


def bench_spline(n=1 << 21, K=8, reps=16):
    """Two flavors per path: ``as_fed`` makes the params depend on the loop
    carry — what a model pays when a conditioner produces fresh params every
    call (includes the XLA-side (N,K)->(K,N) feed transposes) — while the
    pallas ``kernel`` flavor uses loop-constant params, which XLA constant-
    folds through the transposes, isolating the kernel body itself
    (measured at the HBM roofline: a same-footprint copy kernel is no
    faster, ``exp_overhead_floor.py``)."""
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 4)
    uw = jax.random.normal(ks[1], (n, K))
    uh = jax.random.normal(ks[2], (n, K))
    ud = jax.random.normal(ks[3], (n, K - 1))

    def make_body(use_pallas, varying):
        def body(x):
            # ALL param arrays must depend on the carry or XLA const-folds
            # their feed transposes out of the measured slope
            if varying:
                eps = x[:, None] * 1e-12
                w, h, d = uw + eps, uh + eps, ud + eps
            else:
                w, h, d = uw, uh, ud
            y, ld = splines.unconstrained_rational_quadratic_spline(
                x, w, h, d, tails="linear", tail_bound=2.5,
                use_pallas=use_pallas)
            return jnp.clip(y + ld * 1e-9, -3.0, 3.0)
        return body

    # kernel-only flavor: pre-padded constant params fed straight to the
    # fused op so XLA constant-folds the feed transposes at compile time
    import numpy as np

    from nf_tpu.ops.splines_pallas import fused_unconstrained_rqs

    c = float(np.log(np.exp(1 - splines.DEFAULT_MIN_DERIVATIVE) - 1))
    udp = jnp.pad(ud, ((0, 0), (1, 1)), constant_values=c)

    def kernel_body(x):
        y, ld = fused_unconstrained_rqs(x, uw, uh, udp, 2.5)
        return jnp.clip(y + ld * 1e-9, -3.0, 3.0)

    x0 = jax.random.normal(ks[0], (n,)) * 3
    dt = timed_chain(kernel_body, x0, reps, label="rqs_kernel")
    record("rqs_spline_pallas_kernel", n / dt / 1e9, "Gelem/s",
           elements=n, num_bins=K)
    for name, use_pallas, r in [
            ("rqs_spline_pallas_as_fed", True, reps),
            ("rqs_spline_dense_xla", False, 4)]:
        dt = timed_chain(make_body(use_pallas, True), x0, r, label=name)
        record(name, n / dt / 1e9, "Gelem/s", elements=n, num_bins=K)

    # bin-major as-fed: params born in the kernel's (K, N) layout — what 2D
    # models pay since the conditioner heads emit transposed bin-major
    # output (`Linear.call_transposed`); the (N,K)->(K,N) feed shuffle the
    # plain as_fed row measures no longer exists on this path
    uw_t = jax.random.normal(ks[1], (K, n))
    uh_t = jax.random.normal(ks[2], (K, n))
    ud_t = jax.random.normal(ks[3], (K - 1, n))

    def body_kmajor(x):
        eps = x[None, :] * 1e-12
        y, ld = splines.unconstrained_rational_quadratic_spline_kmajor(
            x, uw_t + eps, uh_t + eps, ud_t + eps, tails="linear",
            tail_bound=2.5)
        return jnp.clip(y + ld * 1e-9, -3.0, 3.0)

    dt = timed_chain(body_kmajor, x0, reps, label="rqs_asfed_kmajor")
    record("rqs_spline_pallas_as_fed_kmajor", n / dt / 1e9, "Gelem/s",
           elements=n, num_bins=K)


def bench_nsf_sample_logprob(batch=1 << 14, K=8, hidden=128, reps=64):
    key = jax.random.PRNGKey(0)
    model = models.build_nsf(key, dim=2, K=K, hidden=hidden, num_bins=8)

    def body(x):
        lp = model.log_prob(x)
        return x + 1e-12 * lp[:, None]

    dt = timed_chain(body, jax.random.normal(key, (batch, 2)), reps)
    record("nsf_k8_log_prob", batch / dt, "evals/s")


def bench_maf_logprob(batch=1 << 14, K=8, hidden=128, reps=32):
    key = jax.random.PRNGKey(0)
    model = models.build_maf(key, dim=8, K=K, hidden=hidden)

    def body(x):
        lp = model.log_prob(x)
        return x + 1e-12 * lp[:, None]

    dt = timed_chain(body, jax.random.normal(key, (batch, 8)), reps)
    record("maf_k8_log_prob", batch / dt, "evals/s")


def _build_ar_nsf(key, dim=8, K=4, hidden=64, num_bins=8):
    """AR-NSF stack: AutoregressiveRationalQuadraticSpline + LULinearPermute
    (the classic MAF-asymmetric config: log_prob = 1 MADE pass, sample = D
    sequential passes, reference ``flows/affine/autoregressive.py:29-38``)."""
    import nf_tpu.flows as nff
    from nf_tpu.distributions import DiagGaussian

    keys = jax.random.split(key, 2 * K)
    flows = []
    for i in range(K):
        flows.append(nff.AutoregressiveRationalQuadraticSpline.create(
            keys[2 * i], num_input_channels=dim, num_blocks=2,
            num_hidden_channels=hidden, num_bins=num_bins))
        flows.append(nff.LULinearPermute.create(keys[2 * i + 1], dim))
    from nf_tpu import core

    return core.NormalizingFlow.create(
        DiagGaussian.create(dim, trainable=False), flows)


def bench_ar_nsf_sampling(batch=4096, dim=8, K=4, hidden=64, reps=96):
    """SAMPLING throughput of the autoregressive NSF — the direction that
    pays the D-pass MADE inverse as a ``lax.scan`` (previously unmeasured;
    log_prob is the cheap single-pass direction).

    reps 12 -> 96 in round 5: at ~0.4 ms/body the old R1 span was ~5 ms —
    inside the relay's wall jitter, which is where the row's x1.32 spread
    came from; 96 puts it at ~38 ms (the suite's sizing target)."""
    model = _build_ar_nsf(jax.random.PRNGKey(0), dim=dim, K=K,
                          hidden=hidden)

    def body(k):
        k, sub = jax.random.split(k)
        z, log_q = model.sample(sub, batch)
        return jax.random.fold_in(k, (jnp.sum(log_q) > 0).astype(jnp.int32))

    dt = timed_chain(body, jax.random.PRNGKey(1), reps, label="ar_sample")
    record(f"ar_nsf_k{K}_dim{dim}_sampling", batch / dt, "samples/s",
           note="D-pass MADE inverse per layer")


def bench_hais(chains=1 << 13, n_anneal=16, reps=256):
    """Stochastic-NF sampling throughput: HAIS chains/s (annealed HMC over
    a LinearInterpolation bridge; reference ``sampling/hais.py``)."""
    import numpy as np

    from nf_tpu.distributions import DiagGaussian, TwoModes
    from nf_tpu.sampling import HAIS

    hais = HAIS.create(np.linspace(1.0, 0.0, n_anneal + 1),
                       DiagGaussian.create(2, trainable=False), TwoModes(),
                       num_leapfrog=5, step_size=[0.1, 0.1],
                       log_mass=[0.0, 0.0])

    def body(k):
        k, sub = jax.random.split(k)
        z, log_w = hais.sample(sub, chains)
        # fold the result into the carried key for a data dependency
        return jax.random.fold_in(k, (jnp.sum(log_w) > 0).astype(jnp.int32))

    dt = timed_chain(body, jax.random.PRNGKey(0), reps, label="hais")
    record("hais_16step_hmc_sampling", chains / dt, "chains/s",
           chains=chains, anneal_steps=n_anneal)


def bench_residual_train_step(batch=1 << 9, K=16, hidden=128, reps=12):
    """Residual-flow training step, full reference recipe
    (``examples/residual.ipynb`` cells 1,3: K=16 iResBlocks over
    [2,128,128,2] Lipschitz MLPs, forward KLD with the stochastic log-det
    estimator, AdamW 3e-4/wd 1e-5, ``update_lipschitz(50)`` power
    iterations after the update) — all inside one jit, with the power-
    iteration buffer updates threaded through the step state."""
    import optax

    from nf_tpu.parallel.train import apply_post_update
    from nf_tpu.utils.module import combine, partition, partition_arrays
    from nf_tpu.utils.optim import update_lipschitz

    model = models.build_residual(jax.random.PRNGKey(0), K=K, hidden=hidden,
                                  n_hidden_layers=2)
    kd, ki = jax.random.split(jax.random.PRNGKey(1))
    x = 0.7 * jax.random.normal(kd, (batch, 2)) \
        + jnp.asarray([0.5, 0.25])  # two-moons-scale batch
    model = model.init_from_data(x, key=ki)
    params, static = partition(model)
    buffers, config = partition_arrays(static)
    opt = optax.adamw(3e-4, weight_decay=1e-5)

    @jax.jit
    def step(state):
        params, buffers, opt_state, key = state
        key, sub = jax.random.split(key)

        def loss_fn(p):
            m = combine(combine(p, buffers), config)
            return m.forward_kld(x, key=sub)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        params, buffers = apply_post_update(
            params, buffers, config, lambda m: update_lipschitz(m, 50))
        return (params, buffers, opt_state, key), loss

    state = (params, buffers, opt.init(params), jax.random.PRNGKey(2))
    state, loss = step(state)
    _force(loss)
    dt = _two_point_steps(step, state, reps)
    record(f"residual_k{K}_train_step", batch / dt, "samples/s",
           loss=float(loss), note="incl. update_lipschitz(50) per step")


def bench_glow_step(batch=64, L=2, K=8, hidden=128, reps=128,
                    mixed_precision=False):
    # reps doubled 32 -> 64 in round 4 and again 64 -> 128 in round 5 (the
    # round-4 pooled batches still spread x1.9 under relay contention; the
    # verdict asked for longer chains in one quiesced window).
    import optax

    from nf_tpu.parallel import init_train_state, make_forward_kld_step

    key = jax.random.PRNGKey(0)
    model = models.build_glow_multiscale(key, input_shape=(3, 32, 32),
                                         L=L, K=K, hidden_channels=hidden,
                                         scan=True,
                                         mixed_precision=mixed_precision)
    x = jax.random.uniform(key, (batch, 3, 32, 32), minval=0.01,
                           maxval=0.99)
    y = jnp.zeros((batch,), jnp.int32)
    model = model.init_from_data(x, y)
    opt = optax.adamax(1e-3)
    state, static = init_train_state(model, opt)
    step = make_forward_kld_step(static, opt)

    state, loss = step(state, (x, y))   # compile
    jax.block_until_ready(loss)
    dt = _two_point_steps(lambda s: step(s, (x, y)), state, reps)
    suffix = "_bf16" if mixed_precision else ""
    fl = _step_flops(step, state, (x, y))
    extra = {"tflops_per_s": round(fl / dt / 1e12, 2)} if fl else {}
    record(f"glow_l2_k8_train_step{suffix}", batch / dt, "images/s",
           loss=float(loss), **extra)


def bench_image_nsf_step(batch=64, L=2, K=4, hidden=64, reps=24):
    import optax

    from nf_tpu.parallel import init_train_state, make_forward_kld_step

    key = jax.random.PRNGKey(0)
    model = models.build_image_nsf(key, input_shape=(3, 32, 32), L=L, K=K,
                                   hidden_channels=hidden)
    x = jax.random.uniform(key, (batch, 3, 32, 32), minval=0.01,
                           maxval=0.99)
    model = model.init_from_data(x)
    opt = optax.adam(1e-3)
    state, static = init_train_state(model, opt)
    step = make_forward_kld_step(static, opt)
    state, loss = step(state, x)
    jax.block_until_ready(loss)
    dt = _two_point_steps(lambda s: step(s, x), state, reps)
    fl = _step_flops(step, state, x)
    extra = {"tflops_per_s": round(fl / dt / 1e12, 2)} if fl else {}
    record("image_nsf_l2_k4_train_step", batch / dt, "images/s",
           loss=float(loss), **extra)


def main(argv=None):
    import argparse

    from nf_tpu.utils.profiling import enable_compilation_cache

    ap = argparse.ArgumentParser()
    ap.add_argument("--out", type=str, default=None,
                    help="write metrics to this path instead of merging "
                         "into results.json (used by run_suite_median.py)")
    ap.add_argument("--only", type=str, default=None,
                    help="substring filter over bench labels: re-measure a "
                         "noisy row with more repetitions without paying "
                         "for the whole suite (labels: realnvp, spline, "
                         "nsf_logprob, maf, ar_nsf, hais, residual, glow, "
                         "glow_bf16, image_nsf)")
    args = ap.parse_args(argv)

    enable_compilation_cache()
    print(f"backend: {jax.default_backend()}  devices: {jax.devices()}")
    benches = [
        ("realnvp", bench_realnvp_roundtrip),
        ("spline", bench_spline),
        ("nsf_logprob", bench_nsf_sample_logprob),
        ("maf", bench_maf_logprob),
        ("ar_nsf", bench_ar_nsf_sampling),
        ("hais", bench_hais),
        ("residual", bench_residual_train_step),
        ("glow", bench_glow_step),
        ("glow_bf16", lambda: bench_glow_step(mixed_precision=True)),
        ("image_nsf", bench_image_nsf_step),
    ]
    for label, fn in benches:
        if args.only and args.only not in label:
            continue
        fn()
    if args.only and not RESULTS:
        raise SystemExit(f"--only {args.only!r} matched no bench labels")
    if args.out:
        with open(args.out, "w") as f:
            json.dump({"backend": jax.default_backend(),
                       "device": str(jax.devices()[0]),
                       "metrics": RESULTS}, f, indent=2)
        print("wrote", args.out)
        return
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "results.json")
    # Merge-update: other scripts (bench_glow_full, bench_torch_reference,
    # bench_image_nsf_ab) contribute rows of their own; a wholesale write
    # here would clobber them.
    data = {}
    if os.path.exists(out):
        with open(out) as f:
            data = json.load(f)
    data["backend"] = jax.default_backend()
    data["device"] = str(jax.devices()[0])
    data.setdefault("metrics", {}).update(RESULTS)
    with open(out, "w") as f:
        json.dump(data, f, indent=2)
    print("wrote", out)


if __name__ == "__main__":
    main()
