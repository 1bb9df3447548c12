"""Reference-column runner: same-recipe PyTorch-CPU timings for every
results.json row that the reference package can express.

Run AFTER ``bench_suite.py``; merges a ``reference`` block into each metric:

    python benchmarks/bench_torch_reference.py

Configs mirror the JAX suite exactly (dims, depths, hidden sizes, batch
sizes). Rows the reference CANNOT run get an explicit note instead of a
number (image-NSF: the reference ships the 4D spline coupling pieces but no
assembled multi-scale image NSF; bf16 Glow: the reference has no mixed-
precision story).
"""

import json
import os
import sys
import time

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
RESULTS_PATH = os.path.join(HERE, "results.json")

sys.path.insert(0, "/root/reference")

import torch  # noqa: E402
import normflows as nf  # noqa: E402

torch.set_num_threads(os.cpu_count() or 1)

REF = {}


def record(name, value, unit, **extra):
    REF[name] = dict(value=round(value, 2), unit=unit, **extra)
    print(f"{name:40s} {value:14.1f} {unit}", flush=True)


def _time_loop(fn, iters=3):
    fn()  # warmup
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def bench_nsf_logprob(batch=1 << 14, K=8, hidden=128, num_bins=8):
    torch.manual_seed(0)
    flows = []
    for i in range(K):
        flows.append(nf.flows.CoupledRationalQuadraticSpline(
            2, 2, hidden, num_bins=num_bins, reverse_mask=(i % 2 == 1)))
        flows.append(nf.flows.LULinearPermute(2))
    model = nf.NormalizingFlow(nf.distributions.DiagGaussian(
        2, trainable=False), flows).eval()
    x = torch.randn(batch, 2)
    with torch.no_grad():
        dt = _time_loop(lambda: model.log_prob(x))
    record("nsf_k8_log_prob", batch / dt, "evals/s")


def bench_maf_logprob(batch=1 << 14, K=8, hidden=128, dim=8):
    torch.manual_seed(0)
    flows = []
    for i in range(K):
        flows.append(nf.flows.MaskedAffineAutoregressive(dim, hidden,
                                                         num_blocks=2))
        flows.append(nf.flows.Permute(dim))
    model = nf.NormalizingFlow(nf.distributions.DiagGaussian(
        dim, trainable=False), flows).eval()
    x = torch.randn(batch, dim)
    with torch.no_grad():
        dt = _time_loop(lambda: model.log_prob(x))
    record("maf_k8_log_prob", batch / dt, "evals/s")


def bench_ar_nsf_sampling(batch=4096, dim=8, K=4, hidden=64, num_bins=8):
    torch.manual_seed(0)
    flows = []
    for i in range(K):
        flows.append(nf.flows.AutoregressiveRationalQuadraticSpline(
            dim, 2, hidden, num_bins=num_bins))
        flows.append(nf.flows.LULinearPermute(dim))
    model = nf.NormalizingFlow(nf.distributions.DiagGaussian(
        dim, trainable=False), flows).eval()
    with torch.no_grad():
        dt = _time_loop(lambda: model.sample(batch), iters=2)
    record(f"ar_nsf_k{K}_dim{dim}_sampling", batch / dt, "samples/s",
           note="D sequential MADE passes per layer "
                "(autoregressive.py:29-38)")


def bench_hais(chains=1 << 13, n_anneal=16):
    torch.manual_seed(0)
    hais = nf.sampling.HAIS(
        torch.linspace(1.0, 0.0, n_anneal + 1),
        nf.distributions.DiagGaussian(2, trainable=False),
        nf.distributions.TwoModes(2.0, 0.2),
        num_leapfrog=5, step_size=torch.tensor([0.1, 0.1]),
        log_mass=torch.tensor([0.0, 0.0]))
    dt = _time_loop(lambda: hais.sample(chains), iters=2)
    record("hais_16step_hmc_sampling", chains / dt, "chains/s")


def bench_residual_train_step(batch=1 << 9, K=16, hidden=128):
    """Residual-flow training step, full reference recipe
    (examples/residual.ipynb cells 2,5: K=16 Residual(LipschitzMLP
    [2,128,128,2], L=0.9) + ActNorm, forward KLD, Adam 3e-4/wd 1e-5,
    update_lipschitz(50) after every step)."""
    torch.manual_seed(0)
    flows = []
    for _ in range(K):
        net = nf.nets.LipschitzMLP([2, hidden, hidden, 2], init_zeros=True,
                                   lipschitz_const=0.9)
        flows += [nf.flows.Residual(net, reduce_memory=True),
                  nf.flows.ActNorm(2)]
    model = nf.NormalizingFlow(nf.distributions.DiagGaussian(
        2, trainable=False), flows)
    x = 0.7 * torch.randn(batch, 2) + torch.tensor([0.5, 0.25])
    model.log_prob(x)  # ActNorm data-dependent init
    optimizer = torch.optim.Adam(model.parameters(), lr=3e-4,
                                 weight_decay=1e-5)

    def one_step():
        optimizer.zero_grad()
        loss = model.forward_kld(x)
        if ~(torch.isnan(loss) | torch.isinf(loss)):
            loss.backward()
            optimizer.step()
        nf.utils.update_lipschitz(model, 50)

    dt = _time_loop(one_step, iters=2)
    record(f"residual_k{K}_train_step", batch / dt, "samples/s",
           note="incl. update_lipschitz(50) per step")


def bench_realnvp_roundtrip(batch=1 << 16, K=16, hidden=128):
    """EQUAL-batch counterpart of bench.py's headline (B = 65536 on both
    sides now; the round-1 torch column ran B=4096)."""
    torch.manual_seed(0)
    flows = []
    for i in range(K):
        b = torch.tensor([(j + i) % 2 for j in range(2)],
                         dtype=torch.float32)
        s = nf.nets.MLP([2, hidden, hidden, 2], init_zeros=True)
        t = nf.nets.MLP([2, hidden, hidden, 2], init_zeros=True)
        flows.append(nf.flows.MaskedAffineFlow(b, t, s))
        flows.append(nf.flows.ActNorm(2))
    model = nf.NormalizingFlow(nf.distributions.DiagGaussian(2), flows)
    model.eval()
    x = torch.randn(batch, 2)

    def body():
        with torch.no_grad():
            z, _ = model.forward_and_log_det(x)
            model.inverse_and_log_det(z)

    dt = _time_loop(body, iters=2)
    record("realnvp_k16_roundtrip", batch / dt, "samples/s")


CANNOT_RUN = {
    "image_nsf_l2_k4_train_step": (
        "reference ships the 4D spline coupling + ConvResidualNet pieces "
        "but no assembled multi-scale image-NSF model"),
    "glow_l2_k8_train_step_bf16": (
        "reference has no mixed-precision path (pure f32 eager)"),
    "rqs_spline_pallas_kernel": (
        "reference spline is an eager op composition, measured as "
        "rqs_spline gather lowering in BASELINE.md (~0.008 Gelem/s)"),
    "rqs_spline_pallas_as_fed_kmajor": (
        "reference has no bin-major parameter layout; its eager spline "
        "always consumes (N, K) feature-major params"),
}


def _run_all():
    print(f"torch {torch.__version__}, threads {torch.get_num_threads()}")
    bench_realnvp_roundtrip()
    bench_nsf_logprob()
    bench_maf_logprob()
    bench_ar_nsf_sampling()
    bench_hais()
    bench_residual_train_step()


def _fingerprint():
    import platform

    return {"cpu_count": os.cpu_count(), "machine": platform.machine(),
            "torch": torch.__version__,
            "threads": torch.get_num_threads()}


def cmd_pin(runs=3):
    """Median-of-N pinned reference columns (same methodology as the jax
    suite's ``run_suite_median.py``: fresh process per run, per-metric
    median + spread), recorded with the environment fingerprint in
    ``baseline_records.json`` and merged as ``reference`` blocks into
    ``results.json``. Quiesce the host first (this is the 1-CPU box)."""
    import statistics
    import subprocess

    per_run = []
    for i in range(runs):
        out = os.path.join(HERE, f"out/torch_ref_run{i}.json")
        os.makedirs(os.path.dirname(out), exist_ok=True)
        t0 = time.time()
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--out", out],
            cwd=os.path.dirname(HERE), capture_output=True, text=True)
        if r.returncode != 0:
            print(r.stdout[-2000:], r.stderr[-2000:], file=sys.stderr)
            raise SystemExit(f"reference run {i} failed")
        with open(out) as f:
            per_run.append(json.load(f)["metrics"])
        print(f"run {i}: {time.time() - t0:.0f}s", flush=True)

    agg = {}
    for name in per_run[0]:
        vals = [rm[name]["value"] for rm in per_run if name in rm]
        agg[name] = dict(per_run[-1][name])
        agg[name].update({
            "value": round(statistics.median(vals), 2),
            "runs": [round(v, 2) for v in vals],
            "spread": round(max(vals) / max(min(vals), 1e-12), 3),
            "median_of": len(vals),
        })
        print(f"{name}: median {agg[name]['value']} "
              f"{agg[name].get('unit', '')} (spread x{agg[name]['spread']})",
              flush=True)

    rec_path = os.path.join(HERE, "baseline_records.json")
    records = []
    if os.path.exists(rec_path):
        with open(rec_path) as f:
            records = json.load(f)
    records = [r for r in records if "suite_reference" not in r]
    records.append({
        "fingerprint": _fingerprint(),
        "suite_reference": agg,
        "load_avg_1m": round(os.getloadavg()[0], 2),
        "measured_at": time.strftime("%Y-%m-%dT%H:%M:%S")})
    with open(rec_path, "w") as f:
        json.dump(records, f, indent=1)
    print("pinned medians into", rec_path)

    _merge(agg)


def _merge(ref_metrics):
    if os.path.exists(RESULTS_PATH):
        with open(RESULTS_PATH) as f:
            results = json.load(f)
        for name, metric in results.get("metrics", {}).items():
            if name in ref_metrics:
                ref = ref_metrics[name]
                metric["reference"] = ref
                if ref["value"]:
                    metric["vs_reference"] = round(
                        metric["value"] / ref["value"], 1)
            elif name in CANNOT_RUN:
                metric["reference"] = {"note": CANNOT_RUN[name]}
        results["reference_runner"] = {
            "torch_version": torch.__version__,
            "threads": torch.get_num_threads()}
        with open(RESULTS_PATH, "w") as f:
            json.dump(results, f, indent=2)
        print("merged reference columns into", RESULTS_PATH)
    else:
        print("results.json not found; reference numbers printed only")


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--out", type=str, default=None,
                    help="single run: dump metrics json here, no merge")
    ap.add_argument("--pin", action="store_true",
                    help="median-of-N pinned columns (fresh process per "
                         "run) -> baseline_records.json + results.json")
    ap.add_argument("--runs", type=int, default=3)
    args = ap.parse_args()
    if args.pin:
        cmd_pin(args.runs)
        return
    _run_all()
    if args.out:
        with open(args.out, "w") as f:
            json.dump({"metrics": REF}, f, indent=2)
        print("wrote", args.out)
    else:
        _merge(REF)


if __name__ == "__main__":
    main()
