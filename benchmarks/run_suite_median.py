"""Run the full bench suite N times (fresh process each) and aggregate
median ± spread per metric — the pinned perf-table methodology (VERDICT r2
item 1: single-run bests swung up to 2.9x between rounds on the axon
relay; every BASELINE.md row now reports the median of N runs with its
min-max spread).

Writes ``benchmarks/results_median.json`` (full per-run values + medians)
and merge-updates ``benchmarks/results.json`` metrics with the medians
(adding ``spread`` = max/min over runs and ``n_runs``), so every consumer
of results.json sees pinned numbers.

Run: cd /root/repo && python benchmarks/run_suite_median.py [--runs 3]
"""

import argparse
import json
import os
import statistics
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--reuse", action="store_true",
                    help="keep existing out/suite_run{i}.json files instead "
                         "of re-running them (crash/timeout recovery)")
    ap.add_argument("--script", type=str, default="bench_suite.py",
                    help="bench script to run (must accept --out); e.g. "
                         "bench_glow_full.py for the full-recipe rows")
    ap.add_argument("--only", type=str, default=None,
                    help="passed through as the suite's --only label "
                         "filter; medians for the measured rows are "
                         "merge-updated into results_median.json instead "
                         "of overwriting it")
    args = ap.parse_args()
    tag = os.path.splitext(os.path.basename(args.script))[0]
    tag = "suite" if tag == "bench_suite" else tag
    if args.only:
        tag = f"{tag}_only_{args.only}"

    run_metrics = []
    for i in range(args.runs):
        out = os.path.join(HERE, f"out/{tag}_run{i}.json")
        os.makedirs(os.path.dirname(out), exist_ok=True)
        if args.reuse and os.path.exists(out):
            with open(out) as f:
                run_metrics.append(json.load(f)["metrics"])
            print(f"run {i}: reused {out}", flush=True)
            continue
        t0 = time.time()
        cmd = [sys.executable, os.path.join(HERE, args.script),
               "--out", out]
        if args.only:
            cmd += ["--only", args.only]
        r = subprocess.run(
            cmd, cwd=os.path.dirname(HERE), capture_output=True, text=True)
        if r.returncode != 0:
            print(r.stdout[-2000:], r.stderr[-2000:], file=sys.stderr)
            raise SystemExit(f"suite run {i} failed")
        with open(out) as f:
            run_metrics.append(json.load(f)["metrics"])
        print(f"run {i}: {time.time() - t0:.0f}s", flush=True)

    agg = {}
    for name in run_metrics[0]:
        vals = [rm[name]["value"] for rm in run_metrics if name in rm]
        med = statistics.median(vals)
        agg[name] = dict(run_metrics[-1][name])
        agg[name].update({
            "value": round(med, 2),
            "runs": [round(v, 2) for v in vals],
            "spread": round(max(vals) / max(min(vals), 1e-12), 3),
            "n_runs": len(vals),
        })
        print(f"{name}: median {med:.2f} {agg[name].get('unit', '')} "
              f"(spread x{agg[name]['spread']})", flush=True)

    if tag == "suite":
        med_path = os.path.join(HERE, "results_median.json")
        with open(med_path, "w") as f:
            json.dump({"n_runs": args.runs, "metrics": agg}, f, indent=2)
    else:
        med_path = os.path.join(HERE, f"out/{tag}_median.json")
        with open(med_path, "w") as f:
            json.dump({"n_runs": args.runs, "metrics": agg}, f, indent=2)
        if args.only:
            # a targeted re-measure supersedes those rows in the pinned
            # full-suite medians file
            rm_path = os.path.join(HERE, "results_median.json")
            if os.path.exists(rm_path):
                with open(rm_path) as f:
                    pinned = json.load(f)
                pinned.setdefault("metrics", {}).update(agg)
                # rows merged by --only carry their own n_runs; the file's
                # top-level n_runs only describes never-re-measured rows
                pinned["n_runs_note"] = ("per-row n_runs is authoritative; "
                                         "top-level n_runs describes the "
                                         "original full-suite batch only")
                with open(rm_path, "w") as f:
                    json.dump(pinned, f, indent=2)

    results = os.path.join(HERE, "results.json")
    data = {}
    if os.path.exists(results):
        with open(results) as f:
            data = json.load(f)
    data.setdefault("metrics", {}).update(agg)
    data["suite_methodology"] = (f"median of {args.runs} full-suite runs, "
                                 "two-point-fit timing per metric")
    with open(results, "w") as f:
        json.dump(data, f, indent=2)
    print("wrote results_median.json and merged medians into results.json")


if __name__ == "__main__":
    main()
