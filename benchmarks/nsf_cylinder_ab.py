"""Same-recipe NSF-cylinder reverse-KLD A/B: reference PyTorch (host CPU)
vs nf_tpu (TPU) — the second measured accuracy anchor (VERDICT r2 item 8),
with the same methodology as ``glow_bpd_ab.py``.

Both frameworks train the reference paper's flagship circular-NSF recipe
(``/root/reference/examples/paper_example_nsf.ipynb`` cells 5-11: a
``CircularAutoregressiveRationalQuadraticSpline`` stack on a
``UniformGaussian`` base fitting the *normalized* Gauss-von Mises cylinder
density ``p(x, phi) = exp(-x^2/2 + cos(phi - 3x)) / ((2pi)^1.5 I0(1))``)
at a reduced scale (K/hidden/bins/batch below; the full recipe is K=12,
512 hidden, 2^14 samples, 10k iters), with Adam + cosine LR and the
notebook's NaN-skip guard.

Because the target is NORMALIZED, the converged reverse KLD
``E_q[log q - log p]`` is comparable across frameworks on an absolute
scale (perfect fit = 0): at matching checkpoints each leg draws a fixed
2^15-sample eval batch from its own model and reports the KLD estimate
with its Monte-Carlo sem. The MC error band = jax init-seed spread
(seeds 0/1) + 2x the eval sem, as in the Glow A/B.

What is intentionally NOT shared (unlike the image A/B there is no
dataset): parameter init RNG, per-iteration sample draws, f32-TPU vs
f64-capable-CPU accumulation. The claim under test is that both
frameworks' recipes converge to the same KLD within that band.

Usage (repo root):
    python benchmarks/nsf_cylinder_ab.py torch --iters 3000   # CPU, slow
    python benchmarks/nsf_cylinder_ab.py jax   --iters 3000   # TPU
    python benchmarks/nsf_cylinder_ab.py jax   --iters 3000 --model-seed 1
    python benchmarks/nsf_cylinder_ab.py report
"""

import argparse
import json
import os
import sys
import time

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
OUT = os.path.join(HERE, "out")

# --- the shared reduced recipe (reference notebook cells 8+11, scaled) ---
K, HIDDEN, NUM_BINS = 6, 128, 8
NUM_SAMPLES = 2 ** 12          # reverse-KLD batch (notebook: 2^14)
LR = 5e-4                      # Adam + cosine anneal to 0 over --iters
TAIL_BOUND = (5.0, np.pi)      # (gaussian coord, circular coord)
EVAL_N, EVAL_CHUNK = 2 ** 15, 2 ** 13
EVAL_ITERS = (100, 250, 500, 1000, 1500, 2000, 2500, 3000)
LOG_CONST = float(-1.5 * np.log(2 * np.pi) - np.log(np.i0(1)))


def jsonl_append(path, row):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "a") as f:
        f.write(json.dumps(row) + "\n")
        f.flush()


# ---------------------------------------------------------------- torch ---
def cmd_torch(args):
    sys.path.insert(0, "/root/reference")
    import torch
    import normflows as nf

    torch.manual_seed(args.model_seed)
    torch.set_num_threads(os.cpu_count() or 1)

    class GaussianVonMises(nf.distributions.Target):
        # verbatim semantics of reference paper_example_nsf.ipynb cell 5
        def __init__(self):
            super().__init__(prop_scale=torch.tensor(2 * np.pi),
                             prop_shift=torch.tensor(-np.pi))
            self.n_dims = 2
            self.max_log_prob = -1.99
            self.log_const = LOG_CONST

        def log_prob(self, x):
            return (-0.5 * x[:, 0] ** 2
                    + torch.cos(x[:, 1] - 3 * x[:, 0]) + self.log_const)

    target = GaussianVonMises()
    base = nf.distributions.UniformGaussian(
        2, [1], torch.tensor([1., 2 * np.pi]))
    layers = [nf.flows.CircularAutoregressiveRationalQuadraticSpline(
        2, 1, HIDDEN, [1], num_bins=NUM_BINS,
        tail_bound=torch.tensor(list(TAIL_BOUND)), permute_mask=True)
        for _ in range(K)]
    model = nf.NormalizingFlow(base, layers, target)

    optimizer = torch.optim.Adam(model.parameters(), lr=LR)
    scheduler = torch.optim.lr_scheduler.CosineAnnealingLR(
        optimizer, args.iters)

    def eval_kld(it, wall):
        model.eval()
        train_rng = torch.get_rng_state()  # keep eval out of the train stream
        with torch.no_grad():
            torch.manual_seed(10_000 + args.eval_seed)
            diffs = []
            for _ in range(EVAL_N // EVAL_CHUNK):
                z, log_q = model.sample(EVAL_CHUNK)
                diffs.append((log_q - target.log_prob(z)).numpy())
            d = np.concatenate(diffs)
        torch.set_rng_state(train_rng)
        model.train()
        good = np.isfinite(d)
        row = {"framework": "torch", "iter": it,
               "kld": float(np.mean(d[good])),
               "sem": float(np.std(d[good]) / np.sqrt(good.sum())),
               "nan_frac": float(1.0 - good.mean()),
               "wall_s": round(wall, 1)}
        jsonl_append(args.out, row)
        print(row, flush=True)

    # checkpoint/resume: exact continuation (model/opt/scheduler state +
    # the global torch RNG that drives the reverse-KLD sample draws)
    ckpt_path = args.out + ".ckpt"
    start_it, wall_prev = 0, 0.0
    if os.path.exists(ckpt_path):
        ck = torch.load(ckpt_path, weights_only=False)
        model.load_state_dict(ck["model"])
        optimizer.load_state_dict(ck["opt"])
        scheduler.load_state_dict(ck["sched"])
        torch.set_rng_state(ck["torch_rng"])
        start_it, wall_prev = ck["iter"], ck["wall_s"]
        print(f"resumed from {ckpt_path} at iter {start_it}", flush=True)

    def save_ckpt(it, wall):
        tmp = ckpt_path + ".tmp"
        torch.save({"iter": it, "wall_s": wall,
                    "model": model.state_dict(),
                    "opt": optimizer.state_dict(),
                    "sched": scheduler.state_dict(),
                    "torch_rng": torch.get_rng_state()}, tmp)
        os.replace(tmp, ckpt_path)

    t0 = time.time() - wall_prev
    for it in range(start_it, args.iters):
        optimizer.zero_grad()
        loss = model.reverse_kld(NUM_SAMPLES)
        if ~(torch.isnan(loss) | torch.isinf(loss)):  # cell 11 guard
            loss.backward()
            optimizer.step()
        scheduler.step()
        if (it + 1) in EVAL_ITERS or (it + 1) == args.iters:
            eval_kld(it + 1, time.time() - t0)
        if (it + 1) % 100 == 0 or (it + 1) == args.iters:
            save_ckpt(it + 1, time.time() - t0)
        if it % 100 == 0:
            print(f"iter {it} loss {float(loss):+.4f} "
                  f"({time.time() - t0:.0f}s)", flush=True)


# ------------------------------------------------------------------ jax ---
def cmd_jax(args):
    sys.path.insert(0, os.path.dirname(HERE))
    import jax
    import jax.numpy as jnp
    import optax

    jax.config.update("jax_compilation_cache_dir", "/tmp/nf_tpu_jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from nf_tpu.models import build_circular_nsf
    from nf_tpu.utils.module import Module, combine, partition, static_field

    class GaussianVonMises(Module):
        """Normalized Gauss-von Mises cylinder target (reference
        ``examples/paper_example_nsf.ipynb`` cell 5): dim 0 gaussian,
        dim 1 circular."""

        log_const: float = static_field(default=LOG_CONST)

        def log_prob(self, x, context=None):
            return (-0.5 * x[..., 0] ** 2
                    + jnp.cos(x[..., 1] - 3 * x[..., 0]) + self.log_const)

    target = GaussianVonMises()
    model = build_circular_nsf(
        jax.random.PRNGKey(args.model_seed), dim=2, ind_circ=(1,), K=K,
        hidden=HIDDEN, num_bins=NUM_BINS,
        tail_bound=jnp.asarray(TAIL_BOUND, jnp.float32),
        scale=jnp.asarray([1.0, 2 * np.pi], jnp.float32), target=target)

    params, static = partition(model)
    opt = optax.adam(optax.cosine_decay_schedule(LR, args.iters))
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, key):
        def loss_fn(p):
            return combine(p, static).reverse_kld(
                key, num_samples=NUM_SAMPLES)
        loss, grads = jax.value_and_grad(loss_fn)(params)
        ok = jnp.isfinite(loss)  # cell 11 NaN/Inf-skip guard
        grads = jax.tree_util.tree_map(
            lambda g: jnp.where(ok, g, jnp.zeros_like(g)), grads)
        updates, new_opt = opt.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        keep = lambda new, old: jax.tree_util.tree_map(
            lambda a, b: jnp.where(ok, a, b), new, old)
        return keep(new_params, params), keep(new_opt, opt_state), loss

    @jax.jit
    def kld_chunk(params, key):
        m = combine(params, static)
        z, log_q = m.sample(key, EVAL_CHUNK)
        return log_q - target.log_prob(z)

    def eval_kld(params, it, wall):
        ks = jax.random.split(jax.random.PRNGKey(10_000 + args.eval_seed),
                              EVAL_N // EVAL_CHUNK)
        d = np.concatenate([np.asarray(kld_chunk(params, k)) for k in ks])
        good = np.isfinite(d)
        row = {"framework": "jax", "iter": it,
               "kld": float(np.mean(d[good])),
               "sem": float(np.std(d[good]) / np.sqrt(good.sum())),
               "nan_frac": float(1.0 - good.mean()),
               "wall_s": round(wall, 1)}
        jsonl_append(args.out, row)
        print(row, flush=True)

    key = jax.random.PRNGKey(args.train_seed)
    t0 = time.time()
    for it in range(args.iters):
        key, sub = jax.random.split(key)
        params, opt_state, loss = step(params, opt_state, sub)
        if (it + 1) in EVAL_ITERS or (it + 1) == args.iters:
            eval_kld(params, it + 1, time.time() - t0)
        if it % 250 == 0:
            print(f"iter {it} loss {float(loss):+.4f} "
                  f"({time.time() - t0:.0f}s)", flush=True)


# --------------------------------------------------------------- report ---
def cmd_report(_args):
    import glob

    rows = []
    for p in sorted(glob.glob(os.path.join(OUT, "nsf_cyl_torch*.jsonl"))
                    + glob.glob(os.path.join(OUT, "nsf_cyl_jax*.jsonl"))):
        with open(p) as f:
            rows += [json.loads(line) for line in f if line.strip()]
    by = {}
    for r in rows:
        by.setdefault((r["iter"], r["framework"]), []).append(r)
    iters = sorted({i for i, _ in by})
    lines = ["| iter | torch KLD | jax KLD (mean of seeds) | gap "
             "| MC error (seed spread, ±2 sem) |",
             "|---|---|---|---|---|"]
    for it in iters:
        cells, vals = {}, {}
        for fw in ("torch", "jax"):
            rs = by.get((it, fw))
            if not rs:
                cells[fw] = "—"
                continue
            ks = [r["kld"] for r in rs]
            m, spread = float(np.mean(ks)), float(np.ptp(ks))
            sem = float(np.mean([r["sem"] for r in rs]))
            vals[fw] = (m, spread, sem)
            cells[fw] = f"{m:.4f}"
        if len(vals) == 2:
            gap = vals["jax"][0] - vals["torch"][0]
            err = max(max(v[1] for v in vals.values()),
                      2 * max(v[2] for v in vals.values()))
            verdict = "within" if abs(gap) <= max(err, 0.005) else "OUTSIDE"
            gap_c = f"{gap:+.4f} ({verdict} MC err)"
            mc = f"{err:.4f}"
        else:
            gap_c, mc = "—", "—"
        lines.append(f"| {it} | {cells['torch']} | {cells['jax']} "
                     f"| {gap_c} | {mc} |")
    report = "\n".join(lines)
    path = os.path.join(OUT, "nsf_cyl_report.md")
    with open(path, "w") as f:
        f.write("# NSF-cylinder reverse-KLD A/B (same recipe, normalized "
                "target)\n\n" + report + "\n")
    print(report)
    print("wrote", path)


def main():
    p = argparse.ArgumentParser(description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)
    for fw in ("torch", "jax"):
        sp = sub.add_parser(fw)
        sp.add_argument("--iters", type=int, default=3000)
        sp.add_argument("--model-seed", type=int, default=0)
        sp.add_argument("--train-seed", type=int, default=7)
        sp.add_argument("--eval-seed", type=int, default=0)
        sp.add_argument("--out", type=str,
                        default=os.path.join(OUT, f"nsf_cyl_{fw}.jsonl"))
    sub.add_parser("report")
    args = p.parse_args()
    {"torch": cmd_torch, "jax": cmd_jax, "report": cmd_report}[args.cmd](args)


if __name__ == "__main__":
    main()
