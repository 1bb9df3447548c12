"""Same-data Glow bits/dim A/B: reference PyTorch (host CPU) vs nf_tpu (TPU).

Discharges the BASELINE.json north-star "Glow CIFAR-10 bits/dim matches the
reference within MC error" with a *measured* A/B rather than a recipe
description: both frameworks train the exact reference architecture
(``/root/reference/examples/glow.ipynb`` cell 2: L=3, K=16, hidden=256,
class-conditional base, NO logit transform) with the exact reference
optimizer (cell 4: Adamax lr=1e-3, weight_decay=1e-5, batch 128, NaN-skip
guard) on the *identical* procedural 32x32 RGB dataset, with the identical
batch-index schedule, and report bits/dim (cell 6: ``nll/log(2)/3072 + 8``,
NaN-robust mean) on *identical pre-dequantized* held-out arrays at the same
iteration checkpoints.

What is shared bit-for-bit between the two runs:
  * the uint8 train/test images + labels (numpy-generated, ``data`` phase);
  * the sequence of train batch indices (``np.random.default_rng(123)``);
  * the dequantized eval arrays (Scale 255/256 + fixed-seed Jitter 1/256,
    precomputed per eval_seed in the ``data`` phase).
What differs (and defines the MC error band): parameter init RNG, the
per-iteration training jitter noise, and f32-TPU vs f64-capable-CPU
accumulation order. The MC error bar is the spread over eval_seeds plus the
test-set standard error.

Usage (from repo root):
    python benchmarks/glow_bpd_ab.py data
    python benchmarks/glow_bpd_ab.py torch --iters 1000   # hours on 1 CPU
    python benchmarks/glow_bpd_ab.py jax   --iters 1000   # minutes on TPU
    python benchmarks/glow_bpd_ab.py report

Results land in ``benchmarks/out/glow_ab_{torch,jax}.jsonl`` and the merged
table in ``benchmarks/out/glow_ab_report.md`` (copied into docs/accuracy.md).
The measured round-2 curves + report are committed under
``benchmarks/glow_ab/`` (out/ itself is gitignored — it holds the 23 MB
shared-data npz).
"""

import argparse
import json
import os
import sys
import time

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
OUT = os.path.join(HERE, "out")
DATA_NPZ = os.path.join(OUT, "glow_ab_data.npz")

# --- the shared recipe (reference examples/glow.ipynb cells 2-4) ---
L, K, HIDDEN = 3, 16, 256
INPUT_SHAPE = (3, 32, 32)
N_DIMS = 3 * 32 * 32
NUM_CLASSES = 10
BATCH = 128
LR, WD = 1e-3, 1e-5
N_TRAIN, N_TEST = 4096, 512
BATCH_SEED, DATA_SEED = 123, 7
EVAL_SEEDS = (0, 1)  # two dequantization draws of the eval set
EVAL_ITERS = (50, 100, 250, 500, 750, 1000, 1500, 2000, 2500, 3000, 4000,
              5000, 6000, 8000, 10000, 12000, 16000, 20000)


def procedural_cifar_np(rng, n, num_classes=NUM_CLASSES, size=32):
    """Numpy port of examples/glow.py:procedural_cifar (class-dependent
    colored blobs + texture, uint8) so both frameworks read identical bytes
    without a JAX dependency in the torch phase."""
    y = rng.integers(0, num_classes, size=n)
    yy, xx = np.mgrid[0:size, 0:size] / size
    phase = y[:, None, None] / num_classes * 2 * np.pi
    base = 0.5 + 0.5 * np.sin(2 * np.pi * (xx + yy)[None] + phase)
    rgb_shift = np.stack([np.cos(phase), np.sin(phase),
                          np.cos(2 * phase)], 1)  # (n,3,1,1)
    img = 0.6 * base[:, None] * (0.5 + 0.5 * rgb_shift)
    img = img + 0.1 * rng.random((n, 3, size, size))
    return (np.clip(img, 0, 1) * 255).astype(np.uint8), y.astype(np.int32)


def dequantize(x_uint8, rng):
    """ToTensor + Scale(255/256) + Jitter(1/256), the reference train/test
    transform pipeline (glow.ipynb cell 3; normflows/utils/preprocessing.py)."""
    x = x_uint8.astype(np.float32) / 255.0
    x = x * (255.0 / 256.0)
    return x + rng.random(x.shape, dtype=np.float32) * (1.0 / 256.0)


def batch_indices(n_iters, n=N_TRAIN, batch=BATCH, seed=BATCH_SEED):
    rng = np.random.default_rng(seed)
    return [rng.integers(0, n, size=batch) for _ in range(n_iters)]


def cmd_data(args):
    os.makedirs(OUT, exist_ok=True)
    rng = np.random.default_rng(DATA_SEED)
    x_tr, y_tr = procedural_cifar_np(rng, args.n_train)
    x_te, y_te = procedural_cifar_np(rng, args.n_test)
    arrays = {"x_train": x_tr, "y_train": y_tr,
              "x_test": x_te, "y_test": y_te}
    for s in EVAL_SEEDS:
        arrays[f"x_test_deq{s}"] = dequantize(
            x_te, np.random.default_rng(1000 + s))
    np.savez_compressed(args.npz, **arrays)
    print("wrote", args.npz,
          {k: (v.shape, str(v.dtype)) for k, v in arrays.items()})


def cmd_data_extra(args):
    """A larger held-out eval set (fresh rng stream, disjoint from the
    train/test draws of ``data``) to tighten the jax-side 20k-tail bpd sem:
    sem scales as 1/sqrt(n), so 8192 images cut the 512-image sem ~4x. The
    torch leg keeps the 512-image set for CPU budget; matched-iteration
    rows always use the shared 512-image arrays."""
    os.makedirs(OUT, exist_ok=True)
    rng = np.random.default_rng(args.seed)
    x_ev, y_ev = procedural_cifar_np(rng, args.n)
    arrays = {"x_eval": x_ev, "y_eval": y_ev}
    for s in EVAL_SEEDS:
        arrays[f"x_eval_deq{s}"] = dequantize(
            x_ev, np.random.default_rng(2000 + s))
    np.savez_compressed(args.npz, **arrays)
    print("wrote", args.npz,
          {k: (v.shape, str(v.dtype)) for k, v in arrays.items()})


def load_data(path=DATA_NPZ):
    d = np.load(path)
    return d


def jsonl_append(path, row):
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
    d = load_data(args.npz)
    x_tr, y_tr = d["x_train"], d["y_train"]

    # Same architecture as reference examples/glow.ipynb cell 2 (L levels
    # of K GlowBlocks + Squeeze, class-conditional per-level bases), built
    # through the reference package's public API. Channel arithmetic: level
    # i (0 = innermost) sees 3 * 2^(L+1-i) channels post-squeeze; its
    # latent keeps half of them (channel split), except the deepest level
    # which keeps all; spatial side halves per remaining level.
    def level_channels(i):
        return 3 * 2 ** (L + 1 - i)

    def latent_shape(i):
        side = 32 // 2 ** (L - i)
        ch = level_channels(i) if i == 0 else level_channels(i) // 2
        return (ch, side, side)

    per_level = [
        [nf.flows.GlowBlock(level_channels(i), HIDDEN,
                            split_mode="channel", scale=True)
         for _ in range(K)] + [nf.flows.Squeeze()]
        for i in range(L)
    ]
    bases = [nf.distributions.ClassCondDiagGaussian(latent_shape(i),
                                                    NUM_CLASSES)
             for i in range(L)]
    model = nf.MultiscaleFlow(bases, per_level,
                              [nf.flows.Merge() for _ in range(L - 1)])
    optimizer = torch.optim.Adamax(model.parameters(), lr=LR,
                                   weight_decay=WD)

    def eval_bpd(it, wall):
        model.eval()
        with torch.no_grad():
            for s in EVAL_SEEDS:
                xs = d[f"x_test_deq{s}"]
                bpds = []
                for lo in range(0, len(xs), BATCH):
                    x = torch.from_numpy(xs[lo:lo + BATCH])
                    y = torch.from_numpy(
                        d["y_test"][lo:lo + BATCH].astype(np.int64))
                    nll = model(x, y)  # forward_kld per-sample (cell 6)
                    bpds.append(nll.numpy() / np.log(2) / N_DIMS + 8)
                b = np.concatenate(bpds)
                row = {"framework": "torch", "iter": it, "eval_seed": s,
                       "model_seed": args.model_seed,
                       "bpd": float(np.nanmean(b)),
                       "sem": float(np.nanstd(b) / np.sqrt(
                           np.sum(~np.isnan(b)))),
                       "nan_frac": float(np.mean(np.isnan(b))),
                       "wall_s": round(wall, 1)}
                jsonl_append(args.out, row)
                print(row, flush=True)
        model.train()

    jitter_rng = np.random.default_rng(args.train_jitter_seed)
    sched = batch_indices(args.iters, n=len(x_tr))

    # checkpoint/resume: the CPU leg runs for hours and must survive kills.
    # Resume is exact — model/optimizer state_dicts plus the numpy jitter
    # bit-generator state make the continued run bit-identical to an
    # uninterrupted one (the batch schedule is a pure function of the iter).
    ckpt_path = args.ckpt or (args.out + ".ckpt")
    start_it, wall_prev = 0, 0.0
    if os.path.exists(ckpt_path):
        ck = torch.load(ckpt_path, weights_only=False)
        model.load_state_dict(ck["model"])
        optimizer.load_state_dict(ck["opt"])
        jitter_rng.bit_generator.state = ck["jitter_rng"]
        start_it, wall_prev = ck["iter"], ck["wall_s"]
        print(f"resumed from {ckpt_path} at iter {start_it}", flush=True)

    def save_ckpt(it, wall):
        tmp = ckpt_path + ".tmp"
        torch.save({"iter": it, "wall_s": wall,
                    "model": model.state_dict(),
                    "opt": optimizer.state_dict(),
                    "jitter_rng": jitter_rng.bit_generator.state}, tmp)
        os.replace(tmp, ckpt_path)

    t0 = time.time() - wall_prev
    for it in range(start_it, args.iters):
        idx = sched[it]
        x = torch.from_numpy(dequantize(x_tr[idx], jitter_rng))
        y = torch.from_numpy(y_tr[idx].astype(np.int64))
        optimizer.zero_grad()
        loss = model.forward_kld(x, y)
        if ~(torch.isnan(loss) | torch.isinf(loss)):  # cell 4 guard
            loss.backward()
            optimizer.step()
        if (it + 1) in EVAL_ITERS or (it + 1) == args.iters:
            eval_bpd(it + 1, time.time() - t0)
        if (it + 1) % 100 == 0 or (it + 1) in EVAL_ITERS \
                or (it + 1) == args.iters:
            save_ckpt(it + 1, time.time() - t0)
        if it % 25 == 0:
            print(f"iter {it} loss {float(loss):+.1f} "
                  f"({time.time() - t0:.0f}s)", flush=True)


# ------------------------------------------------------------------ jax ---
def cmd_jax(args):
    sys.path.insert(0, os.path.dirname(HERE))
    import dataclasses

    import jax
    import jax.numpy as jnp
    import optax

    jax.config.update("jax_compilation_cache_dir", "/tmp/nf_tpu_jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from nf_tpu.models import build_glow_multiscale
    from nf_tpu.utils.module import combine, partition

    d = load_data(args.npz)
    x_tr, y_tr = d["x_train"], d["y_train"]

    model = build_glow_multiscale(
        jax.random.PRNGKey(args.model_seed), input_shape=INPUT_SHAPE, L=L,
        K=K,
        hidden_channels=HIDDEN, num_classes=NUM_CLASSES, class_cond=True,
        scan=True)
    # the reference notebook model has NO logit transform (cell 2):
    # bpd is computed directly as nll/log(2)/3072 + 8 (cell 6)
    model = dataclasses.replace(model, transform=None)

    jitter_rng = np.random.default_rng(args.train_jitter_seed)
    sched = batch_indices(args.iters, n=len(x_tr))
    model = model.init_from_data(
        jnp.asarray(dequantize(x_tr[sched[0]], np.random.default_rng(
            args.train_jitter_seed))),
        jnp.asarray(y_tr[sched[0]].astype(np.int32)))

    params, static = partition(model)
    # torch-style coupled weight decay: wd*p added to the raw grad before
    # the Adamax moments (torch.optim.Adamax semantics)
    opt = optax.chain(optax.add_decayed_weights(WD), optax.adamax(LR))
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, x, y):
        def loss_fn(p):
            return combine(p, static).forward_kld(x, y)
        loss, grads = jax.value_and_grad(loss_fn)(params)
        ok = jnp.isfinite(loss)  # cell 4 NaN/Inf-skip guard
        grads = jax.tree_util.tree_map(
            lambda g: jnp.where(ok, g, jnp.zeros_like(g)), grads)
        updates, new_opt = opt.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        keep = lambda new, old: jax.tree_util.tree_map(
            lambda a, b: jnp.where(ok, a, b), new, old)
        return keep(new_params, params), keep(new_opt, opt_state), loss

    test_y = jnp.asarray(d["y_test"].astype(np.int32))
    test_x = {s: jnp.asarray(d[f"x_test_deq{s}"]) for s in EVAL_SEEDS}

    # optional larger held-out set (``data-extra``): evaluated in fixed
    # 512-image chunks so the jitted bpd executable is shared with the
    # 512-image matched-iteration eval (one compile, static shapes)
    extra, extra_iters = None, set()
    if args.eval_extra_npz:
        de = np.load(args.eval_extra_npz)
        chunks = len(de["y_eval"]) // len(test_y) * len(test_y)
        if chunks < len(de["y_eval"]):
            print(f"WARNING: eval-extra set truncated to {chunks} of "
                  f"{len(de['y_eval'])} images (whole {len(test_y)}-image "
                  f"chunks share one jitted executable); the final "
                  f"{len(de['y_eval']) - chunks} images are dropped",
                  flush=True)
        extra = {s: np.ascontiguousarray(de[f"x_eval_deq{s}"][:chunks])
                 for s in EVAL_SEEDS}
        extra_y = de["y_eval"][:chunks].astype(np.int32)
        extra_iters = {int(v) for v in args.eval_extra_iters.split(",")}

    # TWO eval precisions per point (rows tagged "precision"): "default"
    # is the TPU's native matmul/conv precision (bf16 passes — what a TPU
    # user's own eval reports, and what training minimizes); "float32"
    # forces exact-f32-equivalent arithmetic so the bpd is directly
    # comparable to the reference leg's exact-f32 CPU numbers.  Measured
    # at iter 20k the difference is ~0.02 bpd, and cross-framework
    # agreement of the SAME weights in exact arithmetic is <=4e-7
    # (`benchmarks/exp_ckpt_exchange_50k.py`).
    @jax.jit
    def bpd_of(params, x, y):
        nll = -combine(params, static).log_prob(x, y)
        return nll / np.log(2) / N_DIMS + 8

    @jax.jit
    def bpd_of_f32(params, x, y):
        with jax.default_matmul_precision("float32"):
            nll = -combine(params, static).log_prob(x, y)
        return nll / np.log(2) / N_DIMS + 8

    PRECISIONS = (("default", bpd_of), ("float32", bpd_of_f32))

    def eval_bpd(params, it, wall):
        for s in EVAL_SEEDS:
            for prec, fn in PRECISIONS:
                b = np.asarray(fn(params, test_x[s], test_y))
                row = {"framework": "jax", "iter": it, "eval_seed": s,
                       "precision": prec,
                       "bpd": float(np.nanmean(b)),
                       "sem": float(np.nanstd(b) / np.sqrt(
                           np.sum(~np.isnan(b)))),
                       "nan_frac": float(np.mean(np.isnan(b))),
                       "wall_s": round(wall, 1)}
                jsonl_append(args.out, row)
                print(row, flush=True)
        if extra is not None and it in extra_iters:
            n_chunk = len(test_y)
            for s in EVAL_SEEDS:
                for prec, fn in PRECISIONS:
                    bs = [np.asarray(fn(
                              params,
                              jnp.asarray(extra[s][lo:lo + n_chunk]),
                              jnp.asarray(extra_y[lo:lo + n_chunk])))
                          for lo in range(0, len(extra_y), n_chunk)]
                    b = np.concatenate(bs)
                    row = {"framework": "jax", "iter": it, "eval_seed": s,
                           "eval_set": f"extra{len(b)}", "precision": prec,
                           "bpd": float(np.nanmean(b)),
                           "sem": float(np.nanstd(b) / np.sqrt(
                               np.sum(~np.isnan(b)))),
                           "nan_frac": float(np.mean(np.isnan(b))),
                           "wall_s": round(time.time() - t0, 1)}
                    jsonl_append(args.out, row)
                    print(row, flush=True)

    t0 = time.time()
    for it, idx in enumerate(sched):
        x = jnp.asarray(dequantize(x_tr[idx], jitter_rng))
        y = jnp.asarray(y_tr[idx].astype(np.int32))
        params, opt_state, loss = step(params, opt_state, x, y)
        if (it + 1) in EVAL_ITERS or (it + 1) == args.iters \
                or (extra is not None and (it + 1) in extra_iters):
            eval_bpd(params, it + 1, time.time() - t0)
        if it % 100 == 0:
            print(f"iter {it} loss {float(loss):+.1f} "
                  f"({time.time() - t0:.0f}s)", flush=True)
    if args.save_params:
        import pickle
        with open(args.save_params, "wb") as f:
            pickle.dump(jax.tree_util.tree_map(np.asarray, params), f)
        print("saved final params to", args.save_params, flush=True)


# --------------------------------------------------------------- report ---
def cmd_report(args):
    import glob

    tag = args.tag  # "" = the original 4096-image run; "50k" = scaled run
    rows = []
    # all torch runs + all jax seed runs (glow_ab{tag}_jax*.jsonl): the
    # spread over model-init seeds IS the dominant MC-error term
    for p in sorted(glob.glob(os.path.join(OUT, f"glow_ab{tag}_torch*.jsonl"))
                    + glob.glob(os.path.join(OUT, f"glow_ab{tag}_jax*.jsonl"))):
        src = os.path.basename(p)  # one file per model-init seed
        for line in open(p):
            if not line.strip():
                continue
            r = json.loads(line)
            if "eval_set" in r:
                continue  # matched table: shared 512-image arrays only;
                # the extra8192 tail rows are reported separately
                # (docs/accuracy.md)
            r["_src"] = src
            rows.append(r)
    # per (iter, framework): prefer exact-f32-tagged rows (directly
    # comparable to the reference leg's exact-f32 CPU arithmetic) over
    # untagged/default-precision rows from older runs; never mix the two
    # (they differ by ~0.02 bpd at the late-schedule points — the TPU's
    # default matmul precision, see exp_ckpt_exchange_50k.py)
    by = {}
    for r in rows:
        by.setdefault((r["iter"], r["framework"]), []).append(r)
    for key, rs in by.items():
        f32 = [r for r in rs if r.get("precision") == "float32"]
        if f32:
            by[key] = f32
        else:
            by[key] = [r for r in rs if r.get("precision", "default")
                       == "default"]
    iters = sorted({i for i, _ in by})

    # measured torch init-variance band: per-iter peak-to-peak over the
    # per-model-seed means (seeds live in separate *_seed*.jsonl files).
    # For iters where only one torch seed ran, fall back to the spread at
    # the LAST iter that has >=2 torch seeds (late-training init variance;
    # rows using the fallback are footnoted, never silently floored).
    torch_seed_spread, last_multi = {}, None
    for it in iters:
        rs = by.get((it, "torch"), [])
        per_seed = {}
        for r in rs:
            per_seed.setdefault(r.get("_src", "?"), []).append(r["bpd"])
        if len(per_seed) >= 2:
            means = [float(np.mean(v)) for v in per_seed.values()]
            torch_seed_spread[it] = float(np.ptp(means))
            last_multi = it
    fallback = torch_seed_spread.get(last_multi)

    lines = ["| iter | torch bpd | jax bpd | gap | MC error (seeds, jitter, "
             "±sem) |", "|---|---|---|---|---|"]
    used_fallback = False
    for it in iters:
        cells, vals = {}, {}
        for fw in ("torch", "jax"):
            rs = by.get((it, fw))
            if not rs:
                cells[fw] = "—"
                continue
            bs = [r["bpd"] for r in rs]
            m, spread = float(np.mean(bs)), float(np.ptp(bs))
            sem = float(np.mean([r["sem"] for r in rs]))
            vals[fw] = (m, spread, sem)
            cells[fw] = f"{m:.4f}"
        if len(vals) == 2:
            gap = vals["jax"][0] - vals["torch"][0]
            err = max(max(v[1] for v in vals.values()),
                      2 * max(v[2] for v in vals.values()))
            note = ""
            if it not in torch_seed_spread and fallback is not None:
                # single torch seed at this iter: include the measured
                # late-training torch init spread in the band
                if fallback > err:
                    err, note = fallback, "†"
                    used_fallback = True
            verdict = "within" if abs(gap) <= err else "OUTSIDE"
            gap_c = f"{gap:+.4f} ({verdict} MC err)"
            mc = f"{err:.4f}{note}"
        else:
            gap_c, mc = "—", "—"
        lines.append(f"| {it} | {cells['torch']} | {cells['jax']} "
                     f"| {gap_c} | {mc} |")
    if used_fallback:
        lines.append("")
        lines.append(f"† single torch model-seed at this iter; band widened "
                     f"to the measured torch init spread at iter "
                     f"{last_multi} ({fallback:.4f}), the latest iter with "
                     f">=2 torch seeds.")
    report = "\n".join(lines)
    path = os.path.join(OUT, f"glow_ab{tag}_report.md")
    with open(path, "w") as f:
        f.write("# Glow bits/dim A/B (same data, same recipe)\n\n"
                + report + "\n")
    print(report)
    print("wrote", path)


def main():
    p = argparse.ArgumentParser(description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)
    sd = sub.add_parser("data")
    sd.add_argument("--n-train", type=int, default=N_TRAIN)
    sd.add_argument("--n-test", type=int, default=N_TEST)
    sd.add_argument("--npz", type=str, default=DATA_NPZ)
    se = sub.add_parser("data-extra")
    se.add_argument("--n", type=int, default=8192)
    se.add_argument("--seed", type=int, default=1007)
    se.add_argument("--npz", type=str,
                    default=os.path.join(OUT, "glow_ab_eval8k.npz"))
    for fw in ("torch", "jax"):
        sp = sub.add_parser(fw)
        sp.add_argument("--iters", type=int, default=1000)
        sp.add_argument("--train-jitter-seed", type=int,
                        default={"torch": 41, "jax": 42}[fw])
        sp.add_argument("--model-seed", type=int, default=0,
                        help="parameter-init seed (jax side); vary to "
                             "measure the init-variance MC band")
        sp.add_argument("--npz", type=str, default=DATA_NPZ)
        sp.add_argument("--ckpt", type=str, default=None,
                        help="torch leg: checkpoint path (default "
                             "<out>.ckpt); resumes exactly if it exists")
        sp.add_argument("--out", type=str,
                        default=os.path.join(OUT, f"glow_ab_{fw}.jsonl"))
        if fw == "jax":
            sp.add_argument("--eval-extra-npz", type=str, default=None,
                            help="data-extra npz: larger held-out set, "
                                 "evaluated in 512-image chunks")
            sp.add_argument("--eval-extra-iters", type=str,
                            default="10000,16000,20000")
            sp.add_argument("--save-params", type=str, default=None,
                            help="pickle the final param pytree here")
    sr = sub.add_parser("report")
    sr.add_argument("--tag", type=str, default="",
                    help='"" = original 4096-image files; "50k" = scaled run')
    args = p.parse_args()
    {"data": cmd_data, "data-extra": cmd_data_extra, "torch": cmd_torch,
     "jax": cmd_jax, "report": cmd_report}[args.cmd](args)


if __name__ == "__main__":
    main()
