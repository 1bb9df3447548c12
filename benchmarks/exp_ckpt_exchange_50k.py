"""Cross-framework checkpoint exchange at the flagship 50k-Glow scale.

The closing parity demonstration for the north-star A/B
(`glow_bpd_ab.py`): checkpoints trained in EITHER framework evaluate to
the same bits/dim in the OTHER.

* ``export``: load the TPU-trained 20k-iteration jax params
  (``--params``), sanity-reproduce their recorded jsonl bpd in jax, then
  `compat_export.export_state_dict` them into the reference package's own
  `MultiscaleFlow` (built per `/root/reference/examples/glow.ipynb` cell 2,
  as in `glow_bpd_ab.cmd_torch`) and evaluate bpd there on the shared
  512-image eval arrays.
* ``import``: load the reference leg's training checkpoint (``--ckpt``,
  written by `glow_bpd_ab.cmd_torch.save_ckpt`), pull its model
  state_dict through `nf_tpu.compat.import_state_dict` into the jax
  model, and evaluate bpd on-device at the checkpoint's iteration.

Both directions print per-eval-seed bpd next to the target rows from the
A/B jsonls; agreement is expected at f32 cross-framework numerics
(layer-parity tests pin <=1e-4 per layer, `tests/test_reference_parity.py`).
"""

import argparse
import json
import os
import sys

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, HERE)
sys.path.insert(0, os.path.dirname(HERE))

from glow_bpd_ab import (BATCH, EVAL_SEEDS, HIDDEN, INPUT_SHAPE, K, L,
                         N_DIMS, NUM_CLASSES, load_data)

OUT = os.path.join(HERE, "out")


def build_jax_model(model_seed=0):
    import dataclasses

    import jax

    from nf_tpu.models import build_glow_multiscale

    model = build_glow_multiscale(
        jax.random.PRNGKey(model_seed), input_shape=INPUT_SHAPE, L=L, K=K,
        hidden_channels=HIDDEN, num_classes=NUM_CLASSES, class_cond=True,
        scan=True)
    return dataclasses.replace(model, transform=None)


def build_ref_model():
    sys.path.insert(0, "/root/reference")
    import normflows as nf

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
    return nf.MultiscaleFlow(bases, per_level,
                             [nf.flows.Merge() for _ in range(L - 1)])


def jax_bpd(model, d, precision="float32"):
    import jax
    import jax.numpy as jnp

    from nf_tpu.utils.module import combine, partition

    params, static = partition(model)

    @jax.jit
    def bpd_of(p, x, y):
        # exact-f32 matmuls by default: cross-framework comparisons are
        # against the reference's exact-f32 CPU arithmetic (the TPU's
        # default bf16-pass precision shifts the 20k-iter bpd by ~0.02)
        with jax.default_matmul_precision(precision):
            nll = -combine(p, static).log_prob(x, y)
        return nll / np.log(2) / N_DIMS + 8

    test_y = jnp.asarray(d["y_test"].astype(np.int32))
    out = {}
    for s in EVAL_SEEDS:
        b = np.asarray(bpd_of(params, jnp.asarray(d[f"x_test_deq{s}"]),
                              test_y))
        out[s] = (float(np.nanmean(b)),
                  float(np.nanstd(b) / np.sqrt(np.sum(~np.isnan(b)))))
    return out


def torch_bpd(ref, d):
    import torch

    ref.eval()
    out = {}
    with torch.no_grad():
        for s in EVAL_SEEDS:
            xs = d[f"x_test_deq{s}"]
            bpds = []
            for lo in range(0, len(xs), BATCH):
                x = torch.from_numpy(xs[lo:lo + BATCH])
                y = torch.from_numpy(
                    d["y_test"][lo:lo + BATCH].astype(np.int64))
                nll = ref(x, y)
                bpds.append(nll.numpy() / np.log(2) / N_DIMS + 8)
            b = np.concatenate(bpds)
            out[s] = (float(np.nanmean(b)),
                      float(np.nanstd(b) / np.sqrt(np.sum(~np.isnan(b)))))
    return out


def jsonl_rows(path, it, framework):
    rows = {}
    with open(path) as f:
        for line in f:
            r = json.loads(line)
            if r["iter"] == it and r["framework"] == framework \
                    and "eval_set" not in r:
                rows[r["eval_seed"]] = r["bpd"]
    return rows


def cmd_export(args):
    import pickle

    import jax

    if args.cpu:
        # exact-f32 matmuls: isolates TPU default-precision effects from
        # export-mapping errors (CLAUDE.md: flip backend via jax.config)
        jax.config.update("jax_platforms", "cpu")

    from nf_tpu.utils.module import combine, partition

    import jax.numpy as jnp

    from glow_bpd_ab import batch_indices, dequantize

    d = load_data(args.npz)
    model = build_jax_model(args.model_seed)
    # the saved pytree comes from a post-`init_from_data` model whose
    # ActNorm `initialized` static flags are True — run the same explicit
    # init pre-pass before partitioning (the init VALUES are then fully
    # overwritten by the loaded params)
    sched0 = batch_indices(1, n=len(d["x_train"]))[0]
    model = model.init_from_data(
        jnp.asarray(dequantize(d["x_train"][sched0],
                               np.random.default_rng(0))),
        jnp.asarray(d["y_train"][sched0].astype(np.int32)))
    with open(args.params, "rb") as f:
        trained = pickle.load(f)
    _, static = partition(model)
    model = combine(jax.tree_util.tree_map(np.asarray, trained), static)

    print("== jax side (sanity: reproduce the recorded jsonl rows) ==",
          flush=True)
    ours = jax_bpd(model, d)
    want = jsonl_rows(args.jsonl, args.iter, "jax") if args.jsonl else {}
    for s, (b, sem) in ours.items():
        ref_s = f"  (jsonl: {want[s]:.6f})" if s in want else ""
        print(f"  eval_seed {s}: bpd {b:.6f} ± {sem:.5f}{ref_s}",
              flush=True)

    print("== exporting to the reference package ==", flush=True)
    from nf_tpu.compat_export import export_state_dict

    sd = export_state_dict(model)
    ref = build_ref_model()
    import torch

    missing, unexpected = ref.load_state_dict(
        {k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()},
        strict=True)
    assert not missing and not unexpected, (missing, unexpected)
    got = torch_bpd(ref, d)
    for s, (b, sem) in got.items():
        db = b - ours[s][0]
        print(f"  reference eval_seed {s}: bpd {b:.6f} ± {sem:.5f} "
              f"(vs jax {ours[s][0]:.6f}, gap {db:+.6f})", flush=True)
    worst = max(abs(got[s][0] - ours[s][0]) for s in got)
    print(f"EXPORT {'OK' if worst < 5e-3 else 'MISMATCH'} "
          f"(worst gap {worst:.2e})", flush=True)


def cmd_import(args):
    import torch

    d = load_data(args.npz)
    ck = torch.load(args.ckpt, weights_only=False)
    it = ck["iter"]
    sd = {k: v.numpy() for k, v in ck["model"].items()}
    print(f"== torch checkpoint at iter {it} -> jax ==", flush=True)

    from nf_tpu.compat import import_state_dict

    model = import_state_dict(build_jax_model(), sd, strict=True)
    ours = jax_bpd(model, d)
    want = jsonl_rows(args.jsonl, it, "torch") if args.jsonl else {}
    worst = 0.0
    for s, (b, sem) in ours.items():
        ref_s = ""
        if s in want:
            worst = max(worst, abs(b - want[s]))
            ref_s = f" (torch jsonl: {want[s]:.6f}, gap {b - want[s]:+.6f})"
        print(f"  jax eval_seed {s}: bpd {b:.6f} ± {sem:.5f}{ref_s}",
              flush=True)
    if not want:
        print(f"IMPORT INCONCLUSIVE: no torch jsonl rows at iter {it} "
              "(checkpoints are written every 100 iters, eval rows only "
              "at EVAL_ITERS — rerun when they coincide)", flush=True)
        return
    print(f"IMPORT {'OK' if worst < 5e-3 else 'MISMATCH'} "
          f"(worst gap {worst:.2e})", flush=True)


def main():
    p = argparse.ArgumentParser()
    sub = p.add_subparsers(dest="cmd", required=True)
    se = sub.add_parser("export")
    se.add_argument("--params",
                    default=os.path.join(OUT, "glow_ab50k_jax_be_params_s0.pkl"))
    se.add_argument("--model-seed", type=int, default=0)
    se.add_argument("--iter", type=int, default=20000)
    se.add_argument("--jsonl",
                    default=os.path.join(OUT, "glow_ab50k_jax_be.jsonl"))
    se.add_argument("--npz",
                    default=os.path.join(OUT, "glow_ab_data_50k.npz"))
    se.add_argument("--cpu", action="store_true",
                    help="evaluate the jax side on CPU (exact f32 "
                         "matmuls) to isolate TPU matmul precision from "
                         "export-mapping errors")
    si = sub.add_parser("import")
    si.add_argument("--ckpt",
                    default=os.path.join(OUT, "glow_ab50k_torch.jsonl.ckpt"))
    si.add_argument("--jsonl",
                    default=os.path.join(OUT, "glow_ab50k_torch.jsonl"))
    si.add_argument("--npz",
                    default=os.path.join(OUT, "glow_ab_data_50k.npz"))
    args = p.parse_args()
    {"export": cmd_export, "import": cmd_import}[args.cmd](args)


if __name__ == "__main__":
    main()
