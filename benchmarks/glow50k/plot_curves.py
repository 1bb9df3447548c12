"""Render the 50k-image Glow A/B curves (benchmarks/glow50k/curves.png).

Exact-f32 eval columns on both sides (see ../glow_bpd_ab.py and the
precision analysis in docs/accuracy.md): the reference leg on the host
CPU vs both nf_tpu init seeds on the v5e. Colors are the dataviz
reference palette's fixed categorical slots 1-2 (pre-validated order);
seeds of the same framework share one hue with line-style as the
secondary encoding.

Run: cd /root/repo && python benchmarks/glow50k/plot_curves.py
"""

import json
import os

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt

HERE = os.path.dirname(os.path.abspath(__file__))

SURFACE = "#fcfcfb"
INK = "#0b0b0b"
INK2 = "#52514e"
BLUE = "#2a78d6"    # categorical slot 1: nf_tpu
ORANGE = "#eb6834"  # categorical slot 2: reference


def rows(path, framework, precision=None):
    out = {}
    with open(os.path.join(HERE, path)) as f:
        for line in f:
            r = json.loads(line)
            if r["framework"] != framework or "eval_set" in r:
                continue
            if precision is not None \
                    and r.get("precision", "default") != precision:
                continue
            out.setdefault(r["iter"], []).append(r["bpd"])
    its = sorted(out)
    return its, [sum(out[i]) / len(out[i]) for i in its]


def main():
    jax0 = rows("glow_ab50k_jax_p32.jsonl", "jax", "float32")
    jax1 = rows("glow_ab50k_jax_p32_seed1.jsonl", "jax", "float32")
    tor = rows("glow_ab50k_torch.jsonl", "torch")
    try:
        tor1 = rows("glow_ab50k_torch_seed1.jsonl", "torch")
    except FileNotFoundError:
        tor1 = ([], [])

    fig, ax = plt.subplots(figsize=(7.2, 4.2), dpi=160)
    fig.patch.set_facecolor(SURFACE)
    ax.set_facecolor(SURFACE)

    ax.plot(*jax0, color=BLUE, lw=1.8, label="nf_tpu (v5e), seed 0")
    ax.plot(*jax1, color=BLUE, lw=1.8, ls="--", label="nf_tpu (v5e), seed 1")
    ax.plot(*tor, color=ORANGE, lw=1.8, marker="o", ms=4.5,
            label="reference normflows (host CPU), seed 0")
    if tor1[0]:
        ax.plot(*tor1, color=ORANGE, lw=1.8, ls="--", marker="o", ms=4.5,
                label="reference normflows (host CPU), seed 1")

    ax.set_xscale("log")
    ax.set_xlabel("training iteration (log scale)", color=INK2)
    ax.set_ylabel("test bits/dim (exact-f32 eval)", color=INK2)
    ax.set_title("Glow A/B at the full reference recipe: 50,000 images, "
                 "bit-identical data", color=INK, fontsize=11)
    ax.tick_params(colors=INK2, labelsize=9)
    for s in ax.spines.values():
        s.set_color("#d8d7d2")
    ax.grid(True, which="major", color="#eceae5", lw=0.7)
    ax.legend(frameon=False, fontsize=9, labelcolor=INK)

    tmax = max(tor[0]) if tor[0] else 0
    ax.annotate(
        f"reference leg is CPU-budget-capped (reached iter {tmax}; the"
        " full 20k schedule would take ~86 h at ~15 s/iter).\nnf_tpu runs"
        " the whole schedule in 950-1,421 s; curves agree within the MC"
        " band at every matched iteration.",
        xy=(0.02, 0.03), xycoords="axes fraction", fontsize=7.5,
        color=INK2)

    out = os.path.join(HERE, "curves.png")
    fig.tight_layout()
    fig.savefig(out, facecolor=SURFACE)
    print("wrote", out)


if __name__ == "__main__":
    main()
