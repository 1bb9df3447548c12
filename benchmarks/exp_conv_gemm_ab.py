"""Glow conditioner conv stack: XLA's lowering vs explicit GEMM forms.

Round-4 verdict: the Glow step ceiling claim ("the time is the conditioner
convs' small-matrix MXU rate") was established by timing XLA's OWN conv
lowering in isolation — it shows the step is conv-bound, not that the conv
is at hardware speed-of-light. This experiment writes the 3-conv stack
(reference ``nets/cnn.py:5-63`` via ``examples/glow.ipynb`` cell 2:
Cin->256 k3 / 256->256 k1 / 256->Cout k3) as explicit matmul programs and
A/Bs value and value+grad against ``lax.conv_general_dilated``:

* ``xla_nchw`` — the model's current path (baseline).
* ``xla_nhwc`` — layout control.
* ``shift_gemm`` — each 3x3 conv as 9 shifted ``(B*H*W, C) @ (C, O)``
  dots (implicit im2col: no 9x activation materialization; the MXU sees
  M=131k rows).
* ``im2col_first`` — the Cin->256 conv materializes its 9*Cin-channel
  patches (9*12=108 ~ a full 128 contraction tile, vs nine K=12 matmuls
  that underfill the MXU contraction dim 10x); other convs as shift-GEMM.

Shapes are the full-recipe hot block (b=128, 32x32, Cin=12) plus the L1/L2
blocks. If a GEMM form wins >1.3x it becomes the conditioner's conv
implementation; otherwise the ceiling claim gets its missing independent
measurement. Timing: two-point scan-chain fit (see bench_suite docstring).

Usage: python benchmarks/exp_conv_gemm_ab.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/nf_tpu_jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from bench_suite import timed_chain

HERE = os.path.dirname(os.path.abspath(__file__))
OUT = os.path.join(HERE, "out")

HID = 256
LEAKY = 0.0  # reference Glow conditioner uses plain ReLU-less LeakyReLU(0)


def make_weights(key, cin, cout, hid=HID):
    ks = jax.random.split(key, 3)
    w1 = jax.random.normal(ks[0], (3, 3, cin, hid)) * (1 / np.sqrt(9 * cin))
    w2 = jax.random.normal(ks[1], (1, 1, hid, hid)) * (1 / np.sqrt(hid))
    # NOT zero-init (the model's real init): a zero output conv makes the
    # stack output and its whole gradient exactly zero, and XLA dead-code
    # eliminates the very work being measured
    w3 = jax.random.normal(ks[2], (3, 3, hid, cout)) * (1 / np.sqrt(9 * hid))
    return w1, w2, w3


def conv_xla(x, w, dn):
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding="SAME",
        dimension_numbers=dn)


def stack_xla(x, ws, dn):
    a = jax.nn.leaky_relu(conv_xla(x, ws[0], dn), LEAKY)
    a = jax.nn.leaky_relu(conv_xla(a, ws[1], dn), LEAKY)
    return conv_xla(a, ws[2], dn)


def shift_gemm_3x3(x_nhwc, w):
    """3x3 SAME conv as 9 shifted (B*H*W, C) @ (C, O) dots."""
    b, h, wd, c = x_nhwc.shape
    o = w.shape[-1]
    xp = jnp.pad(x_nhwc, ((0, 0), (1, 1), (1, 1), (0, 0)))
    out = None
    for di in range(3):
        for dj in range(3):
            xs = jax.lax.dynamic_slice(xp, (0, di, dj, 0), (b, h, wd, c))
            t = jnp.dot(xs.reshape(b * h * wd, c), w[di, dj],
                        preferred_element_type=x_nhwc.dtype)
            out = t if out is None else out + t
    return out.reshape(b, h, wd, o)


def im2col_3x3(x_nhwc, w):
    """3x3 SAME conv as ONE (B*H*W, 9C) @ (9C, O) dot (patches
    materialized; only sane for small C)."""
    b, h, wd, c = x_nhwc.shape
    o = w.shape[-1]
    xp = jnp.pad(x_nhwc, ((0, 0), (1, 1), (1, 1), (0, 0)))
    cols = [jax.lax.dynamic_slice(xp, (0, di, dj, 0), (b, h, wd, c))
            for di in range(3) for dj in range(3)]
    patches = jnp.concatenate(cols, axis=-1).reshape(b * h * wd, 9 * c)
    wf = w.reshape(9 * c, o)
    return jnp.dot(patches, wf,
                   preferred_element_type=x_nhwc.dtype).reshape(b, h, wd, o)


def gemm_1x1(x_nhwc, w):
    b, h, wd, c = x_nhwc.shape
    o = w.shape[-1]
    return jnp.dot(x_nhwc.reshape(b * h * wd, c), w[0, 0],
                   preferred_element_type=x_nhwc.dtype).reshape(b, h, wd, o)


def stack_shift_gemm(x_nhwc, ws):
    a = jax.nn.leaky_relu(shift_gemm_3x3(x_nhwc, ws[0]), LEAKY)
    a = jax.nn.leaky_relu(gemm_1x1(a, ws[1]), LEAKY)
    return shift_gemm_3x3(a, ws[2])


def stack_im2col_first(x_nhwc, ws):
    a = jax.nn.leaky_relu(im2col_3x3(x_nhwc, ws[0]), LEAKY)
    a = jax.nn.leaky_relu(gemm_1x1(a, ws[1]), LEAKY)
    return shift_gemm_3x3(a, ws[2])


def run_config(cin, side, batch, results, reps=24):
    """``reps`` must put the R1 chain span >= ~40 ms (bench_suite
    docstring) or the two-point slope is relay noise — the sub-ms stacks
    need hundreds of reps."""
    key = jax.random.PRNGKey(0)
    cout = 2 * cin  # coupling head emits scale+shift-sized output
    ws = make_weights(key, cin, cout)
    x0_nchw = jax.random.normal(key, (batch, cin, side, side))
    x0_nhwc = jnp.transpose(x0_nchw, (0, 2, 3, 1))
    dn_nchw = ("NCHW", "HWIO", "NCHW")
    dn_nhwc = ("NHWC", "HWIO", "NHWC")

    # numerics pin: all forms agree on the same input
    with jax.default_matmul_precision("float32"):
        r0 = jnp.transpose(stack_xla(x0_nchw, ws, dn_nchw), (0, 2, 3, 1))
        r2 = stack_shift_gemm(x0_nhwc, ws)
        r3 = stack_im2col_first(x0_nhwc, ws)
    for nm, r in (("shift_gemm", r2), ("im2col_first", r3)):
        gap = float(jnp.max(jnp.abs(r - r0)))
        assert gap < 1e-3, (nm, gap)

    arms = {
        "xla_nchw": (lambda x: stack_xla(x, ws, dn_nchw), x0_nchw),
        "xla_nhwc": (lambda x: stack_xla(x, ws, dn_nhwc), x0_nhwc),
        "shift_gemm": (lambda x: stack_shift_gemm(x, ws), x0_nhwc),
        "im2col_first": (lambda x: stack_im2col_first(x, ws), x0_nhwc),
    }
    tag = f"c{cin}_s{side}_b{batch}"
    for nm, (fn, x0) in arms.items():
        def fwd_body(x):
            y = fn(x)
            # carry: fold output back to input shape with a cheap reduce
            return x + jnp.mean(y) * 1e-12

        def grad_body(x):
            g = jax.grad(lambda q: jnp.sum(fn(q)) * 1e-6)(x)
            return x + g * 1e-6

        t_f = timed_chain(fwd_body, x0, reps, label=f"{tag}_{nm}_fwd")
        t_g = timed_chain(grad_body, x0, max(4, reps // 2),
                          label=f"{tag}_{nm}_vg")
        m_rows = batch * side * side
        flops = 2 * m_rows * (9 * cin * HID + HID * HID + 9 * HID * cout)
        results[f"{tag}_{nm}"] = dict(
            fwd_ms=round(t_f * 1e3, 4), grad_ms=round(t_g * 1e3, 4),
            fwd_tflops=round(flops / t_f / 1e12, 2))
        print(f"{tag:16s} {nm:14s} fwd {t_f * 1e3:7.3f} ms "
              f"({flops / t_f / 1e12:5.1f} TF/s)  "
              f"fwd+grad {t_g * 1e3:7.3f} ms", flush=True)


def main():
    results = {}
    # full-recipe conditioner shapes (channel-split halves the level's
    # channels): L0 6ch@16x16 (the 16 dominant blocks), L1 12ch@8x8 —
    # plus the verdict's 12ch@32x32 stress shape. reps sized for >=40 ms
    # R1 spans at the measured per-stack times (L2 24ch@4x4 is dropped:
    # at ~10-30 us/stack even 4096 reps sit inside relay noise, and the
    # level contributes ~1% of the step).
    for cin, side, batch, reps in ((6, 16, 128, 512), (12, 8, 128, 1024),
                                   (12, 32, 128, 48)):
        run_config(cin, side, batch, results, reps=reps)
    os.makedirs(OUT, exist_ok=True)
    path = os.path.join(OUT, "conv_gemm_ab.json")
    with open(path, "w") as f:
        json.dump(results, f, indent=2)
    print("wrote", path)


if __name__ == "__main__":
    main()
