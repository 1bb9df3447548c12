"""Roofline A/B for the two SURVEY §2 Pallas-kernel candidates that were
never built: (a) the XLA-fused affine-coupling transform (fwd math of
reference ``flows/affine/coupling.py:99-171``, the Glow ``sigmoid`` scale
map) and (b) the LU 1x1-conv apply+logdet (reference
``flows/mixing.py:57-133``) — measured against a same-memory-footprint
copy body, the achieved-vs-roofline methodology that justified the spline
kernel (``exp_overhead_floor.py``).

Decision rule (VERDICT r2 item 3): if the XLA lowering sits within 1.3x of
its copy-roofline, a hand Pallas kernel has no headroom and the target is
retired with data; otherwise it gets built. Both ops are elementwise /
tiny-matmul over Glow-recipe shapes, so the expected bound is HBM traffic,
not MXU.

Traffic accounting per application (f32):
  coupling: read z2 (C2 plane) + shift + scale (one C2 plane each),
            write z2'            -> 4 planes       == copy body
  1x1 conv: read z (C plane), write z' (+ CxC weight assembly, negligible)
            -> 2 planes                            == copy body

The scale argument is perturbed per rep by a carry-dependent epsilon so
XLA cannot hoist the sigmoid out of the scan (both sides of the A/B keep
identical per-rep traffic).

Run: cd /root/repo && python benchmarks/exp_coupling_conv_roofline.py
Writes benchmarks/coupling_conv_roofline.json for docs/kernels.md.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from bench_suite import _best_wall, compile_scan_chain, warmup_with_retries
from nf_tpu.flows.mixing import Invertible1x1Conv
from nf_tpu.utils.profiling import enable_compilation_cache

OUT_JSON = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "coupling_conv_roofline.json")

# Glow full-recipe shapes (L=3 K=16, CIFAR 32x32): per-level (C, H, W)
# after squeeze; coupling sees C/2. Plus one larger config (the serving/
# max-throughput batch) where the planes stop being launch-dominated.
COUPLING_SHAPES = [  # (label, B, C2, H, W) -- z2 and each param plane
    ("glow_L0_b128", 128, 6, 16, 16),
    ("glow_L2_b128", 128, 24, 4, 4),
    ("glow_L0_b1024", 1024, 6, 16, 16),
    ("big_b256_c32_32x32", 256, 32, 32, 32),
]
CONV_SHAPES = [  # (label, B, C, H, W)
    ("glow_L0_b128", 128, 12, 16, 16),
    ("glow_L2_b128", 128, 48, 4, 4),
    ("glow_L0_b1024", 1024, 12, 16, 16),
    ("big_b256_c64_32x32", 256, 64, 32, 32),
]
def _reps_for(bytes_per_app, target_s=0.05):
    """Chain length whose expected device time (at the 819 GB/s HBM
    roofline) is ~target_s: these ops are MICROSECONDS per application, so
    fixed small reps drown in relay jitter (the first cut of this
    experiment measured negative deltas at reps 16/64)."""
    est = bytes_per_app / 819e9
    r = max(64, int(target_s / est))
    return min(r, 1 << 17)


def two_point(body, x0, bytes_per_app):
    r1 = _reps_for(bytes_per_app)
    r2 = 4 * r1
    walls = {}
    for r in (r1, r2):
        c = compile_scan_chain(body, r)
        warmup_with_retries(c, x0)
        walls[r] = _best_wall(c, x0)
    return (walls[r2] - walls[r1]) / (r2 - r1), r1


def bench_coupling(label, B, C2, H, W, key):
    k1, k2, k3 = jax.random.split(key, 3)
    z2 = jax.random.normal(k1, (B, C2, H, W))
    shift = jax.random.normal(k2, (B, C2, H, W)) * 0.1
    scale0 = jax.random.normal(k3, (B, C2, H, W)) * 0.1

    def op_body(z2c):
        # the coupling *transform* with the conditioner output given —
        # exactly the op a fused Pallas kernel would implement (the
        # conditioner itself is a separate MXU-bound conv, measured in
        # bench_glow_full.py). Forward sigmoid map of AffineCoupling
        # (nf_tpu/flows/affine.py; reference coupling.py:158-161) + the
        # carry-dependent epsilon to pin the sigmoid inside the scan.
        scale_ = scale0 + jnp.mean(z2c) * 1e-12
        sig = jax.nn.sigmoid(scale_ + 2)
        out = z2c / sig + shift
        log_det = -jnp.sum(jnp.log(sig), axis=(1, 2, 3))
        return out + log_det[:, None, None, None] * 1e-12

    def copy_body(z2c):
        # same reads (z2, shift, scale0), same write, trivial compute
        out = z2c + shift + scale0 + jnp.mean(z2c) * 1e-12
        return out

    planes = 4  # 3 reads + 1 write
    bytes_per_app = planes * z2.size * 4
    dt_op, reps = two_point(op_body, z2, bytes_per_app)
    dt_copy, _ = two_point(copy_body, z2, bytes_per_app)
    return {
        "op": "affine_coupling_sigmoid_fwd", "shape": label,
        "elements": int(z2.size), "reps": reps,
        "op_us": round(dt_op * 1e6, 2), "copy_us": round(dt_copy * 1e6, 2),
        "op_gbps": round(bytes_per_app / max(dt_op, 1e-12) / 1e9, 1),
        "copy_gbps": round(bytes_per_app / max(dt_copy, 1e-12) / 1e9, 1),
        "vs_roofline": round(dt_op / max(dt_copy, 1e-12), 3),
    }


def bench_conv(label, B, C, H, W, key):
    k1, k2 = jax.random.split(key)
    layer = Invertible1x1Conv.create(k1, C, use_lu=True)
    z = jax.random.normal(k2, (B, C, H, W))

    def op_body(zc):
        # density-direction apply: W assembled from LU + channel matmul +
        # O(C) logdet (nf_tpu/flows/mixing.py inverse; ref mixing.py:120)
        z_, ld = layer.inverse(zc)
        return z_ + ld[:, None, None, None] * 1e-12

    def copy_body(zc):
        return zc * 1.0001 + 0.5

    bytes_per_app = 2 * z.size * 4  # read z + write z'
    dt_op, reps = two_point(op_body, z, bytes_per_app)
    dt_copy, _ = two_point(copy_body, z, bytes_per_app)
    flops = 2 * B * H * W * C * C
    return {
        "op": "lu_1x1_conv_inverse", "shape": label, "elements": int(z.size),
        "reps": reps,
        "op_us": round(dt_op * 1e6, 2), "copy_us": round(dt_copy * 1e6, 2),
        "op_gbps": round(bytes_per_app / max(dt_op, 1e-12) / 1e9, 1),
        "copy_gbps": round(bytes_per_app / max(dt_copy, 1e-12) / 1e9, 1),
        "op_gflops": round(flops / max(dt_op, 1e-12) / 1e9, 1),
        "vs_roofline": round(dt_op / max(dt_copy, 1e-12), 3),
    }


def main():
    enable_compilation_cache()
    print("backend:", jax.default_backend(), flush=True)
    key = jax.random.PRNGKey(0)
    rows = []
    for i, (label, B, C2, H, W) in enumerate(COUPLING_SHAPES):
        r = bench_coupling(label, B, C2, H, W, jax.random.fold_in(key, i))
        rows.append(r)
        print(r, flush=True)
    for i, (label, B, C, H, W) in enumerate(CONV_SHAPES):
        r = bench_conv(label, B, C, H, W, jax.random.fold_in(key, 100 + i))
        rows.append(r)
        print(r, flush=True)
    with open(OUT_JSON, "w") as f:
        json.dump(rows, f, indent=1)
    print("wrote", OUT_JSON)


if __name__ == "__main__":
    main()
