"""Input pipeline: ArrayDataset batching, prefetch_to_device, sharded
transfer on the virtual 8-device mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nf_tpu.data import ArrayDataset, load_npz_images, prefetch_to_device
from nf_tpu.parallel import make_mesh
from nf_tpu.parallel.mesh import data_sharding


def test_array_dataset_batching_and_shuffle():
    x = np.arange(100, dtype=np.float32).reshape(100, 1)
    y = np.arange(100)
    ds = ArrayDataset(x, y, batch_size=32, shuffle=True, seed=1)
    assert len(ds) == 3
    batches = list(ds)
    assert len(batches) == 3
    xs = np.concatenate([b[0] for b in batches])[:, 0]
    ys = np.concatenate([b[1] for b in batches])
    assert (xs == ys).all()  # pairing preserved under shuffle
    assert not (ys == np.arange(96)).all()  # actually shuffled
    # second epoch reshuffles differently
    ys2 = np.concatenate([b[1] for b in ds])
    assert not (ys == ys2).all()


def test_array_dataset_drop_last_and_transform():
    x = np.ones((10, 2), np.float32)
    ds = ArrayDataset(x, batch_size=4, shuffle=False, drop_last=False,
                      transform=lambda b: (b[0] * 2,))
    sizes = [b.shape[0] for b in ds]
    assert sizes == [4, 4, 2]
    assert float(next(iter(ds)).max()) == 2.0


def test_epochs_stream():
    ds = ArrayDataset(np.arange(8), batch_size=4, shuffle=False)
    stream = list(ds.epochs(3))
    assert len(stream) == 6


def test_prefetch_to_device_values_and_order():
    ds = ArrayDataset(np.arange(24, dtype=np.float32), batch_size=8,
                      shuffle=False)
    got = list(prefetch_to_device(iter(ds), size=2))
    assert len(got) == 3
    assert all(isinstance(g, jax.Array) for g in got)
    np.testing.assert_array_equal(
        np.concatenate([np.asarray(g) for g in got]), np.arange(24))


def test_prefetch_propagates_errors():
    def bad():
        yield np.zeros(2)
        raise RuntimeError("boom")

    it = prefetch_to_device(bad(), size=1)
    next(it)
    with pytest.raises(RuntimeError, match="boom"):
        list(it)


def test_prefetch_sharded_on_mesh():
    mesh = make_mesh(("data",))
    ds = ArrayDataset(np.arange(64, dtype=np.float32).reshape(16, 4),
                      batch_size=8, shuffle=False)
    sh = data_sharding(mesh, 2)
    got = list(prefetch_to_device(iter(ds), size=2, sharding=sh))
    assert got[0].sharding.is_equivalent_to(sh, 2)
    # batch rows land split over the 8 virtual devices
    assert len(got[0].addressable_shards) == 8


def test_epochs_raises_on_empty_dataset():
    ds = ArrayDataset(np.arange(4), batch_size=8)  # 0 batches w/ drop_last
    with pytest.raises(ValueError, match="0 batches"):
        next(ds.epochs())


def test_prefetch_early_break_stops_worker():
    import threading

    before = threading.active_count()
    ds = ArrayDataset(np.arange(1024, dtype=np.float32), batch_size=8,
                      shuffle=False)
    for i, _ in enumerate(prefetch_to_device(ds.epochs(), size=2)):
        if i == 1:
            break
    # generator finalizer sets the stop event; the worker exits promptly
    import time

    for _ in range(50):
        if threading.active_count() <= before:
            break
        time.sleep(0.1)
    assert threading.active_count() <= before


def test_load_npz_images(tmp_path):
    p = str(tmp_path / "d.npz")
    np.savez(p, x=np.full((4, 3, 2, 2), 128, np.uint8),
             y=np.arange(4))
    x, y = load_npz_images(p)
    assert x.dtype == np.float32 and abs(float(x[0, 0, 0, 0]) - 0.5) < 1e-6
    assert (y == np.arange(4)).all()


def test_glow_ab_generator_bit_identical_to_data_module():
    """benchmarks/glow_bpd_ab.py keeps a numpy copy of the procedural image
    generator so its torch phase never imports the jax-latched stack; the
    A/B's "identical data" evidence rests on that copy staying bit-identical
    to nf_tpu.data.procedural_image_classes — enforce it."""
    import importlib.util
    import os

    from nf_tpu.data import procedural_image_classes

    spec = importlib.util.spec_from_file_location(
        "glow_bpd_ab", os.path.join(os.path.dirname(__file__), os.pardir,
                                    "benchmarks", "glow_bpd_ab.py"))
    ab = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ab)

    seed, n = 7, 64
    x_ab, y_ab = ab.procedural_cifar_np(np.random.default_rng(seed), n)
    x_dm, y_dm = procedural_image_classes(seed, n)
    assert (x_ab == x_dm).all() and (y_ab == y_dm).all()


def test_glow_ab_report_precision_precedence(tmp_path, capsys):
    """The A/B report must never mix eval precisions in one cell: exact-f32
    tagged rows supersede untagged/default rows per (iter, framework) —
    the two differ by ~0.02 bpd at late iterations (TPU default matmul
    precision; benchmarks/exp_ckpt_exchange_50k.py)."""
    import importlib.util
    import json
    import os
    import types

    spec = importlib.util.spec_from_file_location(
        "glow_bpd_ab2", os.path.join(os.path.dirname(__file__), os.pardir,
                                     "benchmarks", "glow_bpd_ab.py"))
    ab = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ab)
    ab.OUT = str(tmp_path)

    def w(name, rows):
        with open(tmp_path / name, "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")

    w("glow_abT_torch.jsonl", [
        {"framework": "torch", "iter": 100, "eval_seed": 0, "bpd": 5.0,
         "sem": 1e-4}])
    # old-style untagged jax file (default precision) ...
    w("glow_abT_jax.jsonl", [
        {"framework": "jax", "iter": 100, "eval_seed": 0, "bpd": 4.8,
         "sem": 1e-4}])
    # ... and a dual-precision file: the f32 rows must win, the default
    # rows (old file's AND this file's) must be excluded
    w("glow_abT_jax_p32.jsonl", [
        {"framework": "jax", "iter": 100, "eval_seed": 0,
         "precision": "default", "bpd": 4.81, "sem": 1e-4},
        {"framework": "jax", "iter": 100, "eval_seed": 0,
         "precision": "float32", "bpd": 5.02, "sem": 1e-4}])

    ab.cmd_report(types.SimpleNamespace(tag="T"))
    table = capsys.readouterr().out
    line = [l for l in table.splitlines() if l.startswith("| 100 ")][0]
    assert "| 5.0200 |" in line, line      # f32 row only, not mean(4.8, ...)
    # bands are MEASURED now (the round-4 0.02 floor is gone): a 0.02 gap
    # against a 2e-4 band must be reported OUTSIDE, not floored away
    assert "OUTSIDE" in line, line


def test_glow_ab_report_measured_seed_band(tmp_path, capsys):
    """With a second torch model-seed on file, the agreement band is the
    measured per-iter seed spread; iters that only one torch seed reached
    use the latest multi-seed spread and are footnoted, never floored."""
    import importlib.util
    import json
    import os
    import types

    spec = importlib.util.spec_from_file_location(
        "glow_bpd_ab3", os.path.join(os.path.dirname(__file__), os.pardir,
                                     "benchmarks", "glow_bpd_ab.py"))
    ab = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ab)
    ab.OUT = str(tmp_path)

    def w(name, rows):
        with open(tmp_path / name, "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")

    w("glow_abS_torch.jsonl", [
        {"framework": "torch", "iter": 100, "eval_seed": 0, "bpd": 5.00,
         "sem": 1e-4},
        {"framework": "torch", "iter": 200, "eval_seed": 0, "bpd": 4.90,
         "sem": 1e-4}])
    w("glow_abS_torch_seed1.jsonl", [
        {"framework": "torch", "iter": 100, "eval_seed": 0, "bpd": 5.03,
         "sem": 1e-4}])  # seed spread 0.03 at iter 100; no row at 200
    w("glow_abS_jax.jsonl", [
        {"framework": "jax", "iter": 100, "eval_seed": 0, "bpd": 5.035,
         "sem": 1e-4},
        {"framework": "jax", "iter": 200, "eval_seed": 0, "bpd": 4.92,
         "sem": 1e-4}])

    ab.cmd_report(types.SimpleNamespace(tag="S"))
    table = capsys.readouterr().out
    l100 = [l for l in table.splitlines() if l.startswith("| 100 ")][0]
    l200 = [l for l in table.splitlines() if l.startswith("| 200 ")][0]
    # iter 100: measured band = seed spread 0.03 >= |5.035 - 5.015| = 0.02
    assert "within" in l100, l100
    assert "†" not in l100, l100  # measured at this iter, no footnote
    # iter 200: single torch seed; band widened to the iter-100 spread
    # (0.03 > |4.92 - 4.90|), footnoted
    assert "within" in l200 and "†" in l200, l200
    assert "† single torch model-seed" in table
