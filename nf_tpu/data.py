"""Host-side input pipeline.

The reference feeds models with ``torch.utils.data.DataLoader`` (e.g.
``examples/glow.ipynb`` cell 3: CIFAR-10 + ``Scale``/``Jitter`` dequant,
num_workers=4). The TPU-idiomatic equivalent is simpler and faster for
array data: numpy batching on the host, preprocessing as pure functions,
and a background thread that keeps the NEXT batches already transferred
to device HBM (double buffering) so the accelerator never waits on PCIe /
relay latency.

Components:

* :class:`ArrayDataset` — in-memory arrays with shuffled epoch batching.
* :func:`prefetch_to_device` — wrap any batch iterator; overlaps host →
  device transfer with device compute via a worker thread + bounded queue.
  Accepts a ``jax.sharding.Sharding`` (e.g. batch-sharded over a mesh's
  ``data`` axis) so multi-chip training feeds directly from the host.
* :func:`load_npz_images` — ``.npz`` image loading with the reference's
  uint8 → [0,1] convention.
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterable, Iterator, Optional, Sequence

import jax
import numpy as np


class ArrayDataset:
    """In-memory dataset over equal-length arrays (reference analogue:
    ``torch.utils.data.TensorDataset`` + ``DataLoader(shuffle=True)``).

    Iterating yields tuples of numpy batch slices (single arrays are
    unwrapped). ``transform(batch) -> batch`` runs on the host per batch —
    use it for dequantization (``utils.preprocessing.Scale``/``Jitter``)
    or augmentation.
    """

    def __init__(self, *arrays, batch_size: int, shuffle: bool = True,
                 drop_last: bool = True, seed: int = 0,
                 transform: Optional[Callable] = None):
        if not arrays:
            raise ValueError("ArrayDataset needs at least one array")
        n = len(arrays[0])
        for a in arrays[1:]:
            if len(a) != n:
                raise ValueError("all arrays must share the leading dim")
        self.arrays = tuple(np.asarray(a) for a in arrays)
        self.batch_size = int(batch_size)
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.transform = transform
        self._rng = np.random.default_rng(seed)
        self._n = n

    def __len__(self):
        if self.drop_last:
            return self._n // self.batch_size
        return -(-self._n // self.batch_size)

    def __iter__(self) -> Iterator:
        idx = np.arange(self._n)
        if self.shuffle:
            self._rng.shuffle(idx)
        stop = (self._n - self.batch_size + 1) if self.drop_last else self._n
        for s in range(0, max(stop, 0), self.batch_size):
            sel = idx[s:s + self.batch_size]
            batch = tuple(a[sel] for a in self.arrays)
            if self.transform is not None:
                batch = self.transform(batch)
            yield batch if len(batch) > 1 else batch[0]

    def epochs(self, n: Optional[int] = None) -> Iterator:
        """Chain ``n`` epochs (infinite if ``None``) into one stream."""
        if len(self) == 0:
            raise ValueError(
                f"dataset yields 0 batches (n={self._n} < batch_size="
                f"{self.batch_size} with drop_last): epochs() would spin "
                "forever")
        done = 0
        while n is None or done < n:
            yield from self
            done += 1


_SENTINEL = object()


def prefetch_to_device(iterator: Iterable, size: int = 2, sharding=None):
    """Background-thread prefetch: keep up to ``size`` batches already on
    device while the current step runs (double/triple buffering).

    ``sharding``: optional ``jax.sharding.Sharding`` applied on transfer —
    pass ``parallel.mesh.data_sharding(mesh, ndim)`` to land each batch
    pre-sharded over the mesh's ``data`` axis (the multi-host analogue of
    the reference's per-process DataLoader). Exceptions in the source
    iterator propagate to the consumer.
    """
    if size < 1:
        raise ValueError("prefetch size must be >= 1")
    q: "queue.Queue" = queue.Queue(maxsize=size)
    stop = threading.Event()

    def put(batch):
        if sharding is None:
            return jax.tree_util.tree_map(jax.device_put, batch)
        return jax.tree_util.tree_map(
            lambda x: jax.device_put(x, sharding), batch)

    def enqueue(item) -> bool:
        """Blocking put that aborts when the consumer went away."""
        while not stop.is_set():
            try:
                q.put(item, timeout=0.1)
                return True
            except queue.Full:
                continue
        return False

    def worker():
        try:
            for batch in iterator:
                if stop.is_set() or not enqueue(put(batch)):
                    return
        except BaseException as e:  # noqa: BLE001 — propagate to consumer
            enqueue(e)
            return
        enqueue(_SENTINEL)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    try:
        while True:
            item = q.get()
            if item is _SENTINEL:
                return
            if isinstance(item, BaseException):
                raise item
            yield item
    finally:
        # consumer stopped (break / exception / close): release the worker
        # and drop any device-resident batches it had queued
        stop.set()
        while True:
            try:
                q.get_nowait()
            except queue.Empty:
                break


def procedural_image_classes(seed: int, n: int, num_classes: int = 10,
                             size: int = 32, channels: int = 3):
    """Class-structured procedural RGB images (uint8 NCHW) + labels — the
    zero-download stand-in for CIFAR-10 used by the image recipes
    (class-dependent colored sinusoid blobs + uniform texture). Pure numpy
    so data generation is backend- and framework-neutral."""
    rng = np.random.default_rng(seed)
    y = rng.integers(0, num_classes, size=n)
    yy, xx = np.mgrid[0:size, 0:size] / size
    phase = y[:, None, None] / num_classes * 2 * np.pi
    base = 0.5 + 0.5 * np.sin(2 * np.pi * (xx + yy)[None] + phase)
    rgb = np.stack([np.cos(phase), np.sin(phase),
                    np.cos(2 * phase)], 1)[:, :channels]
    img = 0.6 * base[:, None] * (0.5 + 0.5 * rgb)
    img = img + 0.1 * rng.random((n, channels, size, size))
    return ((np.clip(img, 0, 1) * 255).astype(np.uint8),
            y.astype(np.int32))


def load_npz_images(path: str, keys: Sequence[str] = ("x", "y"),
                    to_unit_interval: bool = True):
    """Load image arrays from an ``.npz`` (the ``--data`` convention of the
    image examples): ``x`` uint8 NCHW, optional labels. uint8 scales to
    [0, 1] like the reference's ``ToTensor()`` + ``Scale(255/256)`` pipeline
    feeds into ``utils.preprocessing`` dequantization."""
    d = np.load(path)
    out = []
    for k in keys:
        if k not in d:
            continue
        a = d[k]
        if to_unit_interval and a.dtype == np.uint8 and k == keys[0]:
            a = a.astype(np.float32) / 256.0
        out.append(a)
    if not out:
        raise ValueError(f"none of {keys} found in {path}")
    return tuple(out) if len(out) > 1 else out[0]
