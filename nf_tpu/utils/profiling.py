"""Tracing / profiling utilities (SURVEY §5 — absent in the reference).

* :class:`Named` — flow wrapper entering a ``jax.named_scope`` so each layer
  shows up as its own region in TPU profiler traces.
* :func:`trace` — context manager around ``jax.profiler`` writing a
  TensorBoard-compatible trace.
* :func:`throughput` — samples/s measurement harness used by ``bench.py``
  and the scaling reports.
"""

from __future__ import annotations

import contextlib
import time
from typing import Any, Callable

import jax

from ..flows.base import Flow
from .module import static_field


class Named(Flow):
    """Wrap a flow in a named scope for profiler visibility."""

    flow: Any
    name: str = static_field(default="flow")

    @classmethod
    def create(cls, flow, name):
        return cls(flow=flow, name=name)

    def forward(self, z, context=None, key=None):
        with jax.named_scope(self.name):
            return self.flow.forward(z, context=context, key=key)

    def inverse(self, z, context=None, key=None):
        with jax.named_scope(f"{self.name}_inv"):
            return self.flow.inverse(z, context=context, key=key)

    def init_data_forward(self, z, context=None, key=None):
        flow, z, ld = self.flow.init_data_forward(z, context=context, key=key)
        return self.replace(flow=flow), z, ld

    def init_data_inverse(self, z, context=None, key=None):
        flow, z, ld = self.flow.init_data_inverse(z, context=context, key=key)
        return self.replace(flow=flow), z, ld


@contextlib.contextmanager
def trace(log_dir):
    """Capture a profiler trace viewable in TensorBoard/XProf."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def throughput(fn, *args, iters=20, warmup=2, items_per_call=1):
    """Measure items/s of a (jitted) callable; blocks on the result."""
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    return items_per_call * iters / dt
