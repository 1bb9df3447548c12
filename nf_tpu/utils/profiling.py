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


def throughput(fn, x, iters=20, items_per_call=1):
    """Measure items/s of ``fn(x) -> y`` (y must have x's shape/dtype).

    Chains ``iters`` applications inside ONE jitted ``lax.scan`` with a data
    dependency, so the measurement is real serialized device time — a
    Python loop of async dispatches with a single trailing
    ``block_until_ready`` under-reports badly on relay/remote-dispatch
    setups (see CLAUDE.md / docs/kernels.md "benchmarking caveat")."""
    import jax.numpy as jnp
    from jax import lax

    @jax.jit
    def chain(x0):
        return lax.scan(lambda c, _: (fn(c), None), x0, None,
                        length=iters)[0]

    out = chain(x)  # compile + warmup
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = chain(x)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    return items_per_call * iters / dt


def enable_compilation_cache(path="/tmp/nf_tpu_jax_cache_tpu",
                             min_compile_secs=1.0):
    """Turn on JAX's persistent compilation cache (works for the remote-TPU
    backend here: measured 166s -> 39s for a cold K=24 RealNVP step in a
    fresh process). Call before the first jit execution."""
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      float(min_compile_secs))
