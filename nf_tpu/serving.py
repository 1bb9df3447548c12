"""Serving / inference path: ahead-of-time compiled executables.

The reference has no deployment story (eager PyTorch modules). For TPU
serving the right artifact is an XLA executable compiled once for a fixed
batch shape, with parameters resident on device:

* :func:`compile_sampler` — AOT-compiled ``sample(key) -> (z, log_q)`` at a
  fixed ``num_samples`` (and temperature where the model supports it).
* :func:`compile_log_prob` — AOT-compiled density evaluation at a fixed
  batch shape.

Both return a :class:`CompiledFn` that executes with zero Python/dispatch
overhead beyond the runtime call, exposes XLA's ``cost_analysis`` (FLOPs /
bytes accessed — the basis for roofline accounting), and can be refreshed
with new parameters (``with_model``) without recompiling, as long as the
pytree structure matches.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from .utils.module import combine, partition


class CompiledFn:
    """An AOT-compiled executable plus its bound parameters."""

    def __init__(self, compiled, params, n_fixed_args):
        self._compiled = compiled
        self._params = params
        self._n_fixed = n_fixed_args

    def __call__(self, *args):
        return self._compiled(self._params, *args)

    def with_model(self, model) -> "CompiledFn":
        """Rebind to updated parameters (same structure) — no recompile."""
        params, _ = partition(model)
        return CompiledFn(self._compiled, params, self._n_fixed)

    def cost_analysis(self):
        """XLA cost analysis dict (``flops``, ``bytes accessed``, ...)."""
        c = self._compiled.cost_analysis()
        return c[0] if isinstance(c, (list, tuple)) else c

    def flops(self) -> Optional[float]:
        return (self.cost_analysis() or {}).get("flops")

    def memory_analysis(self):
        return self._compiled.memory_analysis()


def _aot(fn: Callable, params, *arg_specs, donate_params=False) -> Any:
    jitted = jax.jit(fn, donate_argnums=(0,) if donate_params else ())
    lowered = jitted.lower(params, *arg_specs)
    return lowered.compile()


def compile_sampler(model, num_samples: int,
                    temperature: Optional[float] = None,
                    context_shape: Optional[Tuple[int, ...]] = None,
                    dtype=jnp.float32) -> CompiledFn:
    """AOT-compile ``sample``: returns ``CompiledFn(key[, context])``.

    ``temperature`` is baked into the executable when given (models without
    temperature support simply ignore it being None). ``context_shape`` is
    the per-call context array shape for conditional models (leading dim
    must broadcast against ``num_samples``).
    """
    params, static = partition(model)

    if context_shape is not None:
        def fn(p, key, context):
            m = combine(p, static)
            return m.sample(key, num_samples, context=context)
        key_spec = jax.ShapeDtypeStruct((2,), jnp.uint32)
        ctx_spec = jax.ShapeDtypeStruct(context_shape, dtype)
        compiled = _aot(fn, params, key_spec, ctx_spec)
        return CompiledFn(compiled, params, 1)

    if temperature is not None:
        def fn(p, key):
            m = combine(p, static)
            return m.sample(key, num_samples, temperature=temperature)
    else:
        def fn(p, key):
            m = combine(p, static)
            return m.sample(key, num_samples)
    key_spec = jax.ShapeDtypeStruct((2,), jnp.uint32)
    compiled = _aot(fn, params, key_spec)
    return CompiledFn(compiled, params, 1)


def compile_log_prob(model, batch_shape: Tuple[int, ...],
                     context_shape: Optional[Tuple[int, ...]] = None,
                     dtype=jnp.float32) -> CompiledFn:
    """AOT-compile ``log_prob`` at a fixed batch shape:
    ``CompiledFn(x[, context]) -> log_p``."""
    params, static = partition(model)
    x_spec = jax.ShapeDtypeStruct(batch_shape, dtype)
    if context_shape is not None:
        def fn(p, x, context):
            return combine(p, static).log_prob(x, context=context)
        ctx_spec = jax.ShapeDtypeStruct(context_shape, dtype)
        compiled = _aot(fn, params, x_spec, ctx_spec)
        return CompiledFn(compiled, params, 2)

    def fn(p, x):
        return combine(p, static).log_prob(x)
    compiled = _aot(fn, params, x_spec)
    return CompiledFn(compiled, params, 1)
