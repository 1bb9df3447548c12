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

    def __init__(self, compiled, params):
        self._compiled = compiled
        self._params = params

    def __call__(self, *args):
        return self._compiled(self._params, *args)

    def with_model(self, model) -> "CompiledFn":
        """Rebind to updated parameters (same structure) — no recompile."""
        params, _ = partition(model)
        return CompiledFn(self._compiled, params)

    def cost_analysis(self):
        """XLA cost analysis dict (``flops``, ``bytes accessed``, ...)."""
        c = self._compiled.cost_analysis()
        return c[0] if isinstance(c, (list, tuple)) else c

    def flops(self) -> Optional[float]:
        return (self.cost_analysis() or {}).get("flops")

    def memory_analysis(self):
        return self._compiled.memory_analysis()


def _aot(fn: Callable, params, *arg_specs) -> Any:
    return jax.jit(fn).lower(params, *arg_specs).compile()


def _key_spec(typed_key: bool):
    """AOT argument spec for the PRNG key.

    Default is a legacy raw ``(2,) uint32`` key (``jax.random.PRNGKey``);
    pass ``typed_key=True`` to compile for the modern typed keys from
    ``jax.random.key`` instead — the two are different argument structures
    and an executable accepts only the one it was compiled for.
    """
    mk = (lambda: jax.random.key(0)) if typed_key \
        else (lambda: jax.random.PRNGKey(0))
    return jax.eval_shape(mk)


def compile_sampler(model, num_samples: int,
                    temperature: Optional[float] = None,
                    context_shape: Optional[Tuple[int, ...]] = None,
                    dtype=jnp.float32, typed_key: bool = False) -> CompiledFn:
    """AOT-compile ``sample``: returns ``CompiledFn(key[, context])``.

    ``temperature`` is baked into the executable when given (models without
    temperature support simply ignore it being None). ``context_shape`` is
    the per-call context array shape for conditional models (leading dim
    must broadcast against ``num_samples``); the conditional containers
    take no temperature, so combining the two raises. ``typed_key`` selects
    which key flavor the executable accepts (see :func:`_key_spec`).
    """
    params, static = partition(model)
    key_spec = _key_spec(typed_key)

    if context_shape is not None:
        if temperature is not None:
            raise ValueError(
                "temperature is not supported together with context_shape: "
                "conditional containers sample at temperature 1; build the "
                "sampler without temperature or rescale the base instead")

        def fn(p, key, context):
            m = combine(p, static)
            return m.sample(key, num_samples, context=context)

        ctx_spec = jax.ShapeDtypeStruct(context_shape, dtype)
        return CompiledFn(_aot(fn, params, key_spec, ctx_spec), params)

    if temperature is not None:
        def fn(p, key):
            m = combine(p, static)
            return m.sample(key, num_samples, temperature=temperature)
    else:
        def fn(p, key):
            m = combine(p, static)
            return m.sample(key, num_samples)
    return CompiledFn(_aot(fn, params, key_spec), params)


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
        return CompiledFn(_aot(fn, params, x_spec, ctx_spec), params)

    def fn(p, x):
        return combine(p, static).log_prob(x)
    return CompiledFn(_aot(fn, params, x_spec), params)
