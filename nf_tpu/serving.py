"""Serving / inference path: ahead-of-time compiled executables.

The reference has no deployment story (eager PyTorch modules). For TPU
serving the right artifact is an XLA executable compiled once for a fixed
batch shape, with parameters resident on device:

* :func:`compile_sampler` — AOT-compiled ``sample(key) -> (z, log_q)`` at a
  fixed ``num_samples`` (and temperature where the model supports it);
  conditional models take a context array, class-conditional models
  (``class_cond=True``) a label vector.
* :func:`compile_log_prob` — AOT-compiled density evaluation at a fixed
  batch shape (same context/label options).
* :func:`compile_log_prob_buckets` — the ragged-request story: compile a
  small ladder of batch-size buckets once, then serve ANY request size by
  padding up to the nearest bucket and slicing the answer back — no
  recompiles at serve time, bounded wasted compute (< 2x worst case with
  power-of-two buckets).

Both return a :class:`CompiledFn` that executes with zero Python/dispatch
overhead beyond the runtime call, exposes XLA's ``cost_analysis`` (FLOPs /
bytes accessed — the basis for roofline accounting), and can be refreshed
with new parameters (``with_model``) without recompiling, as long as the
pytree structure matches.

For cross-process deployment, :func:`export_sampler` /
:func:`export_log_prob` serialize the same computations to portable
StableHLO artifacts (``jax.export``) that :func:`load_exported` reloads in
a serving process with no model code present.
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


def _sampler_graph(model, num_samples: int, temperature, context_shape,
                   class_cond: bool, dtype, typed_key: bool):
    """Build the (fn(params, *args), params, arg_specs) triple for
    ``sample`` — shared by AOT compilation and ``jax.export``."""
    params, static = partition(model)
    key_spec = _key_spec(typed_key)

    if class_cond:
        if context_shape is not None:
            raise ValueError("class_cond and context_shape are exclusive: "
                             "labels condition the base, context threads "
                             "through the layers")
        y_spec = jax.ShapeDtypeStruct((num_samples,), jnp.int32)
        if temperature is not None:
            def fn(p, key, y):
                m = combine(p, static)
                return m.sample(key, num_samples, y=y,
                                temperature=temperature)
        else:
            def fn(p, key, y):
                return combine(p, static).sample(key, num_samples, y=y)
        return fn, params, (key_spec, y_spec)

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
        return fn, params, (key_spec, ctx_spec)

    if temperature is not None:
        def fn(p, key):
            m = combine(p, static)
            return m.sample(key, num_samples, temperature=temperature)
    else:
        def fn(p, key):
            m = combine(p, static)
            return m.sample(key, num_samples)
    return fn, params, (key_spec,)


def compile_sampler(model, num_samples: int,
                    temperature: Optional[float] = None,
                    context_shape: Optional[Tuple[int, ...]] = None,
                    class_cond: bool = False,
                    dtype=jnp.float32, typed_key: bool = False) -> CompiledFn:
    """AOT-compile ``sample``: returns ``CompiledFn(key[, context | y])``.

    ``temperature`` is baked into the executable when given (models without
    temperature support simply ignore it being None). ``context_shape`` is
    the per-call context array shape for conditional models (leading dim
    must broadcast against ``num_samples``); the conditional containers
    take no temperature, so combining the two raises. ``class_cond=True``
    compiles for label-conditional models (``ClassCondFlow`` /
    class-conditional ``MultiscaleFlow``): the executable takes an int32
    label vector ``y`` of length ``num_samples`` and DOES compose with
    ``temperature``. ``typed_key`` selects which key flavor the executable
    accepts (see :func:`_key_spec`).
    """
    fn, params, specs = _sampler_graph(model, num_samples, temperature,
                                       context_shape, class_cond, dtype,
                                       typed_key)
    return CompiledFn(_aot(fn, params, *specs), params)


def _log_prob_graph(model, batch_shape: Tuple[int, ...], context_shape,
                    class_cond: bool, dtype):
    """Build the (fn(params, *args), params, arg_specs) triple for
    ``log_prob`` — shared by AOT compilation and ``jax.export``."""
    params, static = partition(model)
    x_spec = jax.ShapeDtypeStruct(batch_shape, dtype)
    if class_cond:
        if context_shape is not None:
            raise ValueError("class_cond and context_shape are exclusive")
        y_spec = jax.ShapeDtypeStruct((batch_shape[0],), jnp.int32)

        def fn(p, x, y):
            return combine(p, static).log_prob(x, y)

        return fn, params, (x_spec, y_spec)
    if context_shape is not None:
        def fn(p, x, context):
            return combine(p, static).log_prob(x, context=context)

        ctx_spec = jax.ShapeDtypeStruct(context_shape, dtype)
        return fn, params, (x_spec, ctx_spec)

    def fn(p, x):
        return combine(p, static).log_prob(x)
    return fn, params, (x_spec,)


def compile_log_prob(model, batch_shape: Tuple[int, ...],
                     context_shape: Optional[Tuple[int, ...]] = None,
                     class_cond: bool = False,
                     dtype=jnp.float32) -> CompiledFn:
    """AOT-compile ``log_prob`` at a fixed batch shape:
    ``CompiledFn(x[, context | y]) -> log_p``. ``class_cond=True`` takes an
    int32 label vector ``y`` alongside ``x`` (``ClassCondFlow.log_prob`` /
    class-conditional ``MultiscaleFlow.log_prob``)."""
    fn, params, specs = _log_prob_graph(model, batch_shape, context_shape,
                                        class_cond, dtype)
    return CompiledFn(_aot(fn, params, *specs), params)


class BucketedFn:
    """Ragged-request wrapper over a ladder of fixed-batch executables.

    Serving traffic rarely arrives in one fixed batch size, and XLA
    executables are shape-specialized. This wrapper compiles each bucket
    once; a request of ``n`` rows pads to the smallest bucket >= n (edge
    padding repeats the LAST row — harmless, the pad rows are sliced off;
    safe because every served graph is row-independent) and returns exactly
    ``n`` results. Worst-case wasted compute with power-of-two buckets is
    < 2x, and there are NO serve-time recompiles.
    """

    def __init__(self, fns, buckets):
        self._fns = dict(zip(buckets, fns))
        self._buckets = sorted(buckets)

    @property
    def buckets(self):
        return tuple(self._buckets)

    def _bucket_for(self, n):
        for b in self._buckets:
            if n <= b:
                return b
        raise ValueError(f"request batch {n} exceeds the largest bucket "
                         f"{self._buckets[-1]}")

    def __call__(self, x, *extras):
        n = x.shape[0]
        b = self._bucket_for(n)
        pad = [(0, b - n)] + [(0, 0)] * (x.ndim - 1)
        xp = jnp.pad(x, pad, mode="edge")
        extras_p = tuple(
            jnp.pad(e, [(0, b - n)] + [(0, 0)] * (e.ndim - 1), mode="edge")
            for e in extras)
        out = self._fns[b](xp, *extras_p)
        return jax.tree_util.tree_map(lambda o: o[:n], out)

    def with_model(self, model):
        fns = [self._fns[b].with_model(model) for b in self._buckets]
        return BucketedFn(fns, self._buckets)


def compile_log_prob_buckets(model, max_batch: int,
                             feature_shape: Tuple[int, ...],
                             buckets: Optional[Tuple[int, ...]] = None,
                             context_shape: Optional[Tuple[int, ...]] = None,
                             class_cond: bool = False,
                             dtype=jnp.float32) -> BucketedFn:
    """Compile a power-of-two ladder of ``log_prob`` executables up to
    ``max_batch`` and serve any request size by pad-to-bucket
    (:class:`BucketedFn`). ``feature_shape`` is the per-row shape;
    ``context_shape`` likewise per-row for conditional models."""
    if buckets is None:
        b, buckets = 1, []
        while b < max_batch:
            buckets.append(b)
            b *= 2
        buckets = tuple(sorted(set(buckets + [max_batch])))
    fns = []
    for b in buckets:
        ctx = ((b,) + tuple(context_shape) if context_shape is not None
               else None)
        fns.append(compile_log_prob(
            model, (b,) + tuple(feature_shape), context_shape=ctx,
            class_cond=class_cond, dtype=dtype))
    return BucketedFn(fns, buckets)


# ---------------------------------------------------------------------------
# Serialized artifacts (jax.export / StableHLO)
#
# The AOT executables above live only in the building process. For
# deployment, `export_sampler` / `export_log_prob` serialize the traced
# computation to a portable StableHLO artifact (bytes) that a serving
# process reloads with `load_exported` — WITHOUT the model-building code,
# nf_tpu, or even the same accelerator platform present at export time
# (pass `platforms=("cpu", "tpu")` to target both). The reference has no
# equivalent: its deployment unit is a pickled torch module requiring the
# full class code at load.
#
# `freeze_params=True` (default) embeds the weights as constants — a fully
# self-contained artifact taking only (key[, y|context]) / (x[, ...]).
# `freeze_params=False` keeps the parameters as a runtime argument so a
# serving fleet can hot-swap refreshed weights into one artifact; they
# cross the artifact boundary as a flat leaf list — call with
# `fn(jax.tree_util.tree_leaves(params), ...)`.
# ---------------------------------------------------------------------------


def _export_graph(fn, params, specs, freeze_params: bool, platforms):
    from jax import export as jax_export

    kw = {"platforms": tuple(platforms)} if platforms is not None else {}
    if freeze_params:
        wrapped = lambda *args: fn(params, *args)
        exp = jax_export.export(jax.jit(wrapped), **kw)(*specs)
    else:
        # Module pytree nodes aren't registered for jax.export
        # serialization; cross the boundary as a FLAT LIST of leaves (the
        # caller rebuilds it with jax.tree_util.tree_leaves(params)).
        leaves, treedef = jax.tree_util.tree_flatten(params)
        leaf_specs = [jax.ShapeDtypeStruct(a.shape, a.dtype)
                      for a in leaves]

        def flat_fn(flat, *args):
            return fn(jax.tree_util.tree_unflatten(treedef, flat), *args)

        exp = jax_export.export(jax.jit(flat_fn), **kw)(leaf_specs, *specs)
    return bytes(exp.serialize())


def export_sampler(model, num_samples: int,
                   temperature: Optional[float] = None,
                   context_shape: Optional[Tuple[int, ...]] = None,
                   class_cond: bool = False, dtype=jnp.float32,
                   typed_key: bool = False, freeze_params: bool = True,
                   platforms: Optional[Tuple[str, ...]] = None) -> bytes:
    """Serialize ``sample`` to a StableHLO artifact (same argument surface
    as :func:`compile_sampler`); reload with :func:`load_exported`."""
    fn, params, specs = _sampler_graph(model, num_samples, temperature,
                                       context_shape, class_cond, dtype,
                                       typed_key)
    return _export_graph(fn, params, specs, freeze_params, platforms)


def export_log_prob(model, batch_shape: Tuple[int, ...],
                    context_shape: Optional[Tuple[int, ...]] = None,
                    class_cond: bool = False, dtype=jnp.float32,
                    freeze_params: bool = True,
                    platforms: Optional[Tuple[str, ...]] = None) -> bytes:
    """Serialize ``log_prob`` to a StableHLO artifact (same argument
    surface as :func:`compile_log_prob`)."""
    fn, params, specs = _log_prob_graph(model, batch_shape, context_shape,
                                        class_cond, dtype)
    return _export_graph(fn, params, specs, freeze_params, platforms)


class ExportedFn:
    """A reloaded StableHLO artifact, callable like the original function.

    ``__call__`` jit-compiles the embedded computation for the current
    backend on first use (cached thereafter). For ``freeze_params=False``
    artifacts, prepend the flat parameter leaf list
    (``jax.tree_util.tree_leaves(params)`` — same order as at export) to
    the call arguments.
    """

    def __init__(self, exported):
        self._exported = exported
        self._jitted = jax.jit(exported.call)

    @property
    def platforms(self) -> Tuple[str, ...]:
        return tuple(self._exported.platforms)

    @property
    def in_avals(self):
        return self._exported.in_avals

    def __call__(self, *args):
        return self._jitted(*args)


def load_exported(data) -> ExportedFn:
    """Deserialize an artifact from :func:`export_sampler` /
    :func:`export_log_prob` (``bytes`` or a file path)."""
    from jax import export as jax_export

    if not isinstance(data, (bytes, bytearray)):
        with open(data, "rb") as f:
            data = f.read()
    return ExportedFn(jax_export.deserialize(bytearray(data)))
