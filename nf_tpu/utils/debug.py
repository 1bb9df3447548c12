"""Debug-mode numerical guards (SURVEY §5 "race detection / sanitizers").

The reference's closest analogues are runtime numerical guards: NaN-masking
of conditioner outputs (reference ``flows/affine/coupling.py:212-215``),
NaN/Inf loss skipping in training loops, the spline discriminant assertion
(``utils/splines.py:181``), and the fixed-point iteration cap. The compiled
equivalents here:

* the NaN guards / clamps live inside the layers (always on);
* :func:`checked` instruments a jittable function with ``jax.experimental
  .checkify`` NaN/div/OOB checks for debug runs;
* :func:`debug_nans` toggles global ``jax_debug_nans`` for development.
"""

from __future__ import annotations

import contextlib
import functools

import jax
from jax.experimental import checkify


def checked(fn, errors=None):
    """Wrap ``fn`` so calls return ``(value, error)`` with NaN / division /
    out-of-bounds checks compiled in (works under jit).

    >>> loss_fn = checked(lambda m, x: m.forward_kld(x))
    >>> value, err = loss_fn(model, batch)
    >>> err.throw()   # raises with location info if anything tripped
    """
    if errors is None:
        errors = checkify.float_checks | checkify.index_checks \
            | checkify.div_checks
    ck = checkify.checkify(fn, errors=errors)

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        err, out = ck(*args, **kwargs)
        return out, err

    return wrapper


@contextlib.contextmanager
def debug_nans(enable=True):
    """Context manager flipping ``jax_debug_nans`` (eager NaN tracebacks)."""
    prev = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", enable)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev)
