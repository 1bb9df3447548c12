"""Numeric kernels: the hot compute paths of the framework.

``splines`` — monotone rational-quadratic spline forward/inverse with fused
log-det (reference ``normflows/utils/splines.py``), written dense
(where-select, no boolean gathers) so XLA tiles it onto the VPU; a Pallas
TPU kernel provides the fused fast path.
"""

from .splines import (
    DEFAULT_MIN_BIN_HEIGHT,
    DEFAULT_MIN_BIN_WIDTH,
    DEFAULT_MIN_DERIVATIVE,
    rational_quadratic_spline,
    searchsorted,
    unconstrained_rational_quadratic_spline,
    unconstrained_rational_quadratic_spline_kmajor,
)
from .splines_pallas import (
    fused_unconstrained_rqs,
    fused_unconstrained_rqs_kmajor,
    set_pallas_bwd_enabled,
    set_pallas_bwd_kernel,
)
