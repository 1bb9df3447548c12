"""Log-space linear interpolation of two densities — HAIS annealing bridge
(reference ``normflows/distributions/linear_interpolation.py:1-27``)."""

from __future__ import annotations

from typing import Any

from ..utils.module import Module, static_field


class LinearInterpolation(Module):
    """``log_p = alpha * log_p1 + (1 - alpha) * log_p2``."""

    dist1: Any = None
    dist2: Any = None
    alpha: float = static_field(default=0.5)

    def log_prob(self, z, context=None):
        return (self.alpha * self.dist1.log_prob(z)
                + (1 - self.alpha) * self.dist2.log_prob(z))
