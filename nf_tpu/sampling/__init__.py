"""Sampling algorithms (reference ``normflows/sampling/``)."""

from .hais import HAIS
