"""Prebuilt model constructors for the reference's canonical configs
(BASELINE.json "configs"): Real NVP 2D, planar/radial VI stacks, NSF and
circular NSF, Glow multiscale, residual flows, SNF chains."""

from .builders import (
    build_circular_nsf,
    build_conditional_nsf,
    build_glow_multiscale,
    build_image_nsf,
    build_maf,
    build_nsf,
    build_planar_stack,
    build_radial_stack,
    build_realnvp,
    build_residual,
)
