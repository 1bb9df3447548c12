"""Feature-reshaping flows: Split, Merge, Squeeze.

Capability parity with reference ``normflows/flows/reshape.py:9-128``.  The
reference implements the checkerboard split with boolean ``nonzero`` gathers —
dynamic-shape ops that are hostile to XLA.  Here the checkerboard is a static
parity pattern resolved at trace time into strided slices and ``where``
selects, which XLA fuses into pure data movement.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.module import static_field
from .base import Flow


def _leading_parity(shape_no_batch_no_last):
    """Parity of the index-sum over all non-batch, non-last axes (numpy,
    computed at trace time).  Shape: shape_no_batch_no_last + (1,)."""
    grids = np.indices(shape_no_batch_no_last)
    return grids.sum(axis=0) % 2  # 0-d zero when there are no leading axes


class Split(Flow):
    """Split features into two sets (reference ``reshape.py:9-84``).

    Modes: 'channel' (halve axis 1), 'channel_inv' (halves swapped),
    'checkerboard' / 'checkerboard_inv' (parity pattern over all non-batch
    axes, selecting along the last axis — which must be even).
    """

    mode: str = static_field(default="channel")

    def forward(self, z, context=None, key=None):
        if self.mode == "channel":
            # torch.chunk semantics: first chunk gets the extra channel when
            # the count is odd (reference ``reshape.py:31``)
            z1, z2 = jnp.split(z, [(z.shape[1] + 1) // 2], axis=1)
        elif self.mode == "channel_inv":
            z2, z1 = jnp.split(z, [(z.shape[1] + 1) // 2], axis=1)
        elif "checkerboard" in self.mode:
            # cb0[idx] = (sum of non-batch indices) % 2; z1 = entries where
            # cb == 1 (cb = cb0, or 1-cb0 for '_inv'), per reference semantics.
            s = _leading_parity(z.shape[1:-1])  # parity of leading idx sum
            s = jnp.asarray(s)[None, ..., None]  # (1, *lead, 1)
            even = z[..., 0::2]  # k even
            odd = z[..., 1::2]  # k odd
            if "inv" in self.mode:
                # z1 at positions k ≡ s (mod 2)
                z1 = jnp.where(s == 0, even, odd)
                z2 = jnp.where(s == 0, odd, even)
            else:
                # z1 at positions k ≡ 1-s (mod 2)
                z1 = jnp.where(s == 0, odd, even)
                z2 = jnp.where(s == 0, even, odd)
        else:
            raise NotImplementedError(f"Mode {self.mode} is not implemented.")
        return [z1, z2], 0.0

    def inverse(self, z, context=None, key=None):
        z1, z2 = z
        if self.mode == "channel":
            zc = jnp.concatenate([z1, z2], axis=1)
        elif self.mode == "channel_inv":
            zc = jnp.concatenate([z2, z1], axis=1)
        elif "checkerboard" in self.mode:
            s = _leading_parity(z1.shape[1:-1])
            s = jnp.asarray(s)[None, ..., None]
            # interleave: position k takes z1[k//2] where cb==1 else z2[k//2]
            z1r = jnp.repeat(z1, 2, axis=-1)
            z2r = jnp.repeat(z2, 2, axis=-1)
            L = z1r.shape[-1]
            k = jnp.arange(L).reshape((1,) * (z1r.ndim - 1) + (L,))
            if "inv" in self.mode:
                cb = (k % 2) == (s % 2)
            else:
                cb = (k % 2) == (1 - s % 2)
            zc = jnp.where(cb, z1r, z2r)
        else:
            raise NotImplementedError(f"Mode {self.mode} is not implemented.")
        return zc, 0.0


class Merge(Split):
    """Split with forward/inverse interchanged (reference ``reshape.py:87``)."""

    def forward(self, z, context=None, key=None):
        return super().inverse(z, context=context)

    def inverse(self, z, context=None, key=None):
        return super().forward(z, context=context)


class Squeeze(Flow):
    """2x2 space-to-channel squeeze for multiscale models
    (reference ``reshape.py:103-128``).  NCHW layout; the *inverse* direction
    is the squeeze (density evaluation runs inverse), matching the reference.
    """

    def forward(self, z, context=None, key=None):
        # channel-to-space: (B, 4C, H, W) -> (B, C, 2H, 2W)
        B, C4, H, W = z.shape
        z = z.reshape(B, C4 // 4, 2, 2, H, W)
        z = jnp.transpose(z, (0, 1, 4, 2, 5, 3))
        z = z.reshape(B, C4 // 4, 2 * H, 2 * W)
        return z, 0.0

    def inverse(self, z, context=None, key=None):
        # space-to-channel: (B, C, H, W) -> (B, 4C, H/2, W/2)
        B, C, H, W = z.shape
        z = z.reshape(B, C, H // 2, 2, W // 2, 2)
        z = jnp.transpose(z, (0, 1, 3, 5, 2, 4))
        z = z.reshape(B, 4 * C, H // 2, W // 2)
        return z, 0.0
