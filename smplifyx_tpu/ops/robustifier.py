"""Robust error functions.

gmof: the Geman-McClure robustifier used by the reprojection data term
(reference: smplifyx/utils.py:84-95).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def gmof(residual: jax.Array, rho: float | jax.Array) -> jax.Array:
    """Geman-McClure: rho^2 * r^2 / (r^2 + rho^2), elementwise."""
    sq = residual * residual
    rho_sq = jnp.asarray(rho, dtype=residual.dtype) ** 2
    return rho_sq * sq / (sq + rho_sq)
