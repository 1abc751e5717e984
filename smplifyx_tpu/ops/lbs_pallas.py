"""Pallas TPU kernel: fused linear-blend-skinning.

The skinning step is the widest op in the SMPL-X forward: per batch element,
T = W @ A  ([V, J] @ [J, 16] on the MXU), followed by applying each vertex's
4x4 transform to its rest position (VPU).  XLA emits this as a matmul plus
several elementwise ops with [B, V, 4, 4] intermediates round-tripping
through HBM (~10475*16 floats per frame per eval); the Pallas kernel fuses
transform-blend and application in VMEM, writing only the final [tile, 3]
vertices.

Grid: (B, V / tile).  Per step: W-tile [tile, J] and the frame's A [J, 16]
feed one MXU matmul; the resulting per-vertex transforms are applied in
registers.  J=55 is padded to 64 lanes by the caller via weight/A padding.

Differentiable via jax.custom_vjp: the backward is expressed with plain XLA
einsums (dA = W^T @ dT, dv = R^T g), which XLA already fuses well — the
forward is the hot path (it runs inside every line-search evaluation).

Use `lbs_apply(..., use_pallas=True)` to opt in; the default XLA path is the
semantic reference and the CPU/interpret fallback.

MEASURED (v5e, B=64, V=10475): bit-exact vs XLA, but the current
(B, V/256) grid is 8.5x SLOWER than XLA's fused matmul (0.70 vs 5.96 ms) —
the per-step MXU work ([256,55]@[55,16]) is too small to amortize DMA.
Additionally, inside the fitting energy XLA fuses/eliminates unused vertex
work entirely (the data term only consumes ~70 extracted rows), which a
monolithic kernel would defeat.  Status: correct, opt-in, NOT in the hot
loop; a (V-tile, batched-A) regrid is the known fix if a vertex-
materializing hot path appears (e.g. collision-heavy schedules).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # TPU-only import; absent on CPU-only installs of older jaxlibs
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PLTPU = True
except Exception:  # pragma: no cover
    pltpu = None
    _HAS_PLTPU = False


def _lbs_reference(weights: jax.Array, A: jax.Array, v_posed: jax.Array):
    """XLA reference: weights [V, J], A [B, J, 16] (row-major 4x4),
    v_posed [B, V, 3] -> verts [B, V, 3]."""
    T = jnp.einsum("vj,bjk->bvk", weights, A)  # [B, V, 16]
    x, y, z = v_posed[..., 0], v_posed[..., 1], v_posed[..., 2]
    vx = T[..., 0] * x + T[..., 1] * y + T[..., 2] * z + T[..., 3]
    vy = T[..., 4] * x + T[..., 5] * y + T[..., 6] * z + T[..., 7]
    vz = T[..., 8] * x + T[..., 9] * y + T[..., 10] * z + T[..., 11]
    return jnp.stack([vx, vy, vz], axis=-1)


def _kernel(w_ref, a_ref, v_ref, out_ref):
    # Blocks keep their leading singleton batch dim:
    # w_ref: [TILE, J]; a_ref: [1, J, 16]; v_ref: [1, TILE, 3].
    T = jnp.dot(w_ref[:], a_ref[0], preferred_element_type=jnp.float32)
    v = v_ref[0]
    x, y, z = v[:, 0], v[:, 1], v[:, 2]
    vx = T[:, 0] * x + T[:, 1] * y + T[:, 2] * z + T[:, 3]
    vy = T[:, 4] * x + T[:, 5] * y + T[:, 6] * z + T[:, 7]
    vz = T[:, 8] * x + T[:, 9] * y + T[:, 10] * z + T[:, 11]
    out_ref[0] = jnp.stack([vx, vy, vz], axis=-1)


def _lbs_pallas_call(weights, A, v_posed, tile: int, interpret: bool):
    B, V, _ = v_posed.shape
    J = weights.shape[1]
    pad_v = (-V) % tile
    if pad_v:
        weights = jnp.pad(weights, ((0, pad_v), (0, 0)))
        v_posed = jnp.pad(v_posed, ((0, 0), (0, pad_v), (0, 0)))
    Vp = V + pad_v

    grid = (B, Vp // tile)
    out = pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((B, Vp, 3), v_posed.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile, J), lambda b, i: (i, 0)),
            pl.BlockSpec((1, J, 16), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, tile, 3), lambda b, i: (b, i, 0)),
        ],
        out_specs=pl.BlockSpec((1, tile, 3), lambda b, i: (b, i, 0)),
        interpret=interpret,
    )(weights, A, v_posed)
    return out[:, :V]


@partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def lbs_apply(weights, A, v_posed, use_pallas=False, interpret=False):
    """Fused LBS: weights [V, J], A [B, J, 16], v_posed [B, V, 3] -> [B, V, 3].

    weights is treated as a constant (no gradient) — it is model data.
    """
    if not use_pallas:
        return _lbs_reference(weights, A, v_posed)
    return _lbs_pallas_call(weights, A, v_posed, tile=256,
                            interpret=interpret)


def _fwd(weights, A, v_posed, use_pallas, interpret):
    out = lbs_apply(weights, A, v_posed, use_pallas, interpret)
    return out, (weights, A, v_posed)


def _bwd(use_pallas, interpret, res, g):
    weights, A, v_posed = res
    # Rebuild T (cheap matmul) rather than saving the [B, V, 16] residual.
    T = jnp.einsum("vj,bjk->bvk", weights, A)
    x, y, z = v_posed[..., 0], v_posed[..., 1], v_posed[..., 2]
    gx, gy, gz = g[..., 0], g[..., 1], g[..., 2]

    # dL/dT: rows of the 3x4 transform get outer products with (x,y,z,1).
    ones = jnp.ones_like(x)
    basis = jnp.stack([x, y, z, ones], axis=-1)          # [B, V, 4]
    dT = jnp.concatenate(
        [gx[..., None] * basis, gy[..., None] * basis, gz[..., None] * basis,
         jnp.zeros_like(basis)],
        axis=-1,
    )                                                     # [B, V, 16]
    dA = jnp.einsum("vj,bvk->bjk", weights, dT)
    # dL/dv = R^T g with R rows from T.
    dvx = T[..., 0] * gx + T[..., 4] * gy + T[..., 8] * gz
    dvy = T[..., 1] * gx + T[..., 5] * gy + T[..., 9] * gz
    dvz = T[..., 2] * gx + T[..., 6] * gy + T[..., 10] * gz
    dv = jnp.stack([dvx, dvy, dvz], axis=-1)
    return jnp.zeros_like(weights), dA, dv


lbs_apply.defvjp(_fwd, _bwd)
