"""Pallas TPU kernel: fused linear-blend-skinning.

The skinning step is the widest op in the SMPL-X forward: per batch element,
T = W @ A  ([V, J] @ [J, 16] on the MXU), followed by applying each vertex's
4x4 transform to its rest position (VPU).  XLA materializes the [B, V, 16]
transform tensor in HBM between the matmul and the elementwise application
(~670 KB per frame per evaluation); this kernel keeps it in VMEM and writes
only the final [3, B, tile] vertex block.

Grid: (V / 512,), everything per-step resident in VMEM:

    T_t  =  A_r [16B, J]  @  W_T-tile [J, 512]      (one MXU matmul/step)
    out[k] = T_t[0::4-ish slices] * coords + translation rows  (VPU)

Layout choices are the whole game (learned from round-1's 8.5x-SLOWER
(B, V/256) grid, where per-step [256,55]@[55,16] matmuls could not amortize
DMA):
  * the batch lives INSIDE the matmul ([16B, J] left operand), so one grid
    step does the whole batch's tile at MXU-worthy shapes
    ([2048, 64] @ [64, 512] at B=128);
  * A is pre-arranged [16, B, J] -> [16B, J] and vertices [3, B, V] OUTSIDE
    the kernel (cheap XLA transposes), so every in-kernel slice is static
    and minor-dim-aligned — no in-kernel relayouts;
  * J pads to 64 lanes, V to a 512 multiple.

MEASURED (v5e, V=10475, J=55, f32, 20-rep steady state, including the
XLA-side relayouts on the Pallas path):

    B=64:  XLA einsum 3.24 ms  ->  Pallas 2.19 ms   (1.48x)
    B=128: XLA einsum 3.27 ms  ->  Pallas 2.37 ms   (1.38x)

bit-exact against the reference path (max abs err 0.0).  Round 1's
(B, V/256) grid measured 8.5x SLOWER than XLA — the regrid above is what
flipped it.  The XLA einsum remains the semantic baseline and the
CPU/interpret fallback.

Differentiable via jax.custom_vjp: the backward is expressed with plain XLA
einsums (dA = W^T @ dT, dv = R^T g), which XLA already fuses well — the
forward is the hot path (it runs inside every line-search evaluation of
collision-enabled stages).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

_TILE = 512


def _lbs_reference(weights: jax.Array, A: jax.Array, v_posed: jax.Array):
    """XLA reference: weights [V, J], A [B, J, 16] (row-major 4x4),
    v_posed [B, V, 3] -> verts [B, V, 3]."""
    T = jnp.einsum("vj,bjk->bvk", weights, A)  # [B, V, 16]
    x, y, z = v_posed[..., 0], v_posed[..., 1], v_posed[..., 2]
    vx = T[..., 0] * x + T[..., 1] * y + T[..., 2] * z + T[..., 3]
    vy = T[..., 4] * x + T[..., 5] * y + T[..., 6] * z + T[..., 7]
    vz = T[..., 8] * x + T[..., 9] * y + T[..., 10] * z + T[..., 11]
    return jnp.stack([vx, vy, vz], axis=-1)


def _kernel(a_ref, wt_ref, v_ref, out_ref, *, B: int):
    # a_ref: [16B, J] (k-major: row k*B+b holds A[b, :, k])
    # wt_ref: [J, TILE]; v_ref / out_ref: [3, B, TILE]
    T = jnp.dot(a_ref[:], wt_ref[:], preferred_element_type=jnp.float32)
    x = v_ref[0]                                   # [B, TILE]
    y = v_ref[1]
    z = v_ref[2]

    def row(k):                                    # [B, TILE] slice of T
        return T[k * B:(k + 1) * B, :]

    out_ref[0] = row(0) * x + row(1) * y + row(2) * z + row(3)
    out_ref[1] = row(4) * x + row(5) * y + row(6) * z + row(7)
    out_ref[2] = row(8) * x + row(9) * y + row(10) * z + row(11)


def _lbs_pallas_call(weights, A, v_posed, interpret: bool):
    B, V, _ = v_posed.shape
    J = weights.shape[1]
    pad_j = (-J) % 64
    pad_v = (-V) % _TILE
    if pad_j:
        weights = jnp.pad(weights, ((0, 0), (0, pad_j)))
        A = jnp.pad(A, ((0, 0), (0, pad_j), (0, 0)))
    if pad_v:
        weights = jnp.pad(weights, ((0, pad_v), (0, 0)))
        v_posed = jnp.pad(v_posed, ((0, 0), (0, pad_v), (0, 0)))
    Vp, Jp = V + pad_v, J + pad_j

    # Host-side (XLA) relayouts — cheap, fused transposes.
    wt = weights.T                                  # [Jp, Vp]
    a_r = jnp.transpose(A, (2, 0, 1)).reshape(16 * B, Jp)   # [16B, Jp]
    v_r = jnp.transpose(v_posed, (2, 0, 1))         # [3, B, Vp]

    out = pl.pallas_call(
        partial(_kernel, B=B),
        out_shape=jax.ShapeDtypeStruct((3, B, Vp), v_posed.dtype),
        grid=(Vp // _TILE,),
        in_specs=[
            pl.BlockSpec((16 * B, Jp), lambda i: (0, 0)),
            pl.BlockSpec((Jp, _TILE), lambda i: (0, i)),
            pl.BlockSpec((3, B, _TILE), lambda i: (0, 0, i)),
        ],
        out_specs=pl.BlockSpec((3, B, _TILE), lambda i: (0, 0, i)),
        interpret=interpret,
    )(a_r, wt, v_r)
    return jnp.transpose(out, (1, 2, 0))[:, :V]     # [B, V, 3]


@partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def lbs_apply(weights, A, v_posed, use_pallas=False, interpret=False):
    """Fused LBS: weights [V, J], A [B, J, 16], v_posed [B, V, 3] -> [B, V, 3].

    weights is treated as a constant (no gradient) — it is model data.
    use_pallas=True takes the VMEM-fused kernel above (TPU; set
    interpret=True on CPU), default is the XLA einsum reference.
    """
    if not use_pallas:
        return _lbs_reference(weights, A, v_posed)
    return _lbs_pallas_call(weights, A, v_posed, interpret=interpret)


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
