"""Pallas TPU kernels: narrow-phase corner gather / scatter-add.

The collision term's hot ops are a [R]-row gather of triangle-corner
vertices (forward, every line-search evaluation) and its transpose
scatter-add (backward, every value_and_grad).  ops/collision.py already
routes both off the TPU's serial scalar core by rewriting them as two-level
one-hot matmul contractions — but at the XLA level the intermediate
one-hots and the [R, L*3] staging temp materialize in HBM
(~1.2 GB/dispatch at B=64, R=24576: tools/trace_egrad.py measured the
narrow-phase one-hot machinery at ~10 ms of the 14.3 ms collision-stage
evaluation).  These kernels run the same contractions with every
intermediate resident in VMEM, so HBM traffic drops to the essential
ids/values/output bytes.

Shapes (per batch lane; `jax.vmap` batches the kernels by prepending a
grid dimension):

    gather : table [V, C], ids [R]        -> rows [R, C]
    scatter: ids [R], values [R, C]       -> out [V, C] (sum-duplicates)

(C <= 14; the production widths are 3 — vertex xyz — and 9 — the
unique-triangle corner rows of the two-level narrow phase.)

Decomposition (same as collision.py's `_gather_rows_mm`/`_scatter_add_mm`):
id = hi * L + lo with L = 64, H = ceil(V / L).  Everything is laid out
transposed (rows of length R / TR-tiles in the LANE dimension) so the
kernel never relayouts:

    oh_hiT [H, TR]  = (iota_H == hi_row)          broadcast compare
    gather: tmpT [3L, TR] = vr3 [3L, H] @ oh_hiT   (MXU)
            outT [3, TR]  = sum_l tmpT[c*L+l] * oh_loT[l]   (VPU)
    scatter: ghatT [3L, TR] = oh_loT * g_rows      (VPU broadcast)
             acc [3L, H]  += ghatT @ oh_hiT^T      (MXU, NT-form)

f32 exactness at bf16 MXU speed: the MXU's native pass is bf16*bf16 with
f32 accumulation.  The one-hot operand is exactly representable in bf16;
the value operand is split into three bf16 parts whose f32 sum
reconstructs it EXACTLY (f32 has a 24-bit mantissa; two 8-bit bf16
mantissa "digits" leave a residual of <= 8 significant bits, itself exact
in bf16).  Three bf16 passes therefore reproduce the f32 one-hot
contraction exactly — the same trick XLA's Precision.HIGHEST uses with six
passes for general f32 matmuls (one-hot structure needs only the value
side split).

Reference behavior covered: torch-mesh-isect's collision response consumes
exactly these gathers/scatters inside its CUDA kernels (used at
smplifyx/fitting.py:437-455); see ops/collision.py for the broad-phase
context.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

_L = 64      # lo-level split width (one-hot select on the VPU)
_TR = 2048   # ids per grid step (width-3 kernels)
# Width-9 kernels (the unique-triangle remap in ops/collision.py: tables are
# [T, 9] corner-position rows) stack 3 digit planes x 9 columns = 27L rows
# of VMEM temps per grid step; a narrower step keeps them ~3 MB.
_TR9 = 1024


def _split3(x):
    """f32 -> three bf16 parts whose f32 sum is exactly x (see module doc)."""
    hi = x.astype(jnp.bfloat16)
    r1 = x - hi.astype(jnp.float32)
    mid = r1.astype(jnp.bfloat16)
    lo = (r1 - mid.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, mid, lo


def _gather_kernel(meta_ref, vr_ref, out_ref, *, H: int, L: int, C: int):
    # meta_ref [8, TR]: row 0 = hi (f32-exact ints), row 1 = lo
    # vr_ref [C*L, H]: vr[c*L + l, h] = table[h*L + l, c]
    # out_ref [R8, TR]: rows 0..C-1 = gathered columns (R8 = C padded to a
    # sublane multiple)
    # (An r5 experiment stacked the three digit planes into one
    # [3CL, H] x [H, TR] dot; it measured ~13% SLOWER than the three
    # dependent [CL, H] dots — the small-matmul pipeline was not the
    # bottleneck — so the 3-pass form stays.)
    f32 = jnp.float32
    tr = meta_ref.shape[1]
    out_rows = out_ref.shape[0]
    hi_row = meta_ref[0:1, :]                     # [1, TR]
    lo_row = meta_ref[1:2, :]
    oh_hiT = (jax.lax.broadcasted_iota(jnp.int32, (H, tr), 0).astype(f32)
              == hi_row).astype(jnp.bfloat16)    # [H, TR] exact in bf16
    tmpT = jnp.zeros((C * L, tr), f32)
    for part in _split3(vr_ref[:, :]):
        # precision pinned to DEFAULT: the operands are already bf16 (the
        # 3-digit split makes the result f32-exact), and a global
        # jax_default_matmul_precision=highest would otherwise stamp
        # fp32 contract precision on a bf16 matmul — which Mosaic rejects
        # ("Bad lhs type").
        tmpT += jax.lax.dot_general(
            part, oh_hiT, (((1,), (0,)), ((), ())),
            preferred_element_type=f32,
            precision=jax.lax.Precision.DEFAULT)
    oh_loT = (jax.lax.broadcasted_iota(jnp.int32, (L, tr), 0).astype(f32)
              == lo_row).astype(f32)             # [L, TR]
    rows = [jnp.sum(tmpT[c * L:(c + 1) * L, :] * oh_loT, axis=0,
                    keepdims=True) for c in range(C)]
    out_ref[0:C, :] = jnp.concatenate(rows, axis=0)
    out_ref[C:, :] = jnp.zeros((out_rows - C, tr), f32)


def _scatter_kernel(meta_ref, part_ref, *, H: int, L: int, C: int):
    # meta_ref [MR, TR]: rows 0/1 = hi/lo, rows 2..C+1 = g columns
    # part_ref [3L, H]: this grid step's partial sum (summed by the caller —
    # accumulating into one output via program_id-gated init would break
    # under vmap, which prepends a batch grid axis and renumbers the axes)
    # The contraction runs in NT form ([3L, TR] x [H, TR], contracting the
    # lane dim of both) — measured FASTER than building the one-hot in
    # [TR, H] orientation for an NN dot (9.6 ms vs 5.5 ms at B=64): the
    # sublane-broadcast compare that builds a [TR, H] one-hot is the
    # expensive form, not the dot's operand order.
    f32 = jnp.float32
    tr = meta_ref.shape[1]
    hi_row = meta_ref[0:1, :]
    lo_row = meta_ref[1:2, :]
    oh_hiT = (jax.lax.broadcasted_iota(jnp.int32, (H, tr), 0).astype(f32)
              == hi_row).astype(jnp.bfloat16)    # [H, TR]
    oh_loT = (jax.lax.broadcasted_iota(jnp.int32, (L, tr), 0).astype(f32)
              == lo_row).astype(jnp.bfloat16)    # [L, TR]

    # Split the SKINNY [3, TR] gradient rows into bf16 digits BEFORE the
    # [3L, TR] one-hot expansion (splitting the expanded tensor cost ~2 ms
    # of VPU time at B=64 — 64x the elements for the same information).
    # bf16 * bf16 one-hot keeps each digit exact; the three digit planes
    # stack on the ROW axis so the whole contraction is ONE NT-form MXU
    # dot per grid step (see the gather kernel's stacking note), folded
    # back with two f32 adds.
    ghat = jnp.concatenate(
        [oh_loT * part[c:c + 1, :]
         for part in _split3(meta_ref[2:2 + C, :])  # 3 x [C, TR] bf16
         for c in range(C)], axis=0)             # [3CL, TR]
    up = jax.lax.dot_general(
        ghat, oh_hiT, (((1,), (1,)), ((), ())),
        preferred_element_type=f32,
        precision=jax.lax.Precision.DEFAULT)      # see gather kernel note
    part_ref[0, :, :] = (up[0:C * L] + up[C * L:2 * C * L]
                         + up[2 * C * L:3 * C * L])


def _meta_rows(C: int) -> int:
    """Meta operand rows: hi + lo + C value rows, padded to a sublane
    multiple (8)."""
    return -(-(2 + C) // 8) * 8


def _prep_meta(ids: jax.Array, values: jax.Array | None, R: int, tr: int,
               C: int):
    """Pack hi/lo(/g columns) as f32 rows of one [MR, Rp] array (one compact
    row-major HBM operand; every value < 2^24 so f32 is exact)."""
    f32 = jnp.float32
    mr = _meta_rows(C)
    pad = (-R) % tr
    idp = jnp.pad(ids, (0, pad), constant_values=0)
    rows = [(idp // _L).astype(f32)[None, :], (idp % _L).astype(f32)[None, :]]
    if values is not None:
        gp = jnp.pad(values, ((0, pad), (0, 0)))
        rows.append(gp.T.astype(f32))            # [C, Rp]
    rows.append(jnp.zeros((mr - 2 - (0 if values is None else C), R + pad),
                          f32))
    return jnp.concatenate(rows, axis=0)         # [MR, Rp]


def gather_rows(table: jax.Array, ids: jax.Array,
                interpret: bool = False) -> jax.Array:
    """table [V, C] f32 (C <= 14), ids [R] int -> table[ids] [R, C].
    TPU Pallas."""
    V, C = table.shape
    tr = _TR if C <= 4 else _TR9
    R = ids.shape[0]
    H = -(-V // _L)
    Vp = H * _L
    pad = (-R) % tr
    Rp = R + pad
    mr = _meta_rows(C)
    out_rows = -(-C // 8) * 8
    meta = _prep_meta(ids, None, R, tr, C)
    # vr[c*L + l, h] = table[h*L + l, c]
    vr = jnp.pad(table, ((0, Vp - V), (0, 0))) \
        .reshape(H, _L, C).transpose(2, 1, 0).reshape(C * _L, H)
    outT = pl.pallas_call(
        partial(_gather_kernel, H=H, L=_L, C=C),
        out_shape=jax.ShapeDtypeStruct((out_rows, Rp), jnp.float32),
        grid=(Rp // tr,),
        in_specs=[
            pl.BlockSpec((mr, tr), lambda i: (0, i)),
            pl.BlockSpec((C * _L, H), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((out_rows, tr), lambda i: (0, i)),
        interpret=interpret,
    )(meta, vr)
    return outT[:C, :R].T                        # [R, C]


def scatter_add_rows(ids: jax.Array, values: jax.Array, num_rows: int,
                     interpret: bool = False) -> jax.Array:
    """sum-scatter values [R, C] f32 into [num_rows, C] at ids [R]."""
    R, C = values.shape
    tr = _TR if C <= 4 else _TR9
    H = -(-num_rows // _L)
    pad = (-R) % tr
    Rp = R + pad
    mr = _meta_rows(C)
    meta = _prep_meta(ids, values, R, tr, C)
    nR = Rp // tr
    parts = pl.pallas_call(
        partial(_scatter_kernel, H=H, L=_L, C=C),
        out_shape=jax.ShapeDtypeStruct((nR, C * _L, H), jnp.float32),
        grid=(nR,),
        in_specs=[pl.BlockSpec((mr, tr), lambda i: (0, i))],
        out_specs=pl.BlockSpec((1, C * _L, H), lambda i: (i, 0, 0)),
        interpret=interpret,
    )(meta)
    acc = jnp.sum(parts, axis=0)                 # [CL, H]
    # acc[c*L + l, h] = out[h*L + l, c]
    return acc.reshape(C, _L, H).transpose(2, 1, 0).reshape(H * _L, C)[:num_rows]
