"""Self-intersection penalty: Morton-block AABB hierarchy + cone field.

TPU-native replacement for the reference's external CUDA torch-mesh-isect
stack (SURVEY.md §2 row 14: BVH broad phase -> DistanceFieldPenetrationLoss
-> FilterFaces, used at smplifyx/fitting.py:437-455 with the broad phase
under no_grad).  A pointer-chasing BVH is hostile to TPUs, so the broad
phase is re-designed around Morton sorting, dense vectorized AABB masks,
and shape-static stream compaction (details in `make_collision_fn`):

  1. triangles sort by the Morton code of their AABB centroid — the flat,
     data-parallel analog of an LBVH build — yielding spatially tight
     8-triangle blocks and 64-triangle superblocks;
  2. candidates flow through a three-level funnel (superblock all-pairs ->
     block refinement -> triangle refinement with exact FilterFaces part
     filtering), each level compacted to a calibrated fixed budget — the
     analog of the reference BVH's max_collisions cap
     (fit_single_frame.py:300-328);
  3. a differentiable cone penetration field scores the surviving pairs,
     vertex-vs-triangle in both directions.

Gradient structure mirrors the reference: the broad phase carries no
gradients (reference: no_grad BVH); only the cone field is differentiated,
through a [max_pairs, 9]-shaped gather of the live triangle coordinates.
The `.build`/`.apply` split lets the optimizer reuse one broad-phase result
across a whole line search (see `make_collision_fn`).

Budget calibration (tests/test_collision_oracle.py measures this against an
exact all-pairs oracle on a ~21k-face posed-human proxy mesh with real
self-contacts): ~4.0k superblock pairs, ~2.0k hit-carrying superblock
pairs, ~0.4k hit-carrying block pairs, ~1.6k final pairs survive; the
defaults carry >= 2x margins and the oracle test asserts
the hierarchy finds EVERY surviving pair at those settings.

The cone field is a re-design, not a translation of the CUDA kernel: for a
vertex p against a triangle (centroid c, unit normal n, circumradius r),
with ax = (p - c) . n and rad the radial distance,

    phi(p) = relu(-ax / sigma) * relu(1 - rad / r)        [inside]
           (+ relu(1 - ax / sigma) * relu(1 - rad / r) when penalize_outside)

and the pair penalty is sum phi^2 over the six vertices of the pair.  It is
zero outside the cone, grows with penetration depth, and is scaled by the
same `df_cone_height` sigma and `coll_loss_weight` the reference exposes.
"""

from __future__ import annotations

import pickle
from typing import Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp


def load_part_segm(path: str) -> tuple[np.ndarray, np.ndarray]:
    """Load a parts-segmentation pickle {segm: [F], parents: [F]}
    (the schema of smplx_parts_segm.pkl consumed at
    fit_single_frame.py:317-328)."""
    with open(path, "rb") as f:
        d = pickle.load(f, encoding="latin1")
    return np.asarray(d["segm"], np.int32), np.asarray(d["parents"], np.int32)


def synthetic_part_segm(num_faces: int, num_parts: int = 27, seed: int = 0):
    """Random part segmentation with the same structure, for tests."""
    rng = np.random.default_rng(seed)
    segm = rng.integers(0, num_parts, size=num_faces).astype(np.int32)
    part_parent = rng.integers(0, num_parts, size=num_parts).astype(np.int32)
    parents = part_parent[segm]
    return segm, parents


def _cone_penalty_pairs(
    ta: jax.Array,            # [P, 3, 3] triangle A corners
    tb: jax.Array,            # [P, 3, 3] triangle B corners
    sigma: float,
    penalize_outside: bool,
    point2plane: bool = False,
) -> jax.Array:
    """Symmetric cone-field penalty per pair -> [P].

    point2plane selects the reference's point-to-plane distance variant
    (torch-mesh-isect DistanceFieldPenetrationLoss(point2plane=True), plumbed
    at fit_single_frame.py:93,314): the penalty is the raw signed plane
    distance of the penetrating vertex, hard-gated to the triangle's
    circumcircle, instead of the smooth conical falloff.  Same zero set,
    different magnitude/gradient profile."""

    def one_way(src, pts):
        c = src.mean(axis=1)                          # [P, 3]
        e1 = src[:, 1] - src[:, 0]
        e2 = src[:, 2] - src[:, 0]
        n = jnp.cross(e1, e2)
        n = n / jnp.sqrt(jnp.sum(n * n, axis=-1, keepdims=True) + 1e-12)
        # circumradius proxy: max corner distance from the centroid
        d2 = jnp.sum((src - c[:, None, :]) ** 2, axis=-1)  # [P, 3]
        r = jnp.sqrt(jnp.max(d2, axis=-1) + 1e-12)         # [P]

        rel = pts - c[:, None, :]                     # [P, 3, 3]
        ax = jnp.sum(rel * n[:, None, :], axis=-1)    # [P, 3]
        rad_vec = rel - ax[..., None] * n[:, None, :]
        # eps-safe norm: sqrt has a NaN gradient at exactly 0 (points on
        # the cone axis, e.g. pairs of faces sharing a vertex).
        rad = jnp.sqrt(jnp.sum(rad_vec * rad_vec, axis=-1) + 1e-12)
        if point2plane:
            # Hard radial gate (inside the circumcircle), linear plane
            # distance: stop_gradient on the gate so only the axial
            # distance carries gradients, as in the reference variant.
            inside = jax.lax.stop_gradient(
                (rad <= jnp.maximum(r[:, None], 1e-9)).astype(ax.dtype)
            )
            phi = jax.nn.relu(-ax / sigma) * inside
            if penalize_outside:
                phi = phi + jax.nn.relu(1.0 - ax / sigma) * inside
        else:
            radial = jax.nn.relu(1.0 - rad / jnp.maximum(r[:, None], 1e-9))
            phi = jax.nn.relu(-ax / sigma) * radial
            if penalize_outside:
                phi = phi + jax.nn.relu(1.0 - ax / sigma) * radial
        return jnp.sum(phi * phi, axis=-1)            # [P]

    return one_way(ta, tb) + one_way(tb, ta)


_BLK = 8  # triangles per block (broad-phase leaf)
_SUP = 8  # blocks per superblock

_SPLIT_L = 64   # hi/lo split for the one-hot matmul scatter (measured optimum)
_GATHER_L = 32  # split for the one-hot matmul gather (smaller: tmp-bound)


def _on_tpu() -> bool:
    """True when the default backend is a TPU (incl. the axon tunnel).

    The one-hot matmul gather/scatter below wins 1.6-6.2x on TPU, where
    native gather/scatter serialize on the scalar core — but on CPU the
    native ops are fast and the matmul form is pure overhead, so the
    custom-VJP path is TPU-only.
    """
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:
        return False


def _use_pallas_narrow() -> bool:
    """Gate for the Pallas narrow-phase kernels (ops/gather_pallas.py).

    The VMEM-resident kernels halve the one-hot contraction's device time
    again over the XLA form (profiler-measured at B=64, R=24576:
    gather 5.15 -> 2.60 ms, scatter 5.97 -> 2.82 ms), mostly by never
    materializing the one-hot / staging temps in HBM.  On by default on
    TPU; SMPLIFYX_PALLAS_NARROW=0 falls back to the XLA one-hot matmuls
    (same math, same custom VJP seam)."""
    import os

    if os.environ.get("SMPLIFYX_PALLAS_NARROW", "1") != "1":
        return False
    return _on_tpu()


def _use_uniq_narrow() -> bool:
    """Gate for the two-level (unique-triangle) narrow-phase gather.

    The pair list's 2*P triangle slots hold heavy DUPLICATION (a contact
    region's triangle appears in many pairs: 1548 surviving pairs on the
    oracle mesh touch ~low-hundreds of distinct triangles).  Gathering the
    corner positions of the <= max_tris UNIQUE triangles once per
    evaluation and remapping pairs against that small [T, 9] table cuts
    the one-hot contraction work ~2.2x at the production budgets
    (6P x V -> 3T x V + 2P x T x 3): the narrow gather was the single
    largest leaf cost of a collision stage (profiler: 2.47 ms/eval = 39%
    of the dispatch at B=64 before this).  Bit-exact — the gathered VALUES
    are identical, only the routing changes.  SMPLIFYX_NARROW_UNIQ=0
    restores the flat 6P-row gather."""
    import os

    return os.environ.get("SMPLIFYX_NARROW_UNIQ", "1") == "1"


def _split3f(x: jax.Array):
    """f32 -> three bf16 digits whose f32 sum reconstructs x EXACTLY
    (two 8-bit bf16 mantissa digits leave a residual of <= 8 significant
    bits, itself bf16-exact — the same trick as ops/gather_pallas.py).
    Lets a one-hot contraction against arbitrary f32 values run as three
    bf16 MXU passes with a bit-exact f32 result."""
    hi = x.astype(jnp.bfloat16)
    r1 = x - hi.astype(jnp.float32)
    mid = r1.astype(jnp.bfloat16)
    lo = (r1 - mid.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, mid, lo


def _oh_gather_small(table: jax.Array, ids: jax.Array) -> jax.Array:
    """table [N, W] f32, ids [R] int -> table[ids] [R, W] as ONE-LEVEL
    one-hot matmuls, for SMALL row counts (N up to a few thousand).

    The TPU's native row gather serializes on the scalar core at
    ~10 ns/row-lane regardless of width; a [R, N] bf16 one-hot against the
    broad-phase tables (N = 327 superblocks / 2614 blocks) turns the same
    fetch into MXU work measured ~5-10x cheaper at funnel scale.  Bit-exact
    via the 3-digit value split (`_split3f`); precision pinned DEFAULT
    because the operands are already bf16."""
    N, W = table.shape
    R = ids.shape[0]
    oh = (ids[:, None] == jnp.arange(N, dtype=ids.dtype)[None, :]).astype(
        jnp.bfloat16)                                   # [R, N] exact
    out = jnp.zeros((R, W), jnp.float32)
    for part in _split3f(table):
        out = out + jax.lax.dot(
            oh, part, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT)
    return out


def _gather_rows_mm(table: jax.Array, ids: jax.Array) -> jax.Array:
    """table [N, W] (W small), ids [R] int -> table[ids] [R, W] as matmuls.

    Same two-level trick as `_scatter_add_mm`, transposed: the hi-level
    one-hot contracts against the row-blocked table on the MXU, the
    lo-level one-hot selects within the block on the VPU.  Bit-exact
    (one-hot operand; the value side runs as three exact bf16 digits,
    `_split3f`) and measured 1.6x over the serial native gather at
    collision-apply scale even in its original f32-HIGHEST form
    (5.3 ms vs 8.3 ms for [32, 24576] rows from [10475, 3] on v5e).
    """
    L = _GATHER_L
    N, W = table.shape
    H = -(-N // L)
    R = ids.shape[0]
    hi = ids // L
    lo = ids % L
    f32 = jnp.float32
    oh_hi = (hi[:, None] == jnp.arange(H, dtype=ids.dtype)[None, :]).astype(
        jnp.bfloat16)
    oh_lo = (lo[:, None] == jnp.arange(L, dtype=ids.dtype)[None, :])
    vr = jnp.concatenate(
        [table, jnp.zeros((H * L - N, W), table.dtype)]).reshape(H, L * W)
    tmp = jnp.zeros((R, L * W), f32)
    for part in _split3f(vr):
        tmp = tmp + jax.lax.dot(
            oh_hi, part, preferred_element_type=f32,
            precision=jax.lax.Precision.DEFAULT)
    return jnp.sum(tmp.reshape(R, L, W) * oh_lo.astype(f32)[:, :, None],
                   axis=1)


def _scatter_add_mm(ids: jax.Array, g: jax.Array, num_rows: int) -> jax.Array:
    """sum-scatter g [R, W] into [num_rows, W] at ids [R] — as matmuls.

    A native TPU scatter-add executes on the SERIAL scalar core at ~41 ns
    per row-lane (B=32 x 24576 rows = 34.5 ms/dispatch measured on v5e).
    Rewriting it as a two-level one-hot contraction moves the work to the
    VPU/MXU: with id = hi * L + lo,

        tmp[r, lo*3 + c] = onehot_lo[r, lo] * g[r, c]      (VPU broadcast)
        out[hi, lo*3+c]  = sum_r onehot_hi[r, hi] * tmp    (MXU)

    Precision.HIGHEST on the contraction is mandatory AND free here: the
    default bf16 MXU pass rounds g to ~1e-2 relative error (unusable for
    gradients), while the f32 multi-pass path measures FASTER (5.5 ms vs
    7.3 ms) because the kernel is bandwidth-bound on tmp, not FLOP-bound.
    Measured 6.2x over the native scatter at collision-apply scale,
    max-abs-err 2e-6 vs the serial reference.
    """
    L = _SPLIT_L
    H = -(-num_rows // L)
    R, W = g.shape
    hi = ids // L
    lo = ids % L
    f32 = jnp.float32
    oh_lo = (lo[:, None] == jnp.arange(L, dtype=ids.dtype)[None, :])
    oh_hi = (hi[:, None] == jnp.arange(H, dtype=ids.dtype)[None, :])
    tmp = (oh_lo.astype(f32)[:, :, None] * g[:, None, :]).reshape(R, L * W)
    out = jnp.einsum(
        "rh,rf->hf", oh_hi.astype(f32), tmp,
        preferred_element_type=f32, precision=jax.lax.Precision.HIGHEST,
    )
    return out.reshape(H * L, W)[:num_rows]


def _make_corner_gather(num_verts: int):
    """vertices [V,3], va/vb [P,3] int -> (ta, tb) [P,3,3] with both
    directions routed off the serial scalar core: the forward gather runs
    through `_gather_rows_mm`, the cotangent scatter-add through
    `_scatter_add_mm`.  TPU-only (`_on_tpu`); elsewhere the native
    gather/scatter are already vectorized and faster."""
    use_mm = _on_tpu()
    use_pallas = _use_pallas_narrow()
    if use_pallas:
        from smplifyx_tpu.ops.gather_pallas import (gather_rows,
                                                    scatter_add_rows)

    @jax.custom_vjp
    def gather(vertices, va, vb):
        P = va.shape[0]
        if not use_mm:
            return vertices[va], vertices[vb]
        ids = jnp.concatenate([va.reshape(-1), vb.reshape(-1)])
        if use_pallas:
            rows = gather_rows(vertices, ids).reshape(2, P, 3, 3)
        else:
            rows = _gather_rows_mm(vertices, ids).reshape(2, P, 3, 3)
        return rows[0], rows[1]

    def fwd(vertices, va, vb):
        return gather(vertices, va, vb), (va, vb)

    def bwd(res, ct):
        va, vb = res
        gta, gtb = ct
        ids = jnp.concatenate([va.reshape(-1), vb.reshape(-1)])
        g = jnp.concatenate([gta.reshape(-1, 3), gtb.reshape(-1, 3)])
        if use_pallas:
            dv = scatter_add_rows(ids, g, num_verts)
        elif use_mm:
            dv = _scatter_add_mm(ids, g, num_verts)
        else:
            dv = jnp.zeros((num_verts, 3), g.dtype).at[ids].add(g)
        return dv, None, None

    gather.defvjp(fwd, bwd)
    return gather


def _make_pair_gather(num_verts: int):
    """Two-level narrow-phase corner fetch (the `_use_uniq_narrow` path).

    vertices [V,3], tri_corners [T,3] int (corner vertex ids of the UNIQUE
    surviving triangles), pa/pb [P] int (each pair side's index into that
    unique list) -> (ta, tb) [P,3,3].

    Level 1 gathers 3T corner positions from the full vertex table; level 2
    remaps the P pairs against the small [T, 9] per-triangle corner rows.
    Total one-hot work 3T*V + 2P*T*3 vs the flat form's 6P*V — ~2.2x less
    at the production budgets (P=4096, T=2048, V=10475).  The VJP runs the
    same two levels transposed (pair-grad scatter into [T, 9], then corner
    scatter into [V, 3]).  Values are routed bit-identically to the flat
    gather.  TPU-only (`_on_tpu`); elsewhere native indexing is faster."""
    use_mm = _on_tpu()
    use_pallas = _use_pallas_narrow()
    if use_pallas:
        from smplifyx_tpu.ops.gather_pallas import (gather_rows,
                                                    scatter_add_rows)

    @jax.custom_vjp
    def gather(vertices, tri_corners, pa, pb):
        T = tri_corners.shape[0]
        P = pa.shape[0]
        cids = tri_corners.reshape(-1)                  # [3T]
        pids = jnp.concatenate([pa, pb])                # [2P]
        if use_pallas:
            c9 = gather_rows(vertices, cids).reshape(T, 9)
            rows = gather_rows(c9, pids)                # [2P, 9]
        elif use_mm:
            c9 = _gather_rows_mm(vertices, cids).reshape(T, 9)
            rows = _gather_rows_mm(c9, pids)
        else:
            c9 = vertices[cids].reshape(T, 9)
            rows = c9[pids]
        rows = rows.reshape(2, P, 3, 3)
        return rows[0], rows[1]

    def fwd(vertices, tri_corners, pa, pb):
        return gather(vertices, tri_corners, pa, pb), (tri_corners, pa, pb)

    def bwd(res, ct):
        tri_corners, pa, pb = res
        T = tri_corners.shape[0]
        gta, gtb = ct
        gp = jnp.concatenate([gta.reshape(-1, 9), gtb.reshape(-1, 9)])
        pids = jnp.concatenate([pa, pb])
        cids = tri_corners.reshape(-1)
        if use_pallas:
            gc9 = scatter_add_rows(pids, gp, T)          # [T, 9]
            dv = scatter_add_rows(cids, gc9.reshape(-1, 3), num_verts)
        elif use_mm:
            gc9 = _scatter_add_mm(pids, gp, T)
            dv = _scatter_add_mm(cids, gc9.reshape(-1, 3), num_verts)
        else:
            gc9 = jnp.zeros((T, 9), gp.dtype).at[pids].add(gp)
            dv = jnp.zeros((num_verts, 3), gp.dtype) \
                .at[cids].add(gc9.reshape(-1, 3))
        return dv, None, None, None

    gather.defvjp(fwd, bwd)
    return gather


def _interleave3(x: jax.Array) -> jax.Array:
    """Spread each of the low 10 bits of x to every 3rd bit (Morton)."""
    x = (x | (x << 16)) & np.uint32(0x030000FF)
    x = (x | (x << 8)) & np.uint32(0x0300F00F)
    x = (x | (x << 4)) & np.uint32(0x030C30C3)
    x = (x | (x << 2)) & np.uint32(0x09249249)
    return x


def _compact(flat: jax.Array, size: int):
    """Shape-static stream compaction: indices of the first `size` True
    entries of `flat` (bool [N]) in order, plus a validity mask.

    top_k on index-ordered keys, NOT nonzero / cumsum+searchsorted /
    cumsum+scatter.  Profiler traces on v5e showed every random-access
    alternative lands on the TPU's SERIAL scalar core at ~4.6 ns per flat
    element per lane (232 ms for a [32, 1.57M] compaction): jnp.nonzero
    lowers to a full sort, a vmapped searchsorted becomes a while loop of
    serial gathers, and a destination-scatter serializes wholesale.
    lax.top_k is the one primitive with a vectorized TPU lowering for this
    access pattern (it powers MoE routing): keying True elements by
    descending N-idx sorts exactly the first `size` True positions to the
    front, in index order.
    """
    N = flat.shape[0]
    idx = jnp.arange(N, dtype=jnp.int32)
    key = jnp.where(flat, N - idx, -idx)
    vals, pos = jax.lax.top_k(key, size)
    valid = vals > 0
    return jnp.where(valid, pos, 0), valid


def make_collision_fn(
    faces: jax.Array,                       # [F, 3] int
    segm: Optional[np.ndarray] = None,      # [F] part ids
    parents: Optional[np.ndarray] = None,   # [F] parent part ids
    ign_part_pairs: Sequence[str] = (),     # ["9,16", ...] reference format
    window: int = 0,                        # deprecated, ignored (see below)
    max_pairs: int = 4096,
    # Oracle-measured survivors on the contact-heavy proxy mesh: ~4.0k
    # superblock, ~1.6k hit-carrying / final pairs; every default budget
    # keeps >= 2x headroom (asserted by test_collision_oracle's
    # budget-headroom audit).
    max_block_pairs: int = 0,               # deprecated, ignored (see below)
    max_sup_pairs: int = 8192,
    max_hit_sup_pairs: int = 4096,
    max_hit_pairs: int = 1024,
    max_tris: int = 2048,
    sigma: float = 1e-4,
    penalize_outside: bool = True,
    point2plane: bool = False,
):
    """Build vertices [V,3] -> scalar penetration penalty.

    Broad phase: a three-level Morton-sorted AABB hierarchy (the TPU-shaped
    analog of the reference's CUDA LBVH).  Triangles sort by the Morton code
    of their AABB centroid, giving spatially tight 8-triangle blocks and
    64-triangle superblocks; candidate generation is then

      0. superblock x superblock ALL-PAIRS AABB test (dense [ns, ns] mask,
         ns ~ F/64: ~110k lane-ops at SMPL-X scale) -> compact to
         `max_sup_pairs`;
      1. 8x8 block refinement on surviving superblock pairs, plus a
         conservative block-level part filter (blocks uniform in
         segm/parents drop exactly when every contained pair would drop);
         hit-carrying superblock pairs compact to `max_hit_sup_pairs`;
      2. triangle-hit detection at superblock-pair granularity (dense VPU
         math over each pair's 8x8x8x8 block/triangle slab, gated by the
         block mask — no block-pair expansion, see the in-body comment),
         hit-carrying BLOCK pairs compact to `max_hit_pairs`, their exact
         8x8 triangle masks (FilterFaces part test: same part, parent
         part, configured ignore list; schema of smplx_parts_segm.pkl)
         recompute and compact to `max_pairs`.

    `max_block_pairs` is accepted for call compatibility and ignored: the
    block-pair-list level it budgeted no longer exists (hit detection is
    exact for ANY count of surviving block pairs; only hit-CARRYING pairs
    are budgeted, by `max_hit_pairs`).

    Unlike the earlier sorted-axis sweep there is NO window assumption: the
    top level tests all superblock pairs, so the result is exact up to the
    (oracle-calibrated) budgets.  `window` is accepted for call
    compatibility and ignored.  Budgets measured on a ~21k-face posed,
    self-touching human (tests/test_collision_oracle.py): 3994 superblock
    pairs, 1966 hit-carrying superblock pairs, 385 hit-carrying block
    pairs, 1548 final pairs — the surviving budget knobs (`max_sup_pairs`,
    `max_hit_sup_pairs`, `max_hit_pairs`, `max_pairs`) all carry >= 2x
    margins (hit level: 2.7x at the r5 default of 1024, chosen because the
    final position top_k — the funnel's most expensive op — runs over
    [max_hit_pairs * 64] elements).  All compactions use the top_k-based `_compact` (see its
    docstring for why top_k and not cumsum/nonzero/scatter); every 8x8 pair
    mask is computed directly in flat [*, P, 64] layout and every packed
    table gather returns [*, P, C*8] — trailing-8 axes pad 14-64x under TPU
    (8,128)/(32,128) tiling, which is what previously capped
    collision-enabled batches at B=32 (see the level-1 layout comment).

    The returned callable exposes:
      .candidate_pairs(vertices) -> (idx_a [P], idx_b [P], valid [P])
      .build(vertices)           -> aux (corner ids va/vb [P,3] + valid;
         no gradients)
      .apply(vertices, aux)      -> penalty on a FIXED pair list, with a
         per-eval AABB recheck so separated pairs score zero.
    build/apply exist so the optimizer can refresh the broad phase once per
    L-BFGS iteration instead of in every line-search evaluation (the
    reference reruns its BVH every closure eval, but on TPU the sort +
    compaction dominate the collision term; see fitting/lbfgs.py aux_fn).
    fn(vertices) == fn.apply(vertices, fn.build(vertices)) is the exact
    per-eval path.
    """
    ign = []
    for entry in ign_part_pairs:
        p, q = (int(v) for v in str(entry).split(","))
        ign.append((p, q))
    faces = jnp.asarray(faces)
    faces_f = faces.astype(jnp.float32)   # vector-path gathers (see apply)
    F = faces.shape[0]
    nb = -(-F // _BLK)
    Fp = nb * _BLK
    ns = -(-nb // _SUP)
    nbp = ns * _SUP
    del max_block_pairs  # deprecated (see docstring)
    Ps = min(max_sup_pairs, ns * ns)
    Phs = min(max_hit_sup_pairs, Ps)
    Ph = min(max_hit_pairs, Phs * _SUP * _SUP)
    P = min(max_pairs, Ph * _BLK * _BLK)
    uniq_mode = _use_uniq_narrow()
    # unique-triangle budget: at most 2P slots can be distinct, and the
    # funnel's hit-block granularity bounds distinct triangles by the hit
    # blocks' 8-triangle contents.
    T = min(max_tris, 2 * P)

    pad = Fp - F
    spad = nbp - nb
    if segm is not None:
        # pad ids: distinct negatives so padding never matches anything.
        # f32 storage keeps the permutation gather on the vector path
        # (part ids are tiny, f32-exact).
        segm_p = np.concatenate([np.asarray(segm, np.float32),
                                 np.full(pad, -1, np.float32)])
        parents_p = np.concatenate([np.asarray(parents, np.float32),
                                    np.full(pad, -3, np.float32)])
        segm_j = jnp.asarray(segm_p)
        parents_j = jnp.asarray(parents_p)
    else:
        segm_j = parents_j = None

    def morton_order(vertices: jax.Array) -> jax.Array:
        """Morton rank of each triangle's AABB centroid -> permutation [F].

        Separated from the funnel so the (expensive, batched) argsort can
        be PERSISTED across broad-phase refreshes: the funnel below is
        exact up to its budgets under ANY permutation — the order only
        controls how spatially tight the 8/64-triangle groups are, so a
        slightly stale order costs survivor-count headroom, never missed
        pairs (see `build_refresh`)."""
        tris = jax.lax.stop_gradient(vertices[faces])   # [F, 3, 3]
        cent = 0.5 * (jnp.min(tris, axis=1) + jnp.max(tris, axis=1))
        lo = jnp.min(cent, axis=0)
        span = jnp.maximum(jnp.max(cent, axis=0) - lo, 1e-9)
        qc = jnp.clip((cent - lo) / span * 1023.0, 0.0, 1023.0)
        qi = qc.astype(jnp.uint32)
        code = (_interleave3(qi[:, 0])
                | (_interleave3(qi[:, 1]) << 1)
                | (_interleave3(qi[:, 2]) << 2))
        return jnp.argsort(code)

    # TPU-only routing of the funnel's row fetches onto the MXU as one-hot
    # contractions (`_oh_gather_small` / `_gather_rows_mm`): the native row
    # gather serializes on the scalar core at ~10 ns/row-lane, which at
    # B=64 made the id-chain and table fetches ~45% of every broad-phase
    # refresh.  On CPU the native gathers are vectorized and faster.
    _use_mm = _on_tpu()

    def _g_small(table, ids):
        return _oh_gather_small(table, ids) if _use_mm else table[ids]

    def _g_mm(table, ids):
        return _gather_rows_mm(table, ids) if _use_mm else table[ids]

    def candidate_pairs(vertices: jax.Array, return_counts: bool = False,
                        order: Optional[jax.Array] = None):
        """Broad phase: -> (idx_a [P], idx_b [P], valid [P] bool).  No
        gradients flow through any output.

        return_counts additionally returns {level: (surviving, budget)} so
        callers can check headroom: _compact keeps the first `budget` True
        entries in Morton-rank order, so an over-budget pose silently drops
        contact pairs — tests/benches should assert surviving < budget on
        their own meshes (see `saturation`).

        order: optional precomputed triangle permutation (see
        `morton_order`); default recomputes it at the given vertices."""
        if order is None:
            order = morton_order(vertices)
        out = _funnel(*_sorted_tables(vertices, order),
                      return_counts=return_counts)
        (ra_f, rb_f, validT), counts = out
        # map sorted (padded) ranks back to original face ids, one fetch
        fp32 = jnp.float32
        order_f = order.astype(fp32)
        rr = jnp.minimum(jnp.concatenate([ra_f, rb_f]), F - 1)
        oo = _g_mm(order_f[:, None],
                   rr.astype(jnp.int32))[:, 0].astype(jnp.int32)  # [2P]
        idx_a = oo[:P]
        idx_b = oo[P:]
        if return_counts:
            return (idx_a, idx_b, validT), counts
        return idx_a, idx_b, validT

    def _sorted_tables(vertices, order):
        """Sorted, padded funnel inputs (amin_s/amax_s [Fp, 3],
        segm_sp/parents_sp [Fp]) at the given Morton order.

        AABBs are computed on the CONSTANT face table and then permuted
        with ONE packed [F, 8] row gather: XLA lowers constant-index
        gathers onto the vector path, while gathering corners through
        runtime (per-lane) sorted face ids measured ~6x slower at B=64
        (~58 ms of serial gather machinery vs ~12 ms for
        constant-gather + packed permutation).  12+ separate per-field
        permutation gathers would likewise cost 12x the one packed fetch
        (gather cost is per ROW, ~10 ns/row-lane, width-insensitive)."""
        tris = jax.lax.stop_gradient(vertices[faces])   # [F, 3, 3]
        aabb_min = jnp.min(tris, axis=1)                # [F, 3]
        aabb_max = jnp.max(tris, axis=1)
        big = jnp.asarray(1e30, aabb_min.dtype)
        perm_cols = [aabb_min, aabb_max]                # [F, 3] x2
        if segm_j is not None:
            perm_cols += [jnp.broadcast_to(segm_j[:F, None], (F, 1)),
                          jnp.broadcast_to(parents_j[:F, None], (F, 1))]
        packed_s = jnp.concatenate(perm_cols, axis=1)[order]  # one gather
        amin_s = jnp.concatenate(
            [packed_s[:, 0:3], jnp.full((pad, 3), big)], axis=0)   # [Fp, 3]
        amax_s = jnp.concatenate(
            [packed_s[:, 3:6], jnp.full((pad, 3), -big)], axis=0)  # empty
        if segm_j is not None:
            segm_sp = jnp.concatenate([packed_s[:, 6], segm_j[F:]])  # [Fp]
            parents_sp = jnp.concatenate([packed_s[:, 7], parents_j[F:]])
        else:
            segm_sp = parents_sp = None
        return amin_s, amax_s, segm_sp, parents_sp

    def _funnel(amin_s, amax_s, segm_sp, parents_sp, return_counts=False):
        """Three-level compaction funnel over SORTED, PADDED tables
        (amin_s/amax_s [Fp, 3], segm_sp/parents_sp [Fp]) ->
        ((ra_f, rb_f [P] f32 triangle RANKS, valid [P] bool), counts).
        Ranks are in the sorted/padded index space; callers map them to
        face ids (`candidate_pairs`) or corner vertex ids (`build`)."""
        big = jnp.asarray(1e30, amin_s.dtype)
        bmin = amin_s.reshape(nb, _BLK, 3).min(axis=1)  # [nb, 3]
        bmax = amax_s.reshape(nb, _BLK, 3).max(axis=1)
        smin = jnp.concatenate(
            [bmin, jnp.full((spad, 3), big)], axis=0
        ).reshape(ns, _SUP, 3).min(axis=1)              # [ns, 3]
        smax = jnp.concatenate(
            [bmax, jnp.full((spad, 3), -big)], axis=0
        ).reshape(ns, _SUP, 3).max(axis=1)

        if segm_j is not None:
            sgb = segm_sp.reshape(nb, _BLK)
            prb = parents_sp.reshape(nb, _BLK)
            # Uniform = one part AND one parent across the block (pad
            # sentinels break uniformity, which is conservative).
            buni = (jnp.all(sgb == sgb[:, :1], axis=1)
                    & jnp.all(prb == prb[:, :1], axis=1))  # [nb]
            bseg = sgb[:, 0]
            bpar = prb[:, 0]

        def rel_drop(sa, pa, sb, pb):
            drop = (sa == sb) | (pa == sb) | (pb == sa)
            for p_, q_ in ign:
                drop |= ((sa == p_) & (sb == q_)) | ((sa == q_) & (sb == p_))
            return drop

        # ---- level 0: superblock all-pairs ------------------------------
        iu = jnp.arange(ns)
        ms = iu[:, None] <= iu[None, :]                 # [ns, ns] upper+diag
        for k in range(3):
            ms &= (smin[:, k][:, None] <= smax[:, k][None, :]) \
                & (smax[:, k][:, None] >= smin[:, k][None, :])
        posS, validS = _compact(ms.reshape(-1), Ps)
        si = posS // ns
        sj = posS % ns
        # f32 copies of every table that is later GATHERED: the TPU backend
        # routes s32/bool-OPERAND gathers through the serial scalar core
        # (profiled: the three index-chain gathers cost 330 ms/call at
        # B=32 vs ~1 ms vectorized); f32-operand gathers take the VPU
        # path, and every value here is < 2^24 so f32 is exact.
        fp32 = jnp.float32
        si_f = si.astype(fp32)
        sj_f = sj.astype(fp32)

        # ---- level 1: 8x8 block refinement ------------------------------
        # Every per-block column (AABB min/max xyz, uniformity, part,
        # parent) is PACKED into one [ns, C * _SUP] table so each side of a
        # superblock pair costs ONE row gather.  Gathers serialize on the
        # TPU scalar core at ~10 ns per ROW-lane with near-zero width
        # sensitivity, so 12+ separate [Ps, 8] gathers cost 12x one packed
        # [Ps, C*8] gather — packing levels 1-2 this way took the B=32
        # broad phase from 232 ms to 8.4 ms/lane (docs/ARCHITECTURE.md).
        #
        # LAYOUT: fields are laid out as contiguous 8-wide groups along the
        # LAST axis ([ns, C*8], field k at columns [k*8, (k+1)*8)), and every
        # 8x8 pair mask is computed directly in flat [N, 64] form (column
        # i*8+j = block i of side A vs block j of side B).  TPU tiles pad
        # the trailing two axes to (8, 128) for f32 and (32, 128) for bools:
        # a batched [B, N, 8, C] f32 gather output pads ~14x and a
        # [B, N, 8, 8] bool mask pads 64x — these temps were what capped
        # collision-enabled batches at B=32.  [B, N, C*8] f32 (<=1.8x pad)
        # and [B, N, 64] bool (2x pad) restore B=64/128 headroom with
        # bit-identical results (same flat survivor order).
        def _ea(v):
            """A-side expansion [N, 8] -> [N, 64]: col i*8+j -> v[:, i]."""
            return jnp.repeat(v, _SUP, axis=1)

        def _eb(v):
            """B-side expansion [N, 8] -> [N, 64]: col i*8+j -> v[:, j]."""
            return jnp.tile(v, (1, _SUP))

        def sup_rows(col):                              # [nb] -> [ns, _SUP]
            return jnp.concatenate(
                [col, jnp.full((spad,), col[-1])]).reshape(ns, _SUP)

        sup_cols = [sup_rows(bmin[:, k]) for k in range(3)] \
            + [sup_rows(bmax[:, k]) for k in range(3)]
        if segm_j is not None:
            sup_cols += [sup_rows(buni.astype(fp32)),
                         sup_rows(bseg.astype(fp32)),
                         sup_rows(bpar.astype(fp32))]
        sup_tab = jnp.concatenate(sup_cols, axis=1)     # [ns, C*8]

        def blk_mask(si_, sj_, valid_):
            """[N] superblock-pair ids -> [N, 64] surviving block-pair
            mask (AABB overlap, rank order, conservative uniform-part
            filter).  One packed row gather per pair side; flat col i*8+j
            pairs block i (A side) with block j (B side)."""
            ii = jnp.arange(_SUP * _SUP) // _SUP        # [64]
            jj = jnp.arange(_SUP * _SUP) % _SUP
            ba_ = si_[:, None] * _SUP + ii[None, :]     # [N, 64]
            bb_ = sj_[:, None] * _SUP + jj[None, :]
            m = valid_[:, None] & (ba_ <= bb_) & (ba_ < nb) & (bb_ < nb)
            A_ = _g_small(sup_tab, si_)                 # [N, C*8]
            B_ = _g_small(sup_tab, sj_)
            for k in range(3):
                m &= (_eb(B_[:, k * 8:(k + 1) * 8])
                      <= _ea(A_[:, (3 + k) * 8:(4 + k) * 8])) \
                    & (_eb(B_[:, (3 + k) * 8:(4 + k) * 8])
                       >= _ea(A_[:, k * 8:(k + 1) * 8]))
            if segm_j is not None:
                ua = _ea(A_[:, 48:56] > 0.5)            # [N, 64]
                ub = _eb(B_[:, 48:56] > 0.5)
                dropb = (ua & ub) & rel_drop(
                    _ea(A_[:, 56:64]), _ea(A_[:, 64:72]),
                    _eb(B_[:, 56:64]), _eb(B_[:, 64:72]),
                )
                m &= ~dropb
            return m

        mb = blk_mask(si, sj, validS)                   # [Ps, 64]

        # Two-stage compaction (same trick as the final level): superblock
        # pairs CARRYING a surviving block pair are far rarer than block
        # slots, so compact those rows first and recompute their 8x8 masks
        # — the expensive top_k then runs over [Phs * 64] instead of
        # [Ps * 64] elements (half the size at the defaults).
        hit_s = jnp.any(mb, axis=1)                     # [Ps]
        posHS, validHS = _compact(hit_s, Phs)
        sij = jnp.stack([si_f, sj_f], axis=-1)          # [Ps, 2]
        g_hs = _g_mm(sij, posHS)                        # [Phs, 2] one fetch
        si_h = g_hs[:, 0].astype(jnp.int32)
        sj_h = g_hs[:, 1].astype(jnp.int32)
        mb_h = blk_mask(si_h, sj_h, validHS)            # [Phs, 64]

        # ---- level 2: 8x8 triangle refinement ---------------------------
        # Same packing trick as level 1: one [nb, C*8] table, one row
        # gather per side per call (C=8 -> exactly 64 columns, no padding
        # within the tile beyond the 128-lane round-up).
        blk_cols = [amin_s[:, k].reshape(nb, _BLK) for k in range(3)] \
            + [amax_s[:, k].reshape(nb, _BLK) for k in range(3)]
        if segm_j is not None:
            blk_cols += [sgb.astype(fp32), prb.astype(fp32)]
        blk_tab = jnp.concatenate(blk_cols, axis=1)     # [nb, C*8]
        Cb = blk_tab.shape[1] // _BLK                   # fields per triangle

        # Superblock-granular copy of blk_tab: row s holds the full
        # triangle table of blocks s*8 .. s*8+7 ([ns, 8 * C*8]).  Pad
        # blocks get empty AABBs (+big/-big) and sentinel parts, so every
        # test against them is False without extra masking.
        empty_row = [big, big, big, -big, -big, -big]
        if segm_j is not None:
            empty_row += [jnp.asarray(-1.0), jnp.asarray(-3.0)]
        empty = jnp.concatenate(
            [jnp.full((_BLK,), v, blk_tab.dtype) for v in empty_row])
        blk_tab8 = jnp.concatenate(
            [blk_tab, jnp.tile(empty[None], (nbp - nb, 1))], axis=0
        ).reshape(ns, _SUP * Cb * _BLK)                 # [ns, 512]

        def tri_mask(bi_, bj_, valid_):
            """[N] block-pair ids -> [N, 64] surviving triangle-pair mask
            (AABB overlap, rank order, exact FilterFaces part test); flat
            col i*8+j pairs triangle rank i (A side) with rank j (B side)."""
            ii = jnp.arange(_BLK * _BLK) // _BLK        # [64]
            jj = jnp.arange(_BLK * _BLK) % _BLK
            ra_ = bi_[:, None] * _BLK + ii[None, :]     # [N, 64]
            rb_ = bj_[:, None] * _BLK + jj[None, :]
            m = valid_[:, None] & (ra_ < rb_)
            # native row gather: at the post-r5 Ph budget (1024 rows) the
            # scalar-core fetch is already cheaper than a [N, nb] one-hot
            A_ = blk_tab[bi_]                           # [N, C*8] one gather
            B_ = blk_tab[bj_]
            for k in range(3):
                m &= (_eb(B_[:, k * 8:(k + 1) * 8])
                      <= _ea(A_[:, (3 + k) * 8:(4 + k) * 8])) \
                    & (_eb(B_[:, (3 + k) * 8:(4 + k) * 8])
                       >= _ea(A_[:, k * 8:(k + 1) * 8]))
            if segm_j is not None:
                m &= ~rel_drop(
                    _ea(A_[:, 48:56]), _ea(A_[:, 56:64]),
                    _eb(B_[:, 48:56]), _eb(B_[:, 56:64]),
                )
            return m

        # ---- hit detection at SUPERBLOCK-pair granularity ----------------
        # Which block pairs carry >= 1 surviving triangle pair?  Computed
        # from TWO [Phs]-row gathers of the superblock-granular table
        # (contiguous 8-block rows), NOT by expanding to a block-pair list
        # first: the previous design compacted mb_h to a ~28k block-pair
        # budget and gathered blk_tab per pair side — 2 x 28k row-gathers
        # per lane, ~115 ms of the B=64 build on v5e (row gathers are
        # latency-bound on the TPU scalar core at ~10 ns/row-lane,
        # insensitive to row width, so 2 x 4k rows of 512 lanes beat
        # 2 x 28k rows of 64 lanes ~7x).  The per-pair tri tests become
        # dense VPU math over [Phs, 8j, 8ti, 8tj] slices, one slice per
        # A-side block (fuses into the any-reduction; ~3 ms of VPU work).
        A8 = _g_small(blk_tab8, si_h).reshape(Phs, _SUP, Cb, _BLK)
        B8 = _g_small(blk_tab8, sj_h).reshape(Phs, _SUP, Cb, _BLK)
        ti_r = jnp.arange(_BLK)
        hit_cols = []
        for i in range(_SUP):
            Ai = A8[:, i]                               # [Phs, C, 8ti]
            # gate: the block-level mask already encodes AABB overlap,
            # rank order, validity, and the conservative part filter
            m = mb_h[:, i * _SUP:(i + 1) * _SUP, None, None]
            ra = ((si_h[:, None] * _SUP + i) * _BLK)[:, :, None, None] \
                + ti_r[None, None, :, None]
            rb = ((sj_h[:, None] * _SUP
                   + jnp.arange(_SUP)[None, :]) * _BLK)[:, :, None, None] \
                + ti_r[None, None, None, :]
            m = m & (ra < rb)
            for k in range(3):
                m = m & (B8[:, :, k, None, :] <= Ai[:, None, 3 + k, :, None]) \
                    & (B8[:, :, 3 + k, None, :] >= Ai[:, None, k, :, None])
            if segm_j is not None:
                m = m & ~rel_drop(
                    Ai[:, None, Cb - 2, :, None], Ai[:, None, Cb - 1, :, None],
                    B8[:, :, Cb - 2, None, :], B8[:, :, Cb - 1, None, :],
                )
            hit_cols.append(jnp.any(m, axis=(2, 3)))    # [Phs, 8j]
        hit_bp = jnp.concatenate(hit_cols, axis=1)      # [Phs, 64] col i*8+j
        total_hits_bp = jnp.sum(hit_bp)

        # ---- final compaction to the narrow-phase budget ----------------
        # Compact the hit-carrying block pairs to `Ph` (lossless while the
        # mesh's hit-pair count <= Ph — asserted with margin by the
        # budget-headroom test), recompute their exact 8x8 masks, and run
        # the final top_k over [Ph * 64] only.
        #
        # TWO-STAGE: first compact the hit-CARRYING ROWS of hit_bp (there
        # are at most as many as hit block pairs, so the same Ph budget
        # bounds them losslessly), then run the flat position top_k over
        # [Ph * 64] instead of [Phs * 64].  At the defaults this shrinks
        # the funnel's single most expensive op — a [Phs*64 = 262144]-wide
        # batched sort — 4x, with a bit-identical survivor list (row-major
        # order is preserved when empty rows drop out).
        hit_f = hit_bp.astype(fp32)                     # f32: vector gather
        Phr = min(Ph, Phs)                              # rows <= Phs
        rowH, validRH = _compact(jnp.any(hit_bp, axis=1), Phr)
        hit_rows = (hit_f[rowH] > 0.5) & validRH[:, None]   # [Phr, 64]
        posH, validH = _compact(hit_rows.reshape(-1), Ph)
        pih2 = posH // (_SUP * _SUP)                    # index into rowH
        wbh = posH % (_SUP * _SUP)
        pih = _g_mm(rowH.astype(fp32)[:, None],
                    pih2)[:, 0].astype(jnp.int32)       # original row
        gh = _g_mm(g_hs, pih)                           # [Ph, 2] one fetch
        bi_h_f = jnp.minimum(
            gh[:, 0] * _SUP + (wbh // _SUP).astype(fp32), nb - 1)
        bj_h_f = jnp.minimum(
            gh[:, 1] * _SUP + (wbh % _SUP).astype(fp32), nb - 1)
        mt_h = tri_mask(bi_h_f.astype(jnp.int32), bj_h_f.astype(jnp.int32),
                        validH)                         # [Ph, 64]
        posT, validT = _compact(mt_h.reshape(-1), P)
        th = posT // (_BLK * _BLK)                      # index into Ph
        wt = posT % (_BLK * _BLK)
        gt = _g_mm(jnp.stack([bi_h_f, bj_h_f], axis=-1), th)  # [P, 2]
        ra_f = gt[:, 0] * _BLK + (wt // _BLK).astype(fp32)
        rb_f = gt[:, 1] * _BLK + (wt % _BLK).astype(fp32)
        counts = None
        if return_counts:
            counts = {
                "superblock": (jnp.sum(ms), Ps),
                "hit_superblock": (jnp.sum(hit_s), Phs),
                "hit": (total_hits_bp, Ph),
                "final": (jnp.sum(mt_h), P),
            }
        return (ra_f, rb_f, validT), counts

    def saturation(vertices: jax.Array):
        """Surviving-pair counts vs budgets at each hierarchy level:
        {level: (count, budget)}.  Any count == budget means _compact is
        silently dropping pairs for this pose — raise the corresponding
        max_*_pairs.  Debug/audit path (one extra broad-phase run).

        Includes 'narrow_tris' (distinct surviving triangles vs max_tris)
        when the unique-triangle narrow phase is active."""
        order = morton_order(vertices)
        sorted_pack = _sorted_pack_of(order)
        (ra_f, rb_f, valid), counts = _funnel(
            *_sorted_tables(vertices, order), return_counts=True)
        if uniq_mode:
            _, uc = _resolve_ranks(ra_f, rb_f, valid, order, sorted_pack,
                                   return_counts=True)
            counts = dict(counts)
            counts["narrow_tris"] = uc
        return counts

    def _sorted_pack_of(order):
        """Sorted corner-vertex-id table [F, 3] f32 for the rank->corner
        resolve (ONE row fetch, cached in the aux so neither refreshes nor
        resolves re-permute it)."""
        return _g_mm(faces_f, order) if _use_mm else faces_f[order]

    def _resolve_ranks(ra_f, rb_f, valid, order, sorted_pack,
                       return_counts=False):
        """Map surviving triangle RANKS to the narrow-phase aux (hoisted
        here so the per-line-search-eval path does no rank->corner work).

        Flat mode: corner vertex ids per pair slot, (va [P,3], vb [P,3],
        valid, order, sorted_pack).

        Unique mode (`_use_uniq_narrow`): deduplicate the 2P surviving
        ranks to <= T unique triangles — sort + adjacent-compare + the
        same top_k `_compact` as every funnel level — resolve corner ids
        ONCE per unique triangle, and store each pair side as an index
        into that list: (tri_corners [T,3], (pa, pb) [P] each, valid,
        order, sorted_pack).  A pose with more than T distinct contacting
        triangles drops the overflow pairs (valid &= matched) — same
        budget semantics as every other funnel level; audited by
        `saturation()['narrow_tris']`."""
        if not uniq_mode:
            rr = jnp.minimum(jnp.concatenate([ra_f, rb_f]), F - 1)
            vv = _g_mm(sorted_pack[:, :3], rr.astype(jnp.int32)) \
                .astype(jnp.int32)                      # [2P, 3]
            out = (vv[:P], vv[P:], valid,
                   order.astype(jnp.int32), sorted_pack)
            return (out, None) if return_counts else out
        fp32 = jnp.float32
        sentinel = fp32(Fp)  # sorts after every real rank
        ra_v = jnp.where(valid, ra_f, sentinel)
        rb_v = jnp.where(valid, rb_f, sentinel)
        s = jnp.sort(jnp.concatenate([ra_v, rb_v]))     # [2P]
        is_new = jnp.concatenate(
            [jnp.ones((1,), bool), s[1:] != s[:-1]]) & (s < sentinel)
        pos, uvalid = _compact(is_new, T)
        uniq = jnp.where(uvalid, _g_small(s[:, None], pos)[:, 0],
                         fp32(F - 1))                   # [T] ranks
        tri_corners = _g_mm(
            sorted_pack[:, :3],
            jnp.minimum(uniq, F - 1).astype(jnp.int32),
        ).astype(jnp.int32)                             # [T, 3]
        # pair side -> unique index: dense compare (VPU; [P, T] bools).
        # Ranks are f32-exact (< 2^24), so equality is exact.
        uniq_row = jnp.where(uvalid, uniq, fp32(-1.0))[None, :]

        def side_index(r):
            eq = r[:, None] == uniq_row                 # [P, T]
            idx = jnp.argmax(eq, axis=1).astype(jnp.int32)
            return idx, jnp.any(eq, axis=1)

        pa, ma = side_index(ra_f)
        pb, mb = side_index(rb_f)
        valid2 = valid & ma & mb
        out = (tri_corners, (pa, pb), valid2,
               order.astype(jnp.int32), sorted_pack)
        counts = (jnp.sum(is_new), T)
        return (out, counts) if return_counts else out

    def build(vertices: jax.Array):
        """Broad phase as reusable aux: the compacted pair list resolved to
        corner VERTEX ids (va/vb [P, 3]), the Morton permutation (4th
        element), and the sorted corner/part tables (5th) — so
        `build_refresh` re-runs the funnel WITHOUT the batched argsort (the
        single most expensive broad-phase op) and WITHOUT the packed
        permutation gather."""
        order = morton_order(vertices)
        sorted_pack = _sorted_pack_of(order)
        (ra_f, rb_f, valid), _ = _funnel(*_sorted_tables(vertices, order))
        return _resolve_ranks(ra_f, rb_f, valid, order, sorted_pack)

    def build_refresh(vertices: jax.Array, aux):
        """Broad-phase refresh that REUSES the previous aux's Morton order
        (and sorted tables) instead of re-sorting.  The funnel's superblock
        level is all-pairs, so the result is exact up to the budgets for
        ANY order; a stale order only loosens the 8/64-triangle groupings
        (poses drift slowly within a stage), trading survivor-count
        headroom for skipping the argsort on every refresh.  Re-sorting
        happens wherever `build` is called — in the staged pipeline, once
        per collision stage."""
        order, sorted_pack = aux[3], aux[4]
        (ra_f, rb_f, valid), _ = _funnel(*_sorted_tables(vertices, order))
        return _resolve_ranks(ra_f, rb_f, valid, order, sorted_pack)

    def apply(vertices: jax.Array, aux) -> jax.Array:
        """Cone penalty on a fixed pair list; differentiable in vertices.

        Pairs are rechecked for AABB overlap at the CURRENT vertices so a
        stale list (refreshed once per optimizer iteration) never penalizes
        pairs that have separated since the refresh."""
        valid = aux[2]
        # Corner gather with a custom VJP: on TPU the forward gather runs
        # as one-hot matmuls (vs the serial native gather) and the backward
        # scatter-add as their transpose; the unique-triangle mode routes
        # both through the two-level form (see _make_pair_gather).
        if uniq_mode:
            tri_corners, (pa, pb) = aux[0], aux[1]
            ta, tb = _make_pair_gather(vertices.shape[0])(
                vertices, tri_corners, pa, pb)          # [P, 3, 3]
        else:
            va, vb = aux[0], aux[1]
            ta, tb = _make_corner_gather(vertices.shape[0])(
                vertices, va, vb)                       # [P, 3, 3]
        ta_s = jax.lax.stop_gradient(ta)
        tb_s = jax.lax.stop_gradient(tb)
        live = valid
        for k in range(3):
            live &= (tb_s[..., k].min(-1) <= ta_s[..., k].max(-1)) \
                & (tb_s[..., k].max(-1) >= ta_s[..., k].min(-1))
        pen = _cone_penalty_pairs(ta, tb, sigma, penalize_outside,
                                  point2plane=point2plane)
        return jnp.sum(pen * live.astype(pen.dtype))

    def collision_penalty(vertices: jax.Array) -> jax.Array:
        return apply(vertices, build(vertices))

    collision_penalty.candidate_pairs = candidate_pairs
    collision_penalty.morton_order = morton_order
    collision_penalty.build = build
    collision_penalty.build_refresh = build_refresh
    collision_penalty.apply = apply
    collision_penalty.saturation = saturation
    return collision_penalty
