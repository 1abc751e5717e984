"""Self-intersection penalty: sorted-AABB sweep + pair compaction + cone field.

TPU-native replacement for the reference's external CUDA torch-mesh-isect
stack (SURVEY.md §2 row 14: BVH broad phase -> DistanceFieldPenetrationLoss
-> FilterFaces, used at smplifyx/fitting.py:437-455 with the broad phase
under no_grad).  A pointer-chasing BVH is hostile to TPUs, so the broad
phase is re-designed around sorting and dense masks, and — new in round 2 —
the narrow phase runs on a COMPACTED fixed-size pair list, which decouples
its cost from the sweep window:

  1. per-triangle AABBs; pick the sweep axis as the mesh's largest-extent
     axis (for a human that is the height axis, which minimizes the sorted
     slab occupancy); sort triangles by AABB min along it;
  2. each triangle tests the next `window` triangles in sorted order — the
     only candidates whose sweep-axis intervals can overlap within the
     window — then filters by full 3-axis AABB overlap and by part
     (FilterFaces semantics: same part, parent part, configured ignore
     list, using the smplx_parts_segm schema {segm[F], parents[F]});
  3. surviving (i, j) pairs are compacted to a fixed budget `max_pairs`
     with a shape-static nonzero — the analog of the reference BVH's
     max_collisions cap (fit_single_frame.py:300-328, default 128 true
     intersections; the broad-phase superset needs a larger budget);
  4. a differentiable cone penetration field scores just those pairs,
     vertex-vs-triangle in both directions.

Gradient structure mirrors the reference: steps 1-3 carry no gradients
(reference: no_grad BVH); only the cone field (4) is differentiated, through
a [max_pairs, 9]-shaped gather of the live triangle coordinates.

Window/budget calibration (tests/test_collision_oracle.py measures this
against an exact all-pairs oracle on a ~21k-face posed-human proxy mesh with
real self-contacts): the minimal lossless window along the largest-extent
axis is ~500 and the surviving-pair count ~1.6k, so the defaults
window=640 / max_pairs=4096 carry ~30% / ~2.5x margins.  The oracle test
asserts the sweep finds EVERY surviving pair at those settings.

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
) -> jax.Array:
    """Symmetric cone-field penalty per pair -> [P]."""

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
        radial = jax.nn.relu(1.0 - rad / jnp.maximum(r[:, None], 1e-9))
        phi = jax.nn.relu(-ax / sigma) * radial
        if penalize_outside:
            phi = phi + jax.nn.relu(1.0 - ax / sigma) * radial
        return jnp.sum(phi * phi, axis=-1)            # [P]

    return one_way(ta, tb) + one_way(tb, ta)


_BLK = 8  # triangles per sweep block (two-level broad phase)


def make_collision_fn(
    faces: jax.Array,                       # [F, 3] int
    segm: Optional[np.ndarray] = None,      # [F] part ids
    parents: Optional[np.ndarray] = None,   # [F] parent part ids
    ign_part_pairs: Sequence[str] = (),     # ["9,16", ...] reference format
    window: int = 640,
    max_pairs: int = 4096,
    max_block_pairs: int = 49152,
    sigma: float = 1e-4,
    penalize_outside: bool = True,
):
    """Build vertices [V,3] -> scalar penetration penalty.

    `window` bounds how far apart (in sweep-sorted triangle rank) a
    colliding pair may be; `max_block_pairs` is the budget for surviving
    8-triangle block pairs and `max_pairs` the final narrow-phase budget
    (the analog of the reference's max_collisions).  All three are
    calibrated against an exact oracle in tests/test_collision_oracle.py
    (measured on a ~21k-face posed human: lossless window ~500, ~40k block
    pairs, ~1.6k final pairs); pairs beyond a budget are dropped silently,
    so keep the budgets above the expected counts.

    The two-level structure exists for the vmapped TPU energy: a flat
    [F, window] mask costs B x F x window entries per evaluation (OOM at
    production batch), while the block sweep is (window/8)x cheaper and the
    8x8 refinement touches only the compacted block pairs.

    The returned function exposes `.candidate_pairs(vertices)`
    -> (idx_a [P], idx_b [P], valid [P]) for tests/diagnostics.
    """
    ign = []
    for entry in ign_part_pairs:
        p, q = (int(v) for v in str(entry).split(","))
        ign.append((p, q))
    faces = jnp.asarray(faces)
    F = faces.shape[0]
    nb = -(-F // _BLK)
    Fp = nb * _BLK
    # Block reach covering triangle-rank distance `window` (+1 for the
    # block-boundary remainder); self-pairs (offset 0) refine the within-
    # block triangle pairs.
    Wb = min(window // _BLK + 1, nb - 1)
    Pb = min(max_block_pairs, nb * (Wb + 1))
    P = min(max_pairs, Pb * _BLK * _BLK)

    pad = Fp - F
    if segm is not None:
        # pad ids: distinct negatives so padding never matches anything
        segm_p = np.concatenate([np.asarray(segm, np.int32),
                                 np.full(pad, -1, np.int32)])
        parents_p = np.concatenate([np.asarray(parents, np.int32),
                                    np.full(pad, -3, np.int32)])
        segm_j = jnp.asarray(segm_p)
        parents_j = jnp.asarray(parents_p)
    else:
        segm_j = parents_j = None

    def candidate_pairs(vertices: jax.Array):
        """Broad phase: -> (idx_a [P], idx_b [P], valid [P] bool).  No
        gradients flow through any output."""
        tris = jax.lax.stop_gradient(vertices[faces])   # [F, 3, 3]
        aabb_min = jnp.min(tris, axis=1)                # [F, 3]
        aabb_max = jnp.max(tris, axis=1)

        # Sweep along the largest-extent axis (the height axis for a
        # standing/posed human): this minimizes how many triangles share a
        # slab of the sort key, i.e. the window a true pair can span.
        ext = jnp.max(aabb_max, axis=0) - jnp.min(aabb_min, axis=0)   # [3]
        axis = jnp.argmax(ext)
        key = aabb_min.T[axis]                          # [F] dynamic row
        order = jnp.argsort(key)

        big = jnp.asarray(1e30, aabb_min.dtype)
        amin_s = jnp.concatenate(
            [aabb_min[order], jnp.full((pad, 3), big)], axis=0)   # [Fp, 3]
        amax_s = jnp.concatenate(
            [aabb_max[order], jnp.full((pad, 3), -big)], axis=0)  # empty boxes

        # ---- level 1: block sweep ----------------------------------------
        bmin = amin_s.reshape(nb, _BLK, 3).min(axis=1)  # [nb, 3]
        bmax = amax_s.reshape(nb, _BLK, 3).max(axis=1)
        rowb = jnp.arange(nb)[:, None]
        offsb = jnp.arange(0, Wb + 1)[None, :]
        nbrb = rowb + offsb                             # [nb, Wb+1]
        okb = nbrb < nb
        nbrb_c = jnp.minimum(nbrb, nb - 1)
        maskb = okb
        for k in range(3):  # per-coordinate: keeps vmapped temps [*, nb, Wb]
            nb_min_k = bmin[:, k][nbrb_c]
            nb_max_k = bmax[:, k][nbrb_c]
            maskb &= (nb_min_k <= bmax[:, k][:, None]) \
                & (nb_max_k >= bmin[:, k][:, None])

        (posb,) = jnp.nonzero(maskb.reshape(-1), size=Pb, fill_value=0)
        validb = jnp.arange(Pb) < jnp.sum(maskb)
        bi = posb // (Wb + 1)
        bj = jnp.minimum(bi + posb % (Wb + 1), nb - 1)

        # ---- level 2: 8x8 triangle refinement per block pair -------------
        ra = bi[:, None] * _BLK + jnp.arange(_BLK)[None, :]   # [Pb, 8] ranks
        rb = bj[:, None] * _BLK + jnp.arange(_BLK)[None, :]
        m = validb[:, None, None] & (ra[:, :, None] < rb[:, None, :])
        for k in range(3):
            a_min_k = amin_s[:, k][ra]                  # [Pb, 8]
            a_max_k = amax_s[:, k][ra]
            b_min_k = amin_s[:, k][rb]
            b_max_k = amax_s[:, k][rb]
            m &= (b_min_k[:, None, :] <= a_max_k[:, :, None]) \
                & (b_max_k[:, None, :] >= a_min_k[:, :, None])

        if segm_j is not None:
            segm_s = segm_j[order]
            parents_s = parents_j[order]
            # padded ranks (>= F) must never pass the filter: their ids are
            # the pad sentinels, and pad AABBs are empty anyway.
            sa = segm_s[jnp.minimum(ra, F - 1)]
            pa = parents_s[jnp.minimum(ra, F - 1)]
            sb = segm_s[jnp.minimum(rb, F - 1)]
            pb = parents_s[jnp.minimum(rb, F - 1)]
            drop = (sa[:, :, None] == sb[:, None, :]) \
                | (pa[:, :, None] == sb[:, None, :]) \
                | (pb[:, None, :] == sa[:, :, None])
            for p, q in ign:
                drop |= ((sa[:, :, None] == p) & (sb[:, None, :] == q)) \
                    | ((sa[:, :, None] == q) & (sb[:, None, :] == p))
            m &= ~drop

        # ---- final compaction to the narrow-phase budget ------------------
        flat = m.reshape(-1)
        (pos,) = jnp.nonzero(flat, size=P, fill_value=0)
        valid = jnp.arange(P) < jnp.sum(flat)
        pi = pos // (_BLK * _BLK)
        w = pos % (_BLK * _BLK)
        ra_f = ra[pi, w // _BLK]
        rb_f = rb[pi, w % _BLK]
        # map sorted (padded) ranks back to original face ids
        idx_a = order[jnp.minimum(ra_f, F - 1)]
        idx_b = order[jnp.minimum(rb_f, F - 1)]
        return idx_a, idx_b, valid

    def collision_penalty(vertices: jax.Array) -> jax.Array:
        idx_a, idx_b, valid = candidate_pairs(vertices)
        tris = vertices[faces]                          # differentiable
        ta = tris[idx_a]                                # [P, 3, 3]
        tb = tris[idx_b]
        pen = _cone_penalty_pairs(ta, tb, sigma, penalize_outside)
        return jnp.sum(pen * valid.astype(pen.dtype))

    collision_penalty.candidate_pairs = candidate_pairs
    return collision_penalty
