"""Self-intersection penalty: broad-phase AABB sweep + cone distance field.

TPU-native replacement for the reference's external CUDA torch-mesh-isect
stack (SURVEY.md §2 row 14: BVH broad phase -> DistanceFieldPenetrationLoss
-> FilterFaces, used at smplifyx/fitting.py:437-455 with the broad phase
under no_grad).  A pointer-chasing BVH is hostile to TPUs, so the broad
phase is re-designed as a sort-based sweep, which XLA compiles to dense
vector ops:

  1. per-triangle AABBs; sort triangles by AABB x-min (jnp.sort);
  2. each triangle tests the next `window` triangles in sorted order —
     exactly the candidates whose x-intervals can overlap — then filters by
     full AABB overlap (y/z) => a dense [F, window] candidate mask;
  3. part filtering drops pairs within the same body part, parent-child
     parts, and a configured ignore list (FilterFaces semantics, using the
     smplx_parts_segm data: {segm[F], parents[F]});
  4. a differentiable cone penetration field scores candidate pairs
     vertex-vs-triangle in both directions.

Gradient structure mirrors the reference: the candidate search (steps 1-3)
is wrapped in stop_gradient (reference: no_grad BVH, fitting.py:445-446);
only the cone field (step 4) is differentiated.

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


def _pair_part_mask(
    segm: jax.Array, parents: jax.Array, ign_pairs: Sequence[tuple[int, int]],
    idx_a: jax.Array, idx_b: jax.Array,
) -> jax.Array:
    """True where the pair SURVIVES filtering (FilterFaces semantics)."""
    sa, sb = segm[idx_a], segm[idx_b]
    pa, pb = parents[idx_a], parents[idx_b]
    drop = (sa == sb) | (pa == sb) | (pb == sa)
    for p, q in ign_pairs:
        drop |= ((sa == p) & (sb == q)) | ((sa == q) & (sb == p))
    return ~drop


def _cone_phi(
    points: jax.Array,      # [..., 3]
    centroid: jax.Array,    # [..., 3]
    normal: jax.Array,      # [..., 3] unit
    radius: jax.Array,      # [...]
    sigma: float,
    penalize_outside: bool,
) -> jax.Array:
    rel = points - centroid
    ax = jnp.sum(rel * normal, axis=-1)
    rad_vec = rel - ax[..., None] * normal
    # eps-safe norm: sqrt has a NaN gradient at exactly 0, which happens for
    # points on the cone axis (e.g. pairs of faces sharing a vertex).
    rad = jnp.sqrt(jnp.sum(rad_vec * rad_vec, axis=-1) + 1e-12)
    radial = jax.nn.relu(1.0 - rad / jnp.maximum(radius, 1e-9))
    inside = jax.nn.relu(-ax / sigma) * radial
    if penalize_outside:
        outside = jax.nn.relu(1.0 - ax / sigma) * radial
        return inside + outside
    return inside


def make_collision_fn(
    faces: jax.Array,                       # [F, 3] int
    segm: Optional[np.ndarray] = None,      # [F] part ids
    parents: Optional[np.ndarray] = None,   # [F] parent part ids
    ign_part_pairs: Sequence[str] = (),     # ["9,16", ...] reference format
    window: int = 32,
    sigma: float = 1e-4,
    penalize_outside: bool = True,
):
    """Build vertices [V,3] -> scalar penetration penalty.

    `window` plays the role of the reference's max_collisions budget: it
    bounds how many sorted neighbors each triangle may collide with.
    """
    ign = []
    for entry in ign_part_pairs:
        p, q = (int(v) for v in str(entry).split(","))
        ign.append((p, q))
    segm_j = jnp.asarray(segm) if segm is not None else None
    parents_j = jnp.asarray(parents) if parents is not None else None
    F = faces.shape[0]
    W = min(window, F - 1)

    def collision_penalty(vertices: jax.Array) -> jax.Array:
        tris = vertices[faces]                      # [F, 3, 3]

        # ---- broad phase (no gradients) --------------------------------
        tris_ng = jax.lax.stop_gradient(tris)
        aabb_min = jnp.min(tris_ng, axis=1)         # [F, 3]
        aabb_max = jnp.max(tris_ng, axis=1)
        order = jnp.argsort(aabb_min[:, 0])         # sweep along x
        idx_a = order[:, None]                                   # [F, 1]
        offs = jnp.arange(1, W + 1)[None, :]                     # [1, W]
        pos_b = jnp.arange(F)[:, None] + offs                    # [F, W]
        in_range = pos_b < F
        pos_b = jnp.minimum(pos_b, F - 1)
        idx_b = order[pos_b]                                     # [F, W]

        min_a, max_a = aabb_min[idx_a], aabb_max[idx_a]          # [F,1,3]
        min_b, max_b = aabb_min[idx_b], aabb_max[idx_b]          # [F,W,3]
        overlap = jnp.all(
            (min_b <= max_a) & (max_b >= min_a), axis=-1
        ) & in_range                                             # [F, W]

        if segm_j is not None:
            overlap &= _pair_part_mask(
                segm_j, parents_j, ign, idx_a, idx_b
            )

        # ---- narrow phase: differentiable cone field --------------------
        tri_a = tris[idx_a[:, 0]]                                # [F, 3, 3]
        tri_b = tris[idx_b]                                      # [F, W, 3, 3]

        def field_terms(tri_src, pts):
            # tri_src [..., 3, 3]; pts [..., P, 3]
            c = jnp.mean(tri_src, axis=-2)
            e1 = tri_src[..., 1, :] - tri_src[..., 0, :]
            e2 = tri_src[..., 2, :] - tri_src[..., 0, :]
            n = jnp.cross(e1, e2)
            n_norm = jnp.sqrt(jnp.sum(n * n, axis=-1, keepdims=True) + 1e-12)
            n = n / n_norm
            rv = tri_src - c[..., None, :]
            r = jnp.max(
                jnp.sqrt(jnp.sum(rv * rv, axis=-1) + 1e-12), axis=-1
            )
            phi = _cone_phi(
                pts, c[..., None, :], n[..., None, :], r[..., None],
                sigma, penalize_outside,
            )
            return jnp.sum(phi * phi, axis=-1)

        # B's vertices against A's cone and vice versa.
        pen_ab = field_terms(tri_a[:, None], tri_b)              # [F, W]
        pen_ba = field_terms(tri_b, tri_a[:, None].repeat(W, 1)) # [F, W]

        pen = (pen_ab + pen_ba) * overlap.astype(tris.dtype)
        return jnp.sum(pen)

    return collision_penalty
