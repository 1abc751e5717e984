"""Self-intersection penalty: broad phase recall, filtering, gradients."""

import numpy as np
import jax
import jax.numpy as jnp

from smplifyx_tpu.ops.collision import (
    make_collision_fn, synthetic_part_segm, load_part_segm,
)


def two_triangles(depth):
    """A unit triangle in the z=0 plane and a second triangle piercing it:
    depth > 0 pushes two of the intruder's vertices `depth` below the plane
    (real intersection, overlapping AABBs); depth < 0 lifts the intruder
    fully above (no contact)."""
    tri1 = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    if depth >= 0:
        tri2 = np.array(
            [[0.3, 0.3, 0.02], [0.5, 0.3, -depth], [0.3, 0.5, -depth]],
            np.float32,
        )
    else:
        tri2 = np.array(
            [[0.3, 0.3, -depth + 0.02], [0.5, 0.3, -depth], [0.3, 0.5, -depth]],
            np.float32,
        )
    verts = np.concatenate([tri1, tri2])
    faces = np.array([[0, 1, 2], [3, 4, 5]], np.int32)
    return jnp.asarray(verts), jnp.asarray(faces)


class TestPenalty:
    def test_zero_when_far_apart(self):
        verts, faces = two_triangles(depth=-1.0)
        fn = make_collision_fn(faces, sigma=0.01, penalize_outside=False)
        assert float(jax.jit(fn)(verts)) == 0.0

    def test_positive_when_penetrating(self):
        verts, faces = two_triangles(depth=0.003)
        fn = make_collision_fn(faces, sigma=0.01, penalize_outside=False)
        assert float(jax.jit(fn)(verts)) > 0.0

    def test_deeper_penetration_costs_more(self):
        faces = two_triangles(0)[1]
        fn = make_collision_fn(faces, sigma=0.01, penalize_outside=False)
        jfn = jax.jit(fn)
        shallow = float(jfn(two_triangles(0.002)[0]))
        deep = float(jfn(two_triangles(0.008)[0]))
        assert deep > shallow > 0.0

    def test_gradient_repels(self):
        verts, faces = two_triangles(depth=0.003)
        fn = make_collision_fn(faces, sigma=0.01, penalize_outside=False)
        g = np.asarray(jax.jit(jax.grad(fn))(verts))
        assert np.isfinite(g).all()
        # Moving the intruding triangle deeper (-z) must increase the
        # penalty => the summed z-gradient on its vertices is negative.
        assert g[3:, 2].sum() < 0

    def test_broad_phase_is_stop_gradient(self):
        # Gradient exists even though sort/overlap aren't differentiable.
        verts, faces = two_triangles(depth=0.001)
        fn = make_collision_fn(faces, sigma=0.01)
        g = jax.jit(jax.grad(fn))(verts)
        assert np.isfinite(np.asarray(g)).all()


class TestPartFilter:
    def test_same_part_pairs_ignored(self):
        verts, faces = two_triangles(depth=0.003)
        segm = np.array([5, 5], np.int32)       # same part
        parents = np.array([1, 1], np.int32)
        fn = make_collision_fn(faces, segm=segm, parents=parents, sigma=0.01)
        assert float(jax.jit(fn)(verts)) == 0.0

    def test_parent_child_ignored(self):
        verts, faces = two_triangles(depth=0.003)
        segm = np.array([5, 7], np.int32)
        parents = np.array([2, 5], np.int32)    # part 7's parent is 5
        fn = make_collision_fn(faces, segm=segm, parents=parents, sigma=0.01)
        assert float(jax.jit(fn)(verts)) == 0.0

    def test_ignore_list(self):
        verts, faces = two_triangles(depth=0.003)
        segm = np.array([9, 16], np.int32)
        parents = np.array([1, 2], np.int32)
        fn = make_collision_fn(
            faces, segm=segm, parents=parents,
            ign_part_pairs=["9,16"], sigma=0.01,
        )
        assert float(jax.jit(fn)(verts)) == 0.0
        fn2 = make_collision_fn(
            faces, segm=segm, parents=parents,
            ign_part_pairs=["1,2"], sigma=0.01,
        )
        assert float(jax.jit(fn2)(verts)) > 0.0

    def test_part_segm_pickle_roundtrip(self, tmp_path):
        import pickle
        segm, parents = synthetic_part_segm(100, seed=1)
        p = tmp_path / "parts.pkl"
        with open(p, "wb") as f:
            pickle.dump({"segm": segm, "parents": parents}, f)
        s2, p2 = load_part_segm(str(p))
        np.testing.assert_array_equal(s2, segm)
        np.testing.assert_array_equal(p2, parents)


class TestBroadPhase:
    def test_finds_overlaps_regardless_of_face_order(self):
        rng = np.random.default_rng(0)
        # Many far-apart triangle pairs + one penetrating pair, shuffled.
        tris = []
        for i in range(30):
            base = np.array([3.0 * i, 0, 0], np.float32)
            tris.append(base + np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]],
                                        np.float32))
        # penetrating pair at slot 30/31
        t1 = np.array([[100, 0, 0], [101, 0, 0], [100, 1, 0]], np.float32)
        t2 = np.array(
            [[100.3, 0.3, 0.02], [100.5, 0.3, -0.005], [100.3, 0.5, -0.005]],
            np.float32,
        )
        tris += [t1, t2]
        tris = np.stack(tris)
        perm = rng.permutation(len(tris))
        tris = tris[perm]
        verts = tris.reshape(-1, 3)
        faces = np.arange(len(verts), dtype=np.int32).reshape(-1, 3)
        fn = make_collision_fn(jnp.asarray(faces), sigma=0.01,
                               penalize_outside=False, window=8)
        assert float(jax.jit(fn)(jnp.asarray(verts))) > 0.0

    def test_jit_and_vmap(self):
        verts, faces = two_triangles(depth=0.003)
        fn = make_collision_fn(faces, sigma=0.01)
        batch = jnp.stack([verts, verts + 10.0])
        vals = jax.jit(jax.vmap(fn))(batch)
        assert vals.shape == (2,)
        assert np.isfinite(np.asarray(vals)).all()


class TestPoint2Plane:
    def test_variant_runs_and_differs(self):
        """point2plane swaps the smooth conical falloff for a hard
        circumcircle gate + linear plane distance (reference
        DistanceFieldPenetrationLoss(point2plane=True), plumbed at
        fit_single_frame.py:93,314).  Same zero set, different magnitude."""
        verts, faces = two_triangles(0.15)
        cone = make_collision_fn(faces, max_pairs=8)
        p2p = make_collision_fn(faces, max_pairs=8, point2plane=True)
        c = float(jax.jit(cone)(verts))
        p = float(jax.jit(p2p)(verts))
        assert c > 0 and p > 0
        assert abs(c - p) > 1e-8  # genuinely different fields

    def test_zero_when_separated(self):
        verts, faces = two_triangles(-0.5)
        p2p = make_collision_fn(faces, max_pairs=8, point2plane=True)
        assert float(jax.jit(p2p)(verts)) == 0.0

    def test_gradient_flows(self):
        verts, faces = two_triangles(0.15)
        p2p = make_collision_fn(faces, max_pairs=8, point2plane=True)
        g = jax.jit(jax.grad(p2p))(verts)
        assert np.isfinite(np.asarray(g)).all()
        assert float(jnp.max(jnp.abs(g))) > 0


class TestSaturationReporting:
    def test_counts_under_budget_on_small_mesh(self):
        verts, faces = two_triangles(0.15)
        fn = make_collision_fn(faces, max_pairs=8)
        counts = fn.saturation(verts)
        for level, (count, budget) in counts.items():
            assert int(count) <= budget, level
        # the intersecting pair must be visible at the final level
        assert int(counts["final"][0]) >= 1

    def test_saturation_detects_tight_budget(self):
        """With a deliberately starved final budget the count reaches the
        budget — the silent-drop condition the helper exists to surface."""
        rng = np.random.default_rng(3)
        # a cluster of mutually-overlapping triangles
        base = rng.uniform(0, 0.3, size=(12, 3, 3)).astype(np.float32)
        verts = jnp.asarray(base.reshape(-1, 3))
        faces = jnp.asarray(np.arange(36, dtype=np.int32).reshape(12, 3))
        fn = make_collision_fn(faces, max_pairs=4)
        counts = fn.saturation(verts)
        count, budget = counts["final"]
        assert budget == 4
        # counts are PRE-compaction survivors, so saturation shows as
        # count >= budget (headroom requires count < budget)
        assert int(count) >= budget
