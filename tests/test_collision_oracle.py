"""Exact-oracle audit of the collision broad phase at SMPL-X scale.

These tests build a ~21k-face posed-human proxy with real self-contacts
(smplifyx_tpu/utils/proxy_mesh.py), compute every AABB-overlapping pair
surviving part filtering with O(F^2) numpy, and assert the Morton-hierarchy
broad phase finds EXACTLY that set at the production budgets — plus a
budget-headroom audit at every hierarchy level (the hierarchy's failure
mode is budget saturation, not any window assumption; the legacy sweep's
`window` parameter is accepted and ignored for config compatibility).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from smplifyx_tpu.ops.collision import make_collision_fn
from smplifyx_tpu.utils.proxy_mesh import (
    build_posed_human, oracle_overlap_pairs,
)


def _pair_set(idx_a, idx_b, valid=None):
    if valid is not None:
        idx_a, idx_b = idx_a[valid], idx_b[valid]
    lo = np.minimum(idx_a, idx_b)
    hi = np.maximum(idx_a, idx_b)
    return set(zip(lo.tolist(), hi.tolist()))


class TestOracleSmall:
    """Fast version (~3.4k faces) that runs on every CI pass."""

    def test_sweep_equals_oracle(self):
        verts, faces, segm, parents = build_posed_human(scale_faces=0.2)
        oi, oj = oracle_overlap_pairs(verts, faces, segm, parents)
        assert len(oi) > 50, "proxy mesh lost its self-contacts"

        fn = make_collision_fn(
            jnp.asarray(faces), segm=segm, parents=parents,
            window=256, max_pairs=4096,
        )
        ia, ib, valid = jax.jit(fn.candidate_pairs)(jnp.asarray(verts))
        found = _pair_set(np.asarray(ia), np.asarray(ib), np.asarray(valid))
        oracle = _pair_set(oi, oj)
        missing = oracle - found
        spurious = found - oracle
        assert not missing, f"sweep lost {len(missing)} real pairs"
        assert not spurious, f"sweep invented {len(spurious)} pairs"

    def test_ignore_pairs_respected(self):
        verts, faces, segm, parents = build_posed_human(scale_faces=0.2)
        # forearm(4)-torso(1) contacts exist; ignoring the pair removes them
        oi, oj = oracle_overlap_pairs(
            verts, faces, segm, parents, ign_pairs=[(1, 4)]
        )
        assert not any(
            {segm[a], segm[b]} == {1, 4} for a, b in zip(oi, oj)
        )
        fn = make_collision_fn(
            jnp.asarray(faces), segm=segm, parents=parents,
            ign_part_pairs=["1,4"], window=256, max_pairs=4096,
        )
        ia, ib, valid = jax.jit(fn.candidate_pairs)(jnp.asarray(verts))
        found = _pair_set(np.asarray(ia), np.asarray(ib), np.asarray(valid))
        assert found == _pair_set(oi, oj)

    def test_penalty_positive_on_contacts_zero_when_separated(self):
        verts, faces, segm, parents = build_posed_human(scale_faces=0.2)
        fn = make_collision_fn(
            jnp.asarray(faces), segm=segm, parents=parents,
            window=256, max_pairs=4096, sigma=0.01, penalize_outside=False,
        )
        jfn = jax.jit(fn)
        assert float(jfn(jnp.asarray(verts))) > 0.0
        # Explode the parts apart -> nothing collides.
        exploded = verts + segm_offsets(verts, faces, segm)
        assert float(jfn(jnp.asarray(exploded))) == 0.0


def segm_offsets(verts, faces, segm):
    """Per-vertex offsets pushing each part 10 m along its own direction."""
    rng = np.random.default_rng(0)
    part_dir = {p: rng.normal(size=3) * 10.0 for p in np.unique(segm)}
    v_off = np.zeros_like(verts)
    for f_idx in range(len(faces)):
        for v_idx in faces[f_idx]:
            v_off[v_idx] = part_dir[int(segm[f_idx])]
    return v_off.astype(np.float32)


@pytest.mark.slow
class TestOracleFullScale:
    """SMPL-X-scale audit: F ~= 21k (the reference's 20,908-face workload)."""

    @pytest.fixture(scope="class")
    def mesh(self):
        return build_posed_human(scale_faces=1.25)

    def test_defaults_are_lossless(self, mesh):
        verts, faces, segm, parents = mesh
        assert 19000 < len(faces) < 23000
        oi, oj = oracle_overlap_pairs(verts, faces, segm, parents)
        assert len(oi) > 1000  # heavy self-contact scenario

        fn = make_collision_fn(
            jnp.asarray(faces), segm=segm, parents=parents,
        )  # production defaults: window=640, max_pairs=4096
        ia, ib, valid = jax.jit(fn.candidate_pairs)(jnp.asarray(verts))
        found = _pair_set(np.asarray(ia), np.asarray(ib), np.asarray(valid))
        oracle = _pair_set(oi, oj)
        missing = oracle - found
        assert not missing, f"sweep lost {len(missing)}/{len(oracle)} pairs"
        assert found == oracle
        # Budget margin: stay well below max_pairs.
        assert len(oracle) < 4096 * 0.75, len(oracle)

    def test_budget_headroom_at_every_level(self, mesh):
        """Measure surviving pair counts at each Morton-hierarchy level on
        the full-scale contact-heavy mesh and assert >= 2x headroom against
        the production budgets (the hierarchy's actual failure mode is
        budget saturation: _compact silently drops pairs past the budget).
        Replaces the deprecated sweep-window margin audit — the Morton
        broad phase has no window assumption."""
        verts, faces, segm, parents = mesh
        fn = make_collision_fn(
            jnp.asarray(faces), segm=segm, parents=parents,
        )  # production defaults
        counts = fn.saturation(jnp.asarray(verts))
        for level, (count, budget) in counts.items():
            count = int(count)
            assert count * 2 <= budget, (
                f"level {level!r}: {count} surviving pairs vs budget "
                f"{budget} — less than 2x headroom"
            )


@pytest.mark.slow
class TestUniqueNarrowEquivalence:
    """The two-level (unique-triangle) narrow phase routes identical corner
    VALUES through a dedup + remap; penalty and gradient must match the
    flat 6P-row gather bitwise when the triangle budget holds."""

    def test_apply_and_grad_match_flat(self, monkeypatch):
        verts, faces, segm, parents = build_posed_human(scale_faces=1.25)
        vj = jnp.asarray(verts)

        def build_fn():
            return make_collision_fn(
                jnp.asarray(faces), segm=segm, parents=parents)

        monkeypatch.setenv("SMPLIFYX_NARROW_UNIQ", "0")
        fn_flat = build_fn()
        monkeypatch.setenv("SMPLIFYX_NARROW_UNIQ", "1")
        fn_uniq = build_fn()

        aux_f = jax.jit(fn_flat.build)(vj)
        aux_u = jax.jit(fn_uniq.build)(vj)
        # saturation guard: the equivalence claim only holds under budget
        n_uniq, budget = fn_uniq.saturation(vj)["narrow_tris"]
        assert int(n_uniq) < budget, (int(n_uniq), budget)

        p_f, g_f = jax.jit(jax.value_and_grad(
            lambda v: fn_flat.apply(v, aux_f)))(vj)
        p_u, g_u = jax.jit(jax.value_and_grad(
            lambda v: fn_uniq.apply(v, aux_u)))(vj)
        assert float(p_f) > 0.0  # contact-heavy: non-trivial penalty
        np.testing.assert_array_equal(np.asarray(p_f), np.asarray(p_u))
        # Backward: same contributions, different ASSOCIATION (pair grads
        # fold into per-triangle rows before the vertex scatter), so
        # duplicate-heavy vertices see summation-order rounding only.
        np.testing.assert_allclose(np.asarray(g_f), np.asarray(g_u),
                                   rtol=1e-4, atol=1e-6)


class TestStaleOrderRefresh:
    """build_refresh reuses the previous Morton permutation (the pipeline
    persists it across broad-phase refreshes within a stage); the funnel
    must stay oracle-exact under a STALE order, since the superblock level
    is all-pairs and ordering only controls grouping tightness."""

    def test_refresh_with_stale_order_is_lossless(self):
        verts, faces, segm, parents = build_posed_human(scale_faces=0.2)
        fn = make_collision_fn(
            jnp.asarray(faces), segm=segm, parents=parents, max_pairs=4096,
        )
        aux0 = fn.build(jnp.asarray(verts))

        # Drift the pose the way ~one optimizer stage would: a smooth bend
        # + uniform translation, enough to change contacts and make the
        # old Morton order spatially stale.
        v2 = verts.copy()
        v2[:, 1] += 0.08 * np.sin(3.0 * verts[:, 2])
        v2[:, 0] += 0.05
        oi, oj = oracle_overlap_pairs(v2, faces, segm, parents)
        assert len(oi) > 20, "perturbed mesh lost its self-contacts"

        ia, ib, valid = fn.candidate_pairs(
            jnp.asarray(v2), order=aux0[3]
        )
        found = _pair_set(np.asarray(ia), np.asarray(ib), np.asarray(valid))
        oracle = _pair_set(oi, oj)
        assert found == oracle, (
            f"stale-order refresh lost {len(oracle - found)} / invented "
            f"{len(found - oracle)} pairs"
        )

    def test_build_refresh_matches_fresh_pairs_and_keeps_order(self):
        verts, faces, segm, parents = build_posed_human(scale_faces=0.2)
        fn = make_collision_fn(
            jnp.asarray(faces), segm=segm, parents=parents, max_pairs=4096,
        )
        aux0 = fn.build(jnp.asarray(verts))
        v2 = jnp.asarray(verts * 1.01 + 0.02)
        aux_r = fn.build_refresh(v2, aux0)
        np.testing.assert_array_equal(np.asarray(aux_r[3]),
                                      np.asarray(aux0[3]))
        # Same surviving corner set as a from-scratch funnel on the stale
        # order (build_refresh is exactly candidate_pairs(order=...)).
        ia, ib, valid = fn.candidate_pairs(v2, order=aux0[3])
        corners = jnp.concatenate([ia, ib])
        assert np.asarray(valid).sum() == np.asarray(aux_r[2]).sum()
