"""SMPL / SMPL-H family support: mappings, loaders, end-to-end fits.

VERDICT round-1 items 2 (no smplh joint mappings) and 3 (no smpl/smplh
artifact loaders).  Covers:
  * joint-mapping tables for ("smplh", coco25/coco19) and their agreement
    with the reference's smpl_to_annotation where layouts coincide;
  * `load_body_model` on synthetic artifacts written in the REAL field
    layouts (smplx npz with packed shape+expr dirs, smplh npz with hand PCA,
    smpl pkl with a sparse J_regressor);
  * an end-to-end staged fit per family on synthetic geometry.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from smplifyx_tpu.models.bodymodel import (
    load_body_model, synthetic_model,
    SMPL_PARENTS, SMPLH_PARENTS, SMPLX_PARENTS,
)
from smplifyx_tpu.models.forward import BodyParams, smplx_forward

from tests._jit import jit_forward
from smplifyx_tpu.models.joint_mapping import model_to_annotation


class TestSMPLHMapping:
    def test_tables_exist_and_are_permutations(self):
        for fmt, n_body in (("coco25", 25), ("coco19", 19)):
            m = model_to_annotation("smplh", True, False, False, fmt)
            assert len(m) == n_body + 42
            # hands index into 52 skeleton + 21 extras = [0, 73)
            assert m.min() >= 0 and m.max() < 73
            body = model_to_annotation("smplh", False, False, False, fmt)
            assert len(body) == n_body

    def test_smplh_coco25_matches_reference_table(self):
        """The canonical smplh layout coincides with the reference's, so the
        coco25 tables must agree exactly (utils.py:171-182)."""
        m = model_to_annotation("smplh", True, False, False, "coco25")
        ref = np.concatenate([
            [52, 12, 17, 19, 21, 16, 18, 20, 0, 2, 5, 8, 1, 4, 7,
             53, 54, 55, 56, 57, 58, 59, 60, 61, 62],
            [20, 34, 35, 36, 63, 22, 23, 24, 64, 25, 26, 27, 65,
             31, 32, 33, 66, 28, 29, 30, 67],
            [21, 49, 50, 51, 68, 37, 38, 39, 69, 40, 41, 42, 70,
             46, 47, 48, 71, 43, 44, 45, 72],
        ])
        np.testing.assert_array_equal(m, ref)

    def test_smplx_coco19_face_block_is_face(self):
        """Regression: face indices must point at the canonical face block
        (76+), not at fingertips (the reference's coco19 tables assume a
        feet-less model layout this framework doesn't use)."""
        m = model_to_annotation("smplx", True, True, False, "coco19")
        face = m[19 + 42:]
        assert face[0] == 76 and face[-1] == 126
        # hand fingertips stay in the canonical 66-75 range
        hands = m[19:19 + 42]
        tips = [v for v in hands if v >= 60]
        assert min(tips) >= 66 and max(tips) <= 75

    def test_forward_with_smplh_mapping(self):
        model = synthetic_model(num_verts=64, model_type="smplh", seed=1)
        jm = jnp.asarray(model_to_annotation("smplh", True, False, False,
                                             "coco25"))
        params = BodyParams.zeros(2).replace(
            body_pose=jnp.zeros((2, 63)),
        )
        out = jit_forward(model, params, joint_map=jm,
                            use_face_contour=False)
        assert out.joints.shape == (2, 67, 3)
        assert np.isfinite(np.asarray(out.joints)).all()


# ---------------------------------------------------------------------------
# Artifact loaders on synthetic files in the real layouts
# ---------------------------------------------------------------------------

def _write_smplx_npz(path, V=32, F=20):
    rng = np.random.default_rng(0)
    J = 55
    kintree = np.stack([SMPLX_PARENTS.astype(np.int64),
                        np.arange(J, dtype=np.int64)])
    kintree[0, 0] = 2**32 - 1  # the real artifact stores -1 as uint32 max
    np.savez(
        path,
        v_template=rng.normal(size=(V, 3)).astype(np.float64),
        shapedirs=rng.normal(size=(V, 3, 400)).astype(np.float64),  # 300+100
        posedirs=rng.normal(size=(V, 3, (J - 1) * 9)).astype(np.float64),
        J_regressor=rng.random((J, V)).astype(np.float64),
        weights=rng.random((V, J)).astype(np.float64),
        kintree_table=kintree,
        f=rng.integers(0, V, (F, 3)).astype(np.uint32),
        hands_componentsl=rng.normal(size=(45, 45)).astype(np.float64),
        hands_componentsr=rng.normal(size=(45, 45)).astype(np.float64),
        hands_meanl=rng.normal(size=45).astype(np.float64),
        hands_meanr=rng.normal(size=45).astype(np.float64),
        lmk_faces_idx=rng.integers(0, F, 51).astype(np.int64),
        lmk_bary_coords=rng.dirichlet(np.ones(3), 51).astype(np.float64),
        dynamic_lmk_faces_idx=rng.integers(0, F, (79, 17)).astype(np.int64),
        dynamic_lmk_bary_coords=rng.dirichlet(
            np.ones(3), (79, 17)).astype(np.float64),
    )


def _write_smplh_npz(path, V=32, F=20):
    rng = np.random.default_rng(1)
    J = 52
    kintree = np.stack([SMPLH_PARENTS.astype(np.int64),
                        np.arange(J, dtype=np.int64)])
    np.savez(
        path,
        v_template=rng.normal(size=(V, 3)).astype(np.float64),
        shapedirs=rng.normal(size=(V, 3, 16)).astype(np.float64),
        posedirs=rng.normal(size=(V, 3, (J - 1) * 9)).astype(np.float64),
        J_regressor=rng.random((J, V)).astype(np.float64),
        weights=rng.random((V, J)).astype(np.float64),
        kintree_table=kintree,
        f=rng.integers(0, V, (F, 3)).astype(np.uint32),
        hands_componentsl=rng.normal(size=(45, 45)).astype(np.float64),
        hands_componentsr=rng.normal(size=(45, 45)).astype(np.float64),
        hands_meanl=rng.normal(size=45).astype(np.float64),
        hands_meanr=rng.normal(size=45).astype(np.float64),
    )


def _write_smpl_pkl(path, V=32, F=20):
    import pickle

    rng = np.random.default_rng(2)
    J = 24
    kintree = np.stack([SMPL_PARENTS.astype(np.int64),
                        np.arange(J, dtype=np.int64)])
    J_reg = rng.random((J, V))
    try:  # the real artifact ships a scipy CSC matrix
        import scipy.sparse as sp

        J_reg = sp.csc_matrix(J_reg)
    except ImportError:
        pass
    d = dict(
        v_template=rng.normal(size=(V, 3)),
        shapedirs=rng.normal(size=(V, 3, 10)),
        posedirs=rng.normal(size=(V, 3, (J - 1) * 9)),
        J_regressor=J_reg,
        weights=rng.random((V, J)),
        kintree_table=kintree,
        f=rng.integers(0, V, (F, 3)).astype(np.uint32),
        bs_style=b"lbs",  # non-array fields must be skipped
    )
    with open(path, "wb") as f:
        pickle.dump(d, f)


class TestLoaders:
    def test_smplx_npz(self, tmp_path):
        p = str(tmp_path / "SMPLX_NEUTRAL.npz")
        _write_smplx_npz(p)
        m = load_body_model(p, "smplx", num_betas=10,
                            num_expression_coeffs=10, num_pca_comps=12)
        assert m.num_joints == 55 and m.num_verts == 32
        assert m.shapedirs.shape == (32, 3, 10)
        assert m.exprdirs.shape == (32, 3, 10)
        assert m.left_hand_components.shape == (12, 45)
        assert m.lmk_faces_idx.shape == (51,)
        assert m.parents[0] == -1
        out = jit_forward(m, BodyParams.zeros(1))
        assert out.joints.shape[1] == 55 + 21 + 51 + 17

    def test_smplh_npz(self, tmp_path):
        p = str(tmp_path / "SMPLH_MALE.npz")
        _write_smplh_npz(p)
        m = load_body_model(p, "smplh")
        assert m.num_joints == 52
        assert m.shapedirs.shape == (32, 3, 10)
        assert float(jnp.abs(m.exprdirs).sum()) == 0.0  # no expression space
        assert m.lmk_faces_idx.shape == (0,)
        out = jit_forward(m, BodyParams.zeros(1).replace(
            body_pose=jnp.zeros((1, 63))), use_face_contour=False)
        assert out.joints.shape[1] == 52 + 21

    def test_smpl_pkl(self, tmp_path):
        p = str(tmp_path / "SMPL_NEUTRAL.pkl")
        _write_smpl_pkl(p)
        m = load_body_model(p, "smpl")
        assert m.num_joints == 24
        assert m.extra_joint_vids.shape == (11,)
        out = jit_forward(m, BodyParams.zeros(1).replace(
            body_pose=jnp.zeros((1, 69))), use_face_contour=False)
        assert out.joints.shape[1] == 24 + 11
        assert np.isfinite(np.asarray(out.vertices)).all()


# ---------------------------------------------------------------------------
# End-to-end staged fit per family
# ---------------------------------------------------------------------------

def _fit_family(model_type, use_hands, fmt="coco25"):
    import jax

    from smplifyx_tpu.fitting.energy import FrameData
    from smplifyx_tpu.fitting.lbfgs import LBFGSConfig
    from smplifyx_tpu.fitting.params import FitSettings, pack
    from smplifyx_tpu.fitting.pipeline import FitOptions, fit_batch
    from smplifyx_tpu.fitting.stages import build_stage_schedule
    from smplifyx_tpu.ops.camera import CameraParams, project_points

    body_dof = 69 if model_type == "smpl" else 63
    model = synthetic_model(num_verts=64, model_type=model_type, seed=3)
    settings = FitSettings(
        use_hands=use_hands, use_face=False, use_face_contour=False,
        body_pose_dof=body_dof,
    )
    jm = jnp.asarray(
        model_to_annotation(model_type, use_hands, False, False, fmt)
    )
    K = jm.shape[0]
    B = 2

    rng = np.random.default_rng(0)
    gt = BodyParams.zeros(B).replace(
        body_pose=jnp.asarray(rng.normal(0, 0.1, (B, body_dof)), jnp.float32)
    )
    out = jit_forward(model, gt, joint_map=jm, use_face_contour=False)
    cam = CameraParams(
        rotation=jnp.broadcast_to(jnp.eye(3), (B, 3, 3)),
        translation=jnp.tile(jnp.asarray([[0.0, 0.0, 4.0]]), (B, 1)),
        focal=jnp.full((B, 2), 1000.0),
        center=jnp.broadcast_to(jnp.asarray([320.0, 240.0]), (B, 2)),
    )
    gt2d = project_points(cam, out.joints)

    frames = FrameData(
        gt_joints=gt2d, conf=jnp.ones((B, K)),
        joint_weights=jnp.ones((B, K)),
        focal=jnp.full((B, 2), 1000.0),
        center=jnp.broadcast_to(jnp.asarray([320.0, 240.0]), (B, 2)),
        data_weight=jnp.full((B,), 1000.0 / 480),
        init_joints_mask=jnp.asarray(
            np.isin(np.arange(K), [9, 12, 2, 5]).astype(np.float32)[None]
            .repeat(B, 0)
        ),
        trans_estimation=jnp.zeros((B, 3)),
        depth_loss_weight=jnp.full((B,), 1e2),
        regression_body=jnp.zeros((B, body_dof)),
    )
    x0 = pack(settings, cam_t=jnp.zeros((B, 3)),
              global_orient=jnp.zeros((B, 3)),
              body=jnp.zeros((B, body_dof)))
    schedule = build_stage_schedule(
        [4.04e2, 4.78], shape_weights=[1e2, 5.0], expr_weights=[1e2, 5.0],
        hand_pose_prior_weights=[1e2, 5.0], hand_joints_weights=[0.0, 1.0],
        face_joints_weights=[0.0, 0.0],
    )
    options = FitOptions(
        lbfgs=LBFGSConfig(max_iters=25, history=8, max_ls=10),
        camera_lbfgs=LBFGSConfig(max_iters=15, history=8, max_ls=10),
    )
    from smplifyx_tpu.models.sparse import build_joints_model

    joints_model = build_joints_model(model)
    res = jax.jit(
        lambda m, jmod, f, x: fit_batch(
            m, settings, options, schedule, f, x, lambda b: b, jm,
            edge_idxs=jnp.asarray([[5, 12], [2, 9]]), joints_model=jmod,
        )
    )(model, joints_model, frames, x0)
    loss = np.asarray(res.loss)
    assert loss.shape == (B,)
    assert np.isfinite(loss).all(), loss
    return res


@pytest.mark.slow
class TestFamilyFits:
    def test_smplh_end_to_end(self):
        _fit_family("smplh", use_hands=True)

    def test_smpl_end_to_end(self):
        _fit_family("smpl", use_hands=False)

    def test_smplx_end_to_end(self):
        _fit_family("smplx", use_hands=True)


class TestForeignSparseStubs:
    """Legacy .pkl artifacts may reference sparse classes from packages that
    are not installed; the tolerant unpickler rebuilds them from raw state.
    CSR and CSC pickle with IDENTICAL state keys, so the loader must branch
    on the recorded class name — a CSR rebuilt column-wise would come back
    TRANSPOSED (silently wrong joints).  Advisor r2 finding."""

    @staticmethod
    def _fake_sparse(dense, fmt):
        import scipy.sparse as sp

        real = (sp.csc_matrix if fmt == "csc" else sp.csr_matrix)(dense)

        class _Fake:
            pass

        _Fake.__name__ = _Fake.__qualname__ = f"{fmt}_matrix"
        _Fake.__module__ = "totally_missing_sparse_pkg"
        obj = _Fake()
        obj.__dict__.update(
            data=real.data, indices=real.indices, indptr=real.indptr,
            _shape=real.shape,
        )
        return obj

    def _roundtrip(self, obj, tmp_path):
        import pickle
        import sys
        import types

        from smplifyx_tpu.models.bodymodel import _read_artifact

        # Register the fake module only while DUMPING, so loading hits the
        # ImportError -> stub path like a real missing dependency.
        mod = types.ModuleType("totally_missing_sparse_pkg")
        setattr(mod, type(obj).__name__, type(obj))
        p = tmp_path / "m.pkl"
        sys.modules["totally_missing_sparse_pkg"] = mod
        try:
            with open(p, "wb") as f:
                pickle.dump({"M": obj}, f)
        finally:
            del sys.modules["totally_missing_sparse_pkg"]
        return _read_artifact(str(p))["M"]

    def test_csc_stub_roundtrip(self, tmp_path):
        dense = np.arange(12, dtype=np.float32).reshape(3, 4)
        out = self._roundtrip(self._fake_sparse(dense, "csc"), tmp_path)
        np.testing.assert_array_equal(out, dense)

    def test_csr_stub_roundtrip_not_transposed(self, tmp_path):
        dense = np.arange(12, dtype=np.float32).reshape(3, 4)
        out = self._roundtrip(self._fake_sparse(dense, "csr"), tmp_path)
        np.testing.assert_array_equal(out, dense)

    def test_unknown_sparse_class_fails_loudly(self, tmp_path):
        dense = np.eye(3, dtype=np.float32)
        obj = self._fake_sparse(dense, "csc")
        type(obj).__name__ = type(obj).__qualname__ = "bsr_matrix"
        with pytest.raises(ValueError, match="bsr"):
            self._roundtrip(obj, tmp_path)
