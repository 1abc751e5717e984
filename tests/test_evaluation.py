"""Metrics + EHF protocol: golden alignment checks and a synthetic
end-to-end evaluation where the true errors are known by construction."""

import os.path as osp
import pickle

import numpy as np
import jax.numpy as jnp
import pytest

from smplifyx_tpu.evaluation.metrics import (
    procrustes_align, scale_align, pelvis_align, mpjpe, procrustes_v2v,
    point_fscore,
)
from smplifyx_tpu.evaluation.ehf import (
    evaluate_frame, evaluate_ehf, synthetic_part_vertex_ids,
    visible_indices, load_mesh_tree,
)
from smplifyx_tpu.ops.camera import ehf_gt_camera, project_points
from smplifyx_tpu.utils.io import write_ply


def random_rigid(rng, scale=True):
    from smplifyx_tpu.ops.rotation import batch_rodrigues
    aa = rng.normal(size=3).astype(np.float32)
    R = np.asarray(batch_rodrigues(jnp.asarray(aa[None])))[0]
    s = rng.uniform(0.5, 2.0) if scale else 1.0
    t = rng.normal(size=3).astype(np.float32)
    return s, R, t


class TestProcrustes:
    def test_undoes_similarity_transform(self):
        rng = np.random.default_rng(0)
        X = rng.normal(size=(50, 3)).astype(np.float32)
        s, R, t = random_rigid(rng)
        Y = (s * (X @ R.T) + t).astype(np.float32)
        aligned = np.asarray(procrustes_align(jnp.asarray(Y), jnp.asarray(X)))
        np.testing.assert_allclose(aligned, X, atol=1e-4)

    def test_batched(self):
        rng = np.random.default_rng(1)
        X = rng.normal(size=(4, 30, 3)).astype(np.float32)
        s, R, t = random_rigid(rng)
        Y = (s * (X @ R.T) + t).astype(np.float32)
        err = np.asarray(procrustes_v2v(jnp.asarray(Y), jnp.asarray(X)))
        assert err.shape == (4, 30)
        assert err.max() < 1e-3

    def test_reflection_not_allowed(self):
        rng = np.random.default_rng(2)
        X = rng.normal(size=(20, 3)).astype(np.float32)
        Y = X.copy()
        Y[:, 0] *= -1  # mirrored
        aligned = np.asarray(procrustes_align(jnp.asarray(Y), jnp.asarray(X)))
        # A proper rotation cannot undo a reflection: residual stays large.
        assert np.abs(aligned - X).max() > 0.1


class TestOtherAlignments:
    def test_scale_align(self):
        rng = np.random.default_rng(3)
        X = rng.normal(size=(40, 3)).astype(np.float32)
        Y = (3.0 * X + np.array([1, 2, 3], np.float32)).astype(np.float32)
        aligned = np.asarray(scale_align(jnp.asarray(X), jnp.asarray(Y)))
        np.testing.assert_allclose(aligned, Y, atol=1e-3)

    def test_pelvis_align(self):
        X = np.zeros((5, 3), np.float32)
        X[2] = [1, 1, 1]
        X[3] = [3, 3, 3]
        out = np.asarray(pelvis_align(jnp.asarray(X), hips_idxs=(2, 3)))
        np.testing.assert_allclose(out[2] + out[3], 0.0, atol=1e-6)

    def test_fscore_perfect(self):
        rng = np.random.default_rng(4)
        X = jnp.asarray(rng.normal(size=(30, 3)), jnp.float32)
        out = point_fscore(X, X, thresh=1e-3)
        assert float(out["fscore"]) == 1.0


class TestEHFProtocol:
    def _make_gt(self, num_verts=300, seed=5):
        """GT vertices positioned in front of the EHF GT camera."""
        rng = np.random.default_rng(seed)
        cam = ehf_gt_camera()
        # place points in a box that projects near the image center
        R = np.asarray(cam.rotation)
        t = np.asarray(cam.translation)
        pts_cam = rng.uniform(
            [-0.3, -0.4, 1.2], [0.3, 0.4, 2.2], size=(num_verts, 3)
        ).astype(np.float32)
        gt = (pts_cam - t) @ R  # inverse: R.T @ (p_cam - t), R orthonormal
        return gt.astype(np.float32)

    def test_visibility(self):
        gt = self._make_gt()
        vis = visible_indices(gt, 0.0, 0.0)
        assert 0 < len(vis) <= len(gt)
        # shifting the crop far away empties the visible set
        vis_far = visible_indices(gt, 5000.0, 5000.0)
        assert len(vis_far) == 0

    def test_known_error_recovered(self):
        gt = self._make_gt()
        part_ids = synthetic_part_vertex_ids(len(gt), seed=6)
        # Fitted = GT under a similarity transform + 5mm radial noise:
        # Procrustes must recover ~the noise level.
        rng = np.random.default_rng(7)
        s, R, t = random_rigid(rng)
        noise = rng.normal(scale=0.005, size=gt.shape).astype(np.float32)
        fitted = (s * ((gt + noise) @ R.T) + t).astype(np.float32)
        m = evaluate_frame(fitted, gt, 0.0, 0.0, part_ids)
        assert m.v2v_all is not None
        assert 0.001 < m.v2v_all < 0.02, m.v2v_all
        assert m.v2v_body is not None and m.v2v_body < 0.02

    def test_full_tree_evaluation(self, tmp_path):
        gt = self._make_gt()
        part_ids = synthetic_part_vertex_ids(len(gt), seed=8)
        rng = np.random.default_rng(9)

        gt_dir = tmp_path / "EHF"
        fit_dir = tmp_path / "results"
        bbox_dir = tmp_path / "bbox"
        for d in (gt_dir, fit_dir, bbox_dir):
            d.mkdir()
        for name in ("01", "02"):
            write_ply(str(gt_dir / f"{name}_align.ply"), gt)
            frame_dir = fit_dir / f"{name}_cropped"
            frame_dir.mkdir()
            noise = rng.normal(scale=0.003, size=gt.shape).astype(np.float32)
            write_ply(str(frame_dir / "vertices.ply"), gt + noise)
            with open(bbox_dir / f"{name}_cropped.txt", "w") as f:
                f.write("0 800 0 600")

        j14 = np.zeros((14, len(gt)), np.float32)
        for j in range(14):
            j14[j, rng.choice(len(gt), 5, replace=False)] = 0.2

        out = evaluate_ehf(str(fit_dir), str(gt_dir), str(bbox_dir),
                           part_ids, j14)
        assert out["num_frames"] == 2
        # 3mm gaussian noise => ~4-6mm mean V2V
        assert 2.0 < out["pa_v2v_all_mm"] < 10.0
        assert np.isfinite(out["pa_mpjpe14_mm"])

    def test_mesh_tree_keying(self, tmp_path):
        gt = self._make_gt(50)
        (tmp_path / "sub").mkdir()
        write_ply(str(tmp_path / "sub" / "07_align.ply"), gt)
        tree = load_mesh_tree(str(tmp_path), gt=True)
        assert "07_cropped" in tree
