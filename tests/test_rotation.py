import numpy as np
import jax
import jax.numpy as jnp
import pytest

from smplifyx_tpu.ops.rotation import (
    batch_rodrigues,
    rotmat_to_aa,
    euler_xyz_from_rotmat,
    flip_global_orient_y,
)


def np_rodrigues(aa):
    """Independent numpy Rodrigues for golden checks."""
    theta = np.linalg.norm(aa)
    if theta < 1e-12:
        return np.eye(3)
    k = aa / theta
    K = np.array(
        [[0, -k[2], k[1]], [k[2], 0, -k[0]], [-k[1], k[0], 0]], dtype=np.float64
    )
    return np.eye(3) + np.sin(theta) * K + (1 - np.cos(theta)) * (K @ K)


def euler_xyz_to_rotmat_np(a, b, c):
    ca, sa = np.cos(a), np.sin(a)
    cb, sb = np.cos(b), np.sin(b)
    cc, sc = np.cos(c), np.sin(c)
    Rx = np.array([[1, 0, 0], [0, ca, -sa], [0, sa, ca]])
    Ry = np.array([[cb, 0, sb], [0, 1, 0], [-sb, 0, cb]])
    Rz = np.array([[cc, -sc, 0], [sc, cc, 0], [0, 0, 1]])
    return Rx @ Ry @ Rz


class TestRodrigues:
    def test_matches_numpy_golden(self):
        rng = np.random.default_rng(0)
        aa = rng.normal(size=(32, 3)).astype(np.float32)
        R = np.asarray(batch_rodrigues(jnp.asarray(aa)))
        for i in range(32):
            np.testing.assert_allclose(R[i], np_rodrigues(aa[i]), atol=1e-5)

    def test_zero_angle_is_identity(self):
        R = np.asarray(batch_rodrigues(jnp.zeros((1, 3))))
        np.testing.assert_allclose(R[0], np.eye(3), atol=1e-5)

    def test_orthonormal(self):
        rng = np.random.default_rng(1)
        aa = rng.normal(size=(16, 3)).astype(np.float32) * 3
        R = np.asarray(batch_rodrigues(jnp.asarray(aa)))
        eye = np.einsum("bij,bkj->bik", R, R)
        np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), eye.shape), atol=1e-5)
        np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-5)

    def test_grad_finite_at_zero(self):
        g = jax.grad(lambda aa: batch_rodrigues(aa).sum())(jnp.zeros(3))
        assert np.all(np.isfinite(np.asarray(g)))

    def test_batch_shapes(self):
        out = batch_rodrigues(jnp.zeros((2, 5, 3)))
        assert out.shape == (2, 5, 3, 3)


class TestLogMap:
    @pytest.mark.parametrize("scale", [0.1, 1.0, 2.5])
    def test_roundtrip(self, scale):
        rng = np.random.default_rng(2)
        aa = rng.normal(size=(64, 3)).astype(np.float32)
        aa = aa / np.linalg.norm(aa, axis=-1, keepdims=True) * scale
        rec = np.asarray(rotmat_to_aa(batch_rodrigues(jnp.asarray(aa))))
        np.testing.assert_allclose(rec, aa, atol=2e-4)

    def test_near_pi(self):
        rng = np.random.default_rng(3)
        axis = rng.normal(size=(16, 3))
        axis /= np.linalg.norm(axis, axis=-1, keepdims=True)
        aa = (axis * (np.pi - 1e-3)).astype(np.float32)
        R = batch_rodrigues(jnp.asarray(aa))
        rec = np.asarray(rotmat_to_aa(R))
        # Representation may flip sign of the axis for angles near pi; compare
        # the induced rotations instead.
        R2 = np.asarray(batch_rodrigues(jnp.asarray(rec)))
        np.testing.assert_allclose(R2, np.asarray(R), atol=1e-3)

    def test_identity(self):
        rec = np.asarray(rotmat_to_aa(jnp.eye(3)[None]))
        np.testing.assert_allclose(rec, np.zeros((1, 3)), atol=1e-5)


class TestEulerXYZ:
    def test_recovers_known_angles(self):
        rng = np.random.default_rng(4)
        angles = rng.uniform(-1.2, 1.2, size=(64, 3))
        R = np.stack([euler_xyz_to_rotmat_np(*a) for a in angles]).astype(np.float32)
        rec = np.asarray(euler_xyz_from_rotmat(jnp.asarray(R)))
        np.testing.assert_allclose(rec, angles, atol=1e-5)

    def test_reconstruction_invariance(self):
        """Decompose arbitrary rotations, re-build, compare matrices."""
        rng = np.random.default_rng(5)
        aa = rng.normal(size=(64, 3)).astype(np.float32) * 2
        R = np.asarray(batch_rodrigues(jnp.asarray(aa)))
        e = np.asarray(euler_xyz_from_rotmat(jnp.asarray(R)))
        R2 = np.stack([euler_xyz_to_rotmat_np(*a) for a in e])
        np.testing.assert_allclose(R2, R, atol=1e-4)

    def test_gimbal_lock(self):
        R = euler_xyz_to_rotmat_np(0.3, np.pi / 2, 0.7).astype(np.float32)
        e = np.asarray(euler_xyz_from_rotmat(jnp.asarray(R)))[0] \
            if euler_xyz_from_rotmat(jnp.asarray(R)).ndim > 1 else \
            np.asarray(euler_xyz_from_rotmat(jnp.asarray(R)))
        # third angle forced to zero; rotation must still be reproduced
        assert abs(e[2]) < 1e-6
        R2 = euler_xyz_to_rotmat_np(*e)
        np.testing.assert_allclose(R2, R, atol=1e-3)

    def test_matches_reference_torch_impl(self):
        """Optional parity check against the reference algorithm (run live)."""
        import importlib.util
        import os
        import sys

        ref = "/root/reference/smplifyx"
        if not os.path.isdir(ref):
            pytest.skip("reference not mounted")
        torch = pytest.importorskip("torch")

        # Load only the euler function from the reference module namespace.
        sys.path.insert(0, ref)
        try:
            spec = importlib.util.spec_from_file_location(
                "_ref_utils_euler", os.path.join(ref, "utils.py")
            )
            try:
                mod = importlib.util.module_from_spec(spec)
                spec.loader.exec_module(mod)
            except Exception as e:  # heavy optional deps (open3d, pyrender)
                pytest.skip(f"reference utils not importable: {e}")
        finally:
            sys.path.pop(0)

        rng = np.random.default_rng(6)
        aa = rng.normal(size=(32, 3)).astype(np.float32)
        R = np.asarray(batch_rodrigues(jnp.asarray(aa)))
        ours = np.asarray(euler_xyz_from_rotmat(jnp.asarray(R)))
        theirs = mod._compute_euler_from_matrix(torch.tensor(R)).numpy()
        np.testing.assert_allclose(ours, theirs, atol=1e-4)


class TestFlip:
    def test_flip_composes_y_pi(self):
        rng = np.random.default_rng(7)
        aa = rng.normal(size=(8, 3)).astype(np.float32)
        flipped = flip_global_orient_y(jnp.asarray(aa))
        R = np.asarray(batch_rodrigues(jnp.asarray(aa)))
        Ry = np_rodrigues(np.array([0.0, np.pi, 0.0]))
        R_expect = R @ Ry
        R_got = np.asarray(batch_rodrigues(flipped))
        np.testing.assert_allclose(R_got, R_expect, atol=1e-3)
