import numpy as np
import jax.numpy as jnp

from smplifyx_tpu.ops.camera import (
    CameraParams,
    identity_camera,
    project_points,
    ehf_gt_camera,
)
from smplifyx_tpu.ops.robustifier import gmof


def np_project(R, t, f, c, pts):
    cam = pts @ R.T + t
    uv = cam[:, :2] / cam[:, 2:3]
    return uv * f + c


class TestProjection:
    def test_matches_numpy(self):
        rng = np.random.default_rng(0)
        pts = rng.normal(size=(10, 3)).astype(np.float32)
        pts[:, 2] += 5.0
        R = np.eye(3, dtype=np.float32)
        t = np.array([0.1, -0.2, 2.0], dtype=np.float32)
        f = np.array([1000.0, 1200.0], dtype=np.float32)
        c = np.array([320.0, 240.0], dtype=np.float32)
        cam = CameraParams(jnp.asarray(R), jnp.asarray(t), jnp.asarray(f), jnp.asarray(c))
        got = np.asarray(project_points(cam, jnp.asarray(pts)))
        np.testing.assert_allclose(got, np_project(R, t, f, c, pts), rtol=1e-5)

    def test_batched(self):
        rng = np.random.default_rng(1)
        pts = rng.normal(size=(4, 10, 3)).astype(np.float32)
        pts[..., 2] += 5.0
        cam = identity_camera((4,), focal_length=500.0)
        got = np.asarray(project_points(cam, jnp.asarray(pts)))
        assert got.shape == (4, 10, 2)
        for b in range(4):
            expect = np_project(
                np.eye(3), np.zeros(3), np.full(2, 500.0), np.zeros(2), pts[b]
            )
            np.testing.assert_allclose(got[b], expect, rtol=1e-4)

    def test_center_offset(self):
        pts = jnp.asarray([[0.0, 0.0, 2.0]])
        cam = identity_camera((), focal_length=100.0, center=jnp.asarray([10.0, 20.0]))
        got = np.asarray(project_points(cam, pts))
        np.testing.assert_allclose(got, [[10.0, 20.0]], atol=1e-6)


class TestEHFCamera:
    def test_bbox_shift(self):
        c0 = ehf_gt_camera(0.0, 0.0)
        c1 = ehf_gt_camera(100.0, 50.0)
        np.testing.assert_allclose(
            np.asarray(c0.center) - np.asarray(c1.center), [100.0, 50.0], atol=1e-5
        )
        np.testing.assert_allclose(np.asarray(c0.focal), [1498.22426237] * 2, rtol=1e-6)

    def test_rotation_orthonormal(self):
        R = np.asarray(ehf_gt_camera().rotation)
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)


class TestGMoF:
    def test_values(self):
        r = jnp.asarray([0.0, 1.0, 100.0, 1e6])
        rho = 100.0
        got = np.asarray(gmof(r, rho))
        expect = rho**2 * r**2 / (r**2 + rho**2)
        np.testing.assert_allclose(got, np.asarray(expect), rtol=1e-5)

    def test_saturates_at_rho_sq(self):
        got = float(gmof(jnp.asarray(1e8), 100.0))
        assert abs(got - 100.0**2) < 1.0
