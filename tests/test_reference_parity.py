"""Differential parity tests: run the reference PyTorch code side-by-side.

The reference implementation at /root/reference/smplifyx imports with
torch+numpy plus a handful of stub modules (its rendering/IO deps are not
installed and not needed for the numeric kernels under test).  These tests
feed identical inputs to the reference modules and to this repo's JAX
re-implementations and assert the numbers agree:

  * MaxMixturePrior NLL + mixture mean  (prior.py:100-231 vs priors.GMMPrior)
  * L2Prior                             (prior.py:92-97   vs priors.l2_prior)
  * SMPLifyAnglePrior                   (prior.py:53-89   vs priors.angle_prior)
  * GMoF robustifier                    (utils.py:84-95   vs ops.robustifier.gmof)
  * _compute_euler_from_matrix          (utils.py:300-436 vs ops.rotation.euler_xyz_from_rotmat)
  * ProcrustesAlignmentMPJPE (the :774 v2v one) vs evaluation.metrics.procrustes_v2v
  * PerspectiveCamera projection        (camera.py:42-117 vs ops.camera.project_points)
  * LBFGS strong-Wolfe final loss       (optimizers/lbfgs_ls.py vs fitting.lbfgs.minimize)

Skipped wholesale when /root/reference is absent.
"""

from __future__ import annotations

import os
import pickle
import sys
import types

import numpy as np
import pytest

REF_DIR = "/root/reference/smplifyx"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_DIR), reason="reference checkout not available"
)

torch = pytest.importorskip("torch")


# ---------------------------------------------------------------------------
# Reference import harness: stub the rendering/IO deps the numeric kernels
# never touch, then import the reference modules as top-level names (the
# reference is a flat package whose files import each other absolutely).
# ---------------------------------------------------------------------------

def _stub(name, **attrs):
    if name in sys.modules:
        return sys.modules[name]
    m = types.ModuleType(name)
    m.__path__ = []  # let it act as a package for submodule stubs
    for k, v in attrs.items():
        setattr(m, k, v)
    sys.modules[name] = m
    return m


def _transform_mat(R, t):
    """4x4 homogeneous transform from R [B,3,3], t [B,3,1] (the public
    smplx.lbs.transform_mat contract, needed by reference camera.py:27)."""
    import torch.nn.functional as F

    return torch.cat(
        [F.pad(R, [0, 0, 0, 1]), F.pad(t, [0, 0, 0, 1], value=1)], dim=2
    )


@pytest.fixture(scope="module")
def ref():
    # Everything installed into sys.modules here is removed at teardown:
    # the stubs would otherwise shadow the REAL PIL/cv2/... for every test
    # that runs after this module in the same process (a stubbed PIL.Image
    # without fromarray broke test_viz's browse CLI), and the reference's
    # flat top-level module names ("utils", "prior", ...) are far too
    # generic to leave in the global module cache.
    created = []

    def stub(name, **attrs):
        m = _stub(name, **attrs)
        if sys.modules.get(name) is m and not hasattr(m, "__file__"):
            created.append(name)
        return m

    stub(
        "open3d",
        geometry=types.SimpleNamespace(PointCloud=object),
        utility=types.SimpleNamespace(Vector3dVector=object),
    )
    for n in ("trimesh", "pyrender", "cv2"):
        stub(n)
    stub("skimage")
    stub("skimage.io", imread=lambda *a, **k: None)
    stub("skimage.transform", estimate_transform=None, warp=None)
    stub("PIL")
    stub("PIL.Image")
    stub("PIL.ImageDraw")
    hbp = stub("human_body_prior")
    stub("human_body_prior.tools")
    stub(
        "human_body_prior.tools.visualization_tools",
        render_smpl_params=None, imagearray2file=None,
    )
    stub("human_body_prior.body_model")
    stub("human_body_prior.body_model.body_model", BodyModel=object)
    hbp.tools = sys.modules["human_body_prior.tools"]
    smplx = stub("smplx")
    lbs = stub("smplx.lbs", transform_mat=_transform_mat)
    smplx.lbs = lbs
    stub("mesh_viewer", MeshViewer=object)

    path_added = REF_DIR not in sys.path
    if path_added:
        sys.path.insert(0, REF_DIR)
    import importlib

    ref_names = ["prior", "utils", "camera", "optimizers",
                 "optimizers.lbfgs_ls"]
    preexisting = {n for n in ref_names if n in sys.modules}
    mods = types.SimpleNamespace(
        prior=importlib.import_module("prior"),
        utils=importlib.import_module("utils"),
        camera=importlib.import_module("camera"),
        lbfgs_ls=importlib.import_module("optimizers.lbfgs_ls"),
    )
    yield mods

    for name in created:
        sys.modules.pop(name, None)
    for name in ref_names:
        if name not in preexisting:
            sys.modules.pop(name, None)
    if path_added and REF_DIR in sys.path:
        sys.path.remove(REF_DIR)


def _synthetic_gmm_arrays(K=8, D=69, seed=3):
    rng = np.random.default_rng(seed)
    means = rng.normal(scale=0.3, size=(K, D))
    covs = []
    for _ in range(K):
        A = rng.normal(size=(D, D)) * 0.02
        covs.append(A @ A.T + np.eye(D) * 0.2)  # well-conditioned
    weights = rng.dirichlet(np.ones(K))
    return (
        means.astype(np.float64),
        np.stack(covs).astype(np.float64),
        weights.astype(np.float64),
    )


# ---------------------------------------------------------------------------
# Priors
# ---------------------------------------------------------------------------

class TestGMMPriorParity:
    @pytest.fixture(scope="class")
    def gmm_pkl(self, tmp_path_factory):
        folder = tmp_path_factory.mktemp("gmm")
        means, covs, weights = _synthetic_gmm_arrays()
        with open(folder / "gmm_08.pkl", "wb") as f:
            pickle.dump(
                {"means": means, "covars": covs, "weights": weights}, f
            )
        return str(folder)

    def test_nll_matches_reference_merged_path(self, ref, gmm_pkl):
        import jax.numpy as jnp

        from smplifyx_tpu.priors.priors import load_gmm_pickle

        ref_prior = ref.prior.MaxMixturePrior(
            prior_folder=gmm_pkl, num_gaussians=8, use_merged=True
        )
        ours = load_gmm_pickle(os.path.join(gmm_pkl, "gmm_08.pkl"))

        rng = np.random.default_rng(0)
        pose = rng.normal(scale=0.5, size=(16, 69)).astype(np.float32)
        betas = np.zeros((16, 10), np.float32)

        ref_nll = ref_prior(torch.from_numpy(pose), torch.from_numpy(betas))
        our_nll = ours(jnp.asarray(pose))

        np.testing.assert_allclose(
            np.asarray(our_nll), ref_nll.detach().numpy(),
            rtol=2e-3, atol=2e-3,
        )

    def test_mixture_mean_matches(self, ref, gmm_pkl):
        from smplifyx_tpu.priors.priors import load_gmm_pickle

        ref_prior = ref.prior.MaxMixturePrior(prior_folder=gmm_pkl,
                                              num_gaussians=8)
        ours = load_gmm_pickle(os.path.join(gmm_pkl, "gmm_08.pkl"))
        np.testing.assert_allclose(
            np.asarray(ours.mean_pose()),
            ref_prior.get_mean().numpy().ravel(),
            rtol=1e-5, atol=1e-6,
        )


class TestSimplePriorParity:
    def test_l2_prior(self, ref):
        import jax.numpy as jnp

        from smplifyx_tpu.priors.priors import l2_prior

        rng = np.random.default_rng(1)
        x = rng.normal(size=(4, 45)).astype(np.float32)
        ref_val = ref.prior.L2Prior()(torch.from_numpy(x)).item()
        ours = float(jnp.sum(l2_prior(jnp.asarray(x))))
        np.testing.assert_allclose(ours, ref_val, rtol=1e-5)

    @pytest.mark.parametrize("with_global", [False, True])
    def test_angle_prior(self, ref, with_global):
        import jax.numpy as jnp

        from smplifyx_tpu.priors.priors import angle_prior

        rng = np.random.default_rng(2)
        pose = rng.normal(scale=0.8, size=(5, 69)).astype(np.float32)
        ref_prior = ref.prior.SMPLifyAnglePrior()
        # Reference returns exp(pose[idx]*sign)^2 per element [B,4];
        # energy code sums it.  Ours returns the per-sample sum directly.
        ref_val = (
            ref_prior(torch.from_numpy(pose), with_global_pose=with_global)
            .sum(dim=-1).numpy()
        )
        ours = np.asarray(
            angle_prior(jnp.asarray(pose), with_global_pose=with_global)
        )
        np.testing.assert_allclose(ours, ref_val, rtol=1e-4)

    def test_gmof(self, ref):
        import jax.numpy as jnp

        from smplifyx_tpu.ops.robustifier import gmof

        rng = np.random.default_rng(3)
        r = rng.normal(scale=50.0, size=(7, 25, 2)).astype(np.float32)
        ref_val = ref.utils.GMoF(rho=100.0)(torch.from_numpy(r)).numpy()
        ours = np.asarray(gmof(jnp.asarray(r), 100.0))
        np.testing.assert_allclose(ours, ref_val, rtol=1e-5, atol=1e-4)


# ---------------------------------------------------------------------------
# Rotation utilities
# ---------------------------------------------------------------------------

class TestEulerParity:
    def test_random_rotations(self, ref):
        import jax.numpy as jnp

        from smplifyx_tpu.ops.rotation import (
            batch_rodrigues, euler_xyz_from_rotmat,
        )

        rng = np.random.default_rng(4)
        aa = rng.normal(scale=0.9, size=(64, 3)).astype(np.float32)
        R = np.asarray(batch_rodrigues(jnp.asarray(aa)))

        ref_euler = ref.utils._compute_euler_from_matrix(
            torch.from_numpy(R), seq="xyz", extrinsic=False
        ).numpy()
        ours = np.asarray(euler_xyz_from_rotmat(jnp.asarray(R)))
        np.testing.assert_allclose(ours, ref_euler, rtol=1e-3, atol=2e-5)

    def test_large_angles(self, ref):
        import jax.numpy as jnp

        from smplifyx_tpu.ops.rotation import (
            batch_rodrigues, euler_xyz_from_rotmat,
        )

        rng = np.random.default_rng(5)
        axis = rng.normal(size=(32, 3))
        axis /= np.linalg.norm(axis, axis=-1, keepdims=True)
        angle = rng.uniform(1.5, 3.0, size=(32, 1))
        aa = (axis * angle).astype(np.float32)
        R = np.asarray(batch_rodrigues(jnp.asarray(aa)))

        ref_euler = ref.utils._compute_euler_from_matrix(
            torch.from_numpy(R), seq="xyz", extrinsic=False
        ).numpy()
        ours = np.asarray(euler_xyz_from_rotmat(jnp.asarray(R)))
        np.testing.assert_allclose(ours, ref_euler, rtol=1e-3, atol=1e-4)


# ---------------------------------------------------------------------------
# Joint mapping tables
# ---------------------------------------------------------------------------

class TestJointMappingParity:
    @pytest.mark.parametrize("model_type,fmt,use_hands,use_face", [
        ("smplx", "coco25", True, True),
        ("smplx", "halpe", True, True),
        ("smplx", "coco_wholebody", True, True),
        ("smplh", "coco25", True, False),
        ("smpl", "coco25", False, False),
        ("smpl", "coco19", False, False),
    ])
    def test_tables_match_reference(self, ref, model_type, fmt,
                                    use_hands, use_face):
        """Where this framework's canonical joint layout coincides with the
        reference model's (every case except coco19 on smplx/smplh, whose
        reference models drop the foot vertex-joints — see the layout note
        in models/joint_mapping.py), the permutations must be identical."""
        from smplifyx_tpu.models.joint_mapping import model_to_annotation

        ref_map = ref.utils.smpl_to_annotation(
            model_type=model_type, use_hands=use_hands, use_face=use_face,
            use_face_contour=False, format=fmt,
        )
        ours = model_to_annotation(model_type, use_hands, use_face,
                                   False, fmt)
        np.testing.assert_array_equal(ours, ref_map)


# ---------------------------------------------------------------------------
# Metrics
# ---------------------------------------------------------------------------

class TestProcrustesParity:
    def test_v2v_after_alignment(self, ref):
        import jax.numpy as jnp

        from smplifyx_tpu.evaluation.metrics import procrustes_v2v

        rng = np.random.default_rng(6)
        gt = rng.normal(size=(200, 3)).astype(np.float32)
        # A known similarity transform + noise of the estimate.
        theta = 0.7
        Rz = np.array([
            [np.cos(theta), -np.sin(theta), 0],
            [np.sin(theta), np.cos(theta), 0],
            [0, 0, 1],
        ], np.float32)
        est = 1.4 * gt @ Rz.T + np.asarray([0.3, -0.2, 0.9], np.float32)
        est += rng.normal(scale=0.03, size=est.shape).astype(np.float32)

        ref_metric = ref.utils.ProcrustesAlignmentMPJPE()
        ref_err = ref_metric(est.copy(), gt.copy())["point"]
        ours = np.asarray(procrustes_v2v(jnp.asarray(est), jnp.asarray(gt)))
        np.testing.assert_allclose(ours, ref_err, rtol=1e-3, atol=1e-5)
        # And the means (what eval.py reports) agree tightly.
        np.testing.assert_allclose(ours.mean(), ref_err.mean(), rtol=1e-4)


# ---------------------------------------------------------------------------
# Camera
# ---------------------------------------------------------------------------

class TestCameraParity:
    def test_projection(self, ref):
        import jax.numpy as jnp

        from smplifyx_tpu.ops.camera import CameraParams, project_points
        from smplifyx_tpu.ops.rotation import batch_rodrigues

        rng = np.random.default_rng(7)
        B, N = 3, 40
        aa = rng.normal(scale=0.2, size=(B, 3)).astype(np.float32)
        R = np.asarray(batch_rodrigues(jnp.asarray(aa)))
        t = np.stack(
            [rng.normal(0, 0.1, B), rng.normal(0, 0.1, B),
             rng.uniform(2.0, 5.0, B)], axis=-1
        ).astype(np.float32)
        pts = rng.normal(scale=0.5, size=(B, N, 3)).astype(np.float32)
        focal = rng.uniform(800, 2000, size=B).astype(np.float32)
        center = rng.uniform(100, 500, size=(B, 2)).astype(np.float32)

        cam = ref.camera.PerspectiveCamera(
            rotation=torch.from_numpy(R),
            translation=torch.from_numpy(t),
            focal_length_x=torch.from_numpy(focal),
            focal_length_y=torch.from_numpy(focal),
            center=torch.from_numpy(center),
            batch_size=B,
        )
        with torch.no_grad():
            ref_uv = cam(torch.from_numpy(pts)).numpy()

        ours = np.asarray(project_points(
            CameraParams(
                rotation=jnp.asarray(R), translation=jnp.asarray(t),
                focal=jnp.stack([jnp.asarray(focal)] * 2, axis=-1),
                center=jnp.asarray(center),
            ),
            jnp.asarray(pts),
        ))
        np.testing.assert_allclose(ours, ref_uv, rtol=1e-4, atol=5e-3)

    def test_ehf_gt_camera_constants(self, ref):
        import jax.numpy as jnp

        from smplifyx_tpu.ops.camera import ehf_gt_camera, project_points

        rng = np.random.default_rng(8)
        pts = rng.normal(scale=0.4, size=(1, 30, 3)).astype(np.float32)
        ref_cam = ref.camera.PerspectiveCameraCroppedEHFGT(xmin=12, ymin=34)
        with torch.no_grad():
            ref_uv = ref_cam(torch.from_numpy(pts)).numpy()
        ours = np.asarray(
            project_points(ehf_gt_camera(xmin=12, ymin=34), jnp.asarray(pts))
        )
        np.testing.assert_allclose(ours, ref_uv, rtol=1e-4, atol=5e-3)


# ---------------------------------------------------------------------------
# L-BFGS with strong Wolfe
# ---------------------------------------------------------------------------

class TestLBFGSParity:
    def _run_reference(self, ref, fun_torch, x0, max_iter=200, outer=5):
        xt = torch.tensor(x0, requires_grad=True)
        opt = ref.lbfgs_ls.LBFGS(
            [xt], lr=1.0, max_iter=max_iter, history_size=100,
            line_search_fn="strong_Wolfe",
        )

        def closure():
            opt.zero_grad()
            loss = fun_torch(xt)
            loss.backward()
            return loss

        for _ in range(outer):
            opt.step(closure)
        return float(fun_torch(xt).detach())

    def test_rosenbrock_final_loss(self, ref):
        import jax.numpy as jnp

        from smplifyx_tpu.fitting.lbfgs import LBFGSConfig, minimize

        x0 = np.full(6, -0.7, np.float32)

        def fun_torch(x):
            return (100 * (x[1:] - x[:-1] ** 2) ** 2 + (1 - x[:-1]) ** 2).sum()

        ref_f = self._run_reference(ref, fun_torch, x0)

        def fun_jax(x):
            return jnp.sum(
                100.0 * (x[1:] - x[:-1] ** 2) ** 2 + (1.0 - x[:-1]) ** 2
            )

        res = minimize(
            fun_jax, jnp.asarray(x0),
            cfg=LBFGSConfig(max_iters=400, ftol=0.0, gtol=1e-7),
        )
        assert float(res.f) <= ref_f + 1e-4, (float(res.f), ref_f)

    def test_gmof_reprojection_like_energy(self, ref):
        """A miniature SMPLify-shaped energy: robustified residuals + L2."""
        import jax.numpy as jnp

        from smplifyx_tpu.fitting.lbfgs import LBFGSConfig, minimize

        rng = np.random.default_rng(9)
        D = 12
        A = rng.normal(size=(30, D)).astype(np.float32)
        b = rng.normal(scale=5.0, size=30).astype(np.float32)
        x0 = np.zeros(D, np.float32)
        rho = 2.0

        def fun_torch(x):
            r = torch.from_numpy(A) @ x - torch.from_numpy(b)
            sq = r * r
            gm = rho**2 * sq / (sq + rho**2)
            return gm.sum() + 0.1 * (x * x).sum()

        ref_f = self._run_reference(ref, fun_torch, x0)

        Aj, bj = jnp.asarray(A), jnp.asarray(b)

        def fun_jax(x):
            r = Aj @ x - bj
            sq = r * r
            return jnp.sum(rho**2 * sq / (sq + rho**2)) + 0.1 * jnp.sum(x * x)

        res = minimize(
            fun_jax, jnp.asarray(x0),
            cfg=LBFGSConfig(max_iters=300, ftol=0.0, gtol=1e-7),
        )
        # Robust losses are multi-modal; require we match or beat the
        # reference's basin within a small slack.
        assert float(res.f) <= ref_f * 1.001 + 1e-4, (float(res.f), ref_f)
