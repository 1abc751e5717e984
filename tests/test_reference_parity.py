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
                 "optimizers.lbfgs_ls", "fitting"]
    preexisting = {n for n in ref_names if n in sys.modules}
    mods = types.SimpleNamespace(
        prior=importlib.import_module("prior"),
        utils=importlib.import_module("utils"),
        camera=importlib.import_module("camera"),
        lbfgs_ls=importlib.import_module("optimizers.lbfgs_ls"),
        fitting=importlib.import_module("fitting"),
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


# ---------------------------------------------------------------------------
# Full SMPLify energy: term assembly differential
# ---------------------------------------------------------------------------

class TestSMPLifyLossParity:
    """smplify_energy vs the reference's SMPLifyLoss.forward, term by term.

    Both sides are fed IDENTICAL model outputs (the reference loss takes a
    body_model_output object, so our synthetic-model forward result is
    exported to torch and wrapped), identical keypoints/confidences, and the
    per-stage weight dicts assembled exactly the way fit_single_frame does
    (opt_weights zip at :330-353, the in-loop data_weight override and
    3.17x bending rule at :565-568, hand/face joint-weight assignment at
    :569-572).  This pins the COMPOSITE term assembly — conf^2 weighting,
    jaw 3-vector elementwise weight, bending-not-squared, the
    last-stage-only deviation rule — against fitting.py:375-461 for every
    stage of all four shipped presets plus the GMM body-prior path.

    Coverage is at TWO granularities per stage: the stage TOTAL, and then
    each of smplify_energy_terms' seven non-collision terms individually
    against the reference value isolated by zeroing every other term's
    weight through the actual forward (reset_loss_weights) — so a
    regression localizes to the exact term and compensating errors
    between mis-scaled terms cannot cancel.  The interpenetration term is
    the one permanent exclusion: the reference side needs CUDA
    torch-mesh-isect (fit_single_frame.py:300-328), absent here;
    collision correctness rests on the exact all-pairs oracle in
    tests/test_collision_oracle.py.
    """

    PRESETS = {
        "fit_smplx_smplifyx": dict(fmt="coco25", nb=25,
                                   use_vposer=True, has_reg=False),
        "fit_smplx_combined_coco25": dict(fmt="coco25", nb=25,
                                          use_vposer=False, has_reg=True),
        "fit_smplx_combined_vposer_coco25": dict(fmt="coco25", nb=25,
                                                 use_vposer=True,
                                                 has_reg=True),
        "fit_smplx_combined_halpe": dict(fmt="halpe", nb=26,
                                         use_vposer=False, has_reg=True),
    }

    @staticmethod
    def _preset_lists(name):
        import yaml

        with open(f"/root/reference/cfg_files/{name}.yaml") as f:
            d = yaml.safe_load(f)

        def fl(key):
            return [float(v) for v in d[key]]

        jaw = [[float(x) for x in str(e).split(",")]
               for e in d["jaw_pose_prior_weights"]]
        return dict(
            body=fl("body_pose_prior_weights"), shape=fl("shape_weights"),
            expr=fl("expr_weights"), hand_prior=fl("hand_pose_prior_weights"),
            jaw=jaw, hand_joints=fl("hand_joints_weights"),
            face_joints=fl("face_joints_weights"),
        )

    def _make_problem(self, fmt, nb, use_vposer, has_reg, seed,
                      body_prior_type="l2"):
        import jax.numpy as jnp

        from smplifyx_tpu.fitting.energy import FrameData
        from smplifyx_tpu.fitting.params import FitSettings
        from smplifyx_tpu.models.bodymodel import synthetic_model
        from smplifyx_tpu.models.joint_mapping import model_to_annotation

        settings = FitSettings(
            use_vposer=use_vposer, has_regression_prior=has_reg,
            use_face_contour=True, num_body_kp=nb,
            body_prior_type=body_prior_type,
        )
        model = synthetic_model(num_verts=128, seed=0)
        joint_map = jnp.asarray(
            model_to_annotation("smplx", True, True, True, fmt)
        )
        K = int(joint_map.shape[0])
        rng = np.random.default_rng(seed)
        x = rng.normal(0, 0.1, (settings.dim,)).astype(np.float32)
        x[2] = 4.0  # cam_t z: body in front of the camera

        if use_vposer:
            W = rng.normal(0, 0.05, (settings.latent_dim, 63)).astype(
                np.float32)
            Wj = jnp.asarray(W)
            decode = lambda b: b @ Wj  # noqa: E731
        else:
            decode = lambda b: b  # noqa: E731

        base_jw = np.ones((K,), np.float32)
        base_jw[rng.choice(nb, size=3, replace=False)] = 0.0  # low-conf body
        frame = FrameData(
            gt_joints=jnp.asarray(
                rng.normal(0, 120, (K, 2)) + np.asarray([400.0, 300.0]),
                jnp.float32),
            conf=jnp.asarray(rng.uniform(0.2, 1.0, (K,)), jnp.float32),
            joint_weights=jnp.asarray(base_jw),
            focal=jnp.asarray([1500.0, 1500.0]),
            center=jnp.asarray([400.0, 300.0]),
            data_weight=jnp.asarray(1000.0 / 600.0),
            init_joints_mask=jnp.zeros((K,)),
            trans_estimation=jnp.zeros((3,)),
            depth_loss_weight=jnp.asarray(0.0),
            regression_body=jnp.asarray(
                rng.normal(0, 0.1, (settings.body_dim,)), jnp.float32),
        )
        return settings, model, joint_map, decode, x, frame, base_jw

    def _fake_output_and_camera(self, ref, settings, model, joint_map,
                                decode, x, frame):
        """Run OUR forward on x, export to torch as the reference loss's
        body_model_output + camera (same joints on both sides by
        construction; projection parity is covered separately and
        re-exercised here through the composite)."""
        import jax.numpy as jnp
        import types as _types

        from smplifyx_tpu.fitting.params import body_params_from_flat
        from smplifyx_tpu.models.forward import smplx_forward

        params, cam_t, body_raw = body_params_from_flat(
            settings, jnp.asarray(x)[None], decode
        )
        out = smplx_forward(
            model, params, use_pca=settings.use_pca,
            flat_hand_mean=settings.flat_hand_mean,
            use_face_contour=settings.use_face_contour,
            joint_map=joint_map, return_verts=True,
        )
        tt = lambda a: torch.from_numpy(np.asarray(a))  # noqa: E731
        fake = _types.SimpleNamespace(
            joints=tt(out.joints), body_pose=tt(out.body_pose),
            betas=tt(params.betas), expression=tt(params.expression),
            jaw_pose=tt(params.jaw_pose),
            left_hand_pose=tt(params.left_hand_pose),
            right_hand_pose=tt(params.right_hand_pose),
            full_pose=torch.cat(
                [torch.zeros(1, 3), tt(out.body_pose)], dim=1),
            vertices=None,
        )
        cam = ref.camera.PerspectiveCamera(
            rotation=torch.eye(3)[None],
            translation=tt(cam_t),
            focal_length_x=tt(frame.focal[0:1]),
            focal_length_y=tt(frame.focal[1:2]),
            center=tt(frame.center)[None],
            batch_size=1,
        )
        return fake, cam, np.asarray(body_raw[0])

    def _ref_loss(self, ref, has_reg, reg_pose, num_stages,
                  body_prior=None):
        L2 = ref.prior.L2Prior
        return ref.fitting.SMPLifyLoss(
            rho=100.0,
            body_pose_prior=body_prior if body_prior is not None else L2(),
            shape_prior=L2(), expr_prior=L2(),
            angle_prior=ref.prior.SMPLifyAnglePrior(), jaw_prior=L2(),
            use_joints_conf=True, use_face=True, use_hands=True,
            left_hand_prior=L2(), right_hand_prior=L2(),
            interpenetration=False,
            regression_pose=(torch.from_numpy(reg_pose)[None]
                             if has_reg else None),
            num_stages=num_stages,
        )

    # weights each term owns; isolating a reference term = zeroing every
    # OTHER term's weights and running the ACTUAL SMPLifyLoss.forward
    TERM_WEIGHTS = {
        "data": ("data_weight",),
        "pose_prior": ("body_pose_weight",),
        "shape": ("shape_weight",),
        "bending": ("bending_prior_weight",),
        "hands": ("hand_prior_weight",),
        "expression": ("expr_prior_weight",),
        "jaw": ("jaw_prior_weight",),
    }
    ALL_TERM_WEIGHTS = tuple(
        w for ws in TERM_WEIGHTS.values() for w in ws
    )

    def _ref_eval(self, loss, wdict, fake, cam, frame, base_jw, stage,
                  settings, pe):
        """Evaluate the reference SMPLifyLoss with the given weight dict."""
        loss.reset_loss_weights(wdict)
        nb = settings.num_body_kp
        jw = base_jw.copy()
        jw[nb:nb + 42] = wdict.get("hand_weight", 1.0)
        jw[nb + 42:] = wdict.get("face_weight", 1.0)
        with torch.no_grad():
            return loss(
                fake, cam,
                gt_joints=torch.from_numpy(
                    np.asarray(frame.gt_joints))[None],
                joints_conf=torch.from_numpy(np.asarray(frame.conf))[None],
                body_model_faces=None,
                joint_weights=torch.from_numpy(jw)[None],
                stage=stage, use_vposer=settings.use_vposer,
                pose_embedding=pe,
            ).item()

    def _compare_stage(self, ref, settings, model, joint_map, decode, x,
                       frame, base_jw, wdict, our_w, stage, num_stages,
                       loss, rtol=1e-4):
        import jax.numpy as jnp

        from smplifyx_tpu.fitting.energy import smplify_energy_terms

        # --- ours: full per-term breakdown
        our_terms = {
            k: float(v) for k, v in smplify_energy_terms(
                jnp.asarray(x), settings, model, frame, our_w,
                jnp.asarray(stage), num_stages, decode, joint_map,
            ).items()
        }
        ours = sum(our_terms.values())

        # --- reference: stage total, then each term isolated by zeroing
        # every other weight through the actual forward
        fake, cam, body_raw = self._fake_output_and_camera(
            ref, settings, model, joint_map, decode, x, frame)
        pe = torch.from_numpy(body_raw)[None]
        ref_total = self._ref_eval(loss, wdict, fake, cam, frame, base_jw,
                                   stage, settings, pe)
        np.testing.assert_allclose(ours, ref_total, rtol=rtol,
                                   atol=1e-3), (ours, ref_total)

        ref_terms = {}
        for term, own in self.TERM_WEIGHTS.items():
            iso = dict(wdict)
            for wname in self.ALL_TERM_WEIGHTS:
                if wname in own:
                    continue
                iso[wname] = ([0.0] * 3 if wname == "jaw_prior_weight"
                              else 0.0)
            ref_terms[term] = self._ref_eval(
                loss, iso, fake, cam, frame, base_jw, stage, settings, pe)
            np.testing.assert_allclose(
                our_terms[term], ref_terms[term], rtol=rtol, atol=1e-3,
                err_msg=f"term {term!r} at stage {stage}")
        # restore the stage weights on the shared loss module
        loss.reset_loss_weights(wdict)
        return ours, ref_total

    @pytest.mark.parametrize("preset", sorted(PRESETS))
    def test_preset_all_stages(self, ref, preset):
        from smplifyx_tpu.fitting.stages import build_stage_schedule
        import jax.tree_util as jtu

        info = self.PRESETS[preset]
        lists = self._preset_lists(preset)
        S = len(lists["body"])
        settings, model, joint_map, decode, x, frame, base_jw = \
            self._make_problem(info["fmt"], info["nb"], info["use_vposer"],
                               info["has_reg"], seed=11)
        if info["has_reg"]:
            reg = np.asarray(frame.regression_body)
        else:
            reg = None
        loss = self._ref_loss(ref, info["has_reg"], reg, S)
        schedule = build_stage_schedule(
            body_pose_prior_weights=lists["body"],
            shape_weights=lists["shape"], expr_weights=lists["expr"],
            hand_pose_prior_weights=lists["hand_prior"],
            jaw_pose_prior_weights=lists["jaw"],
            hand_joints_weights=lists["hand_joints"],
            face_joints_weights=lists["face_joints"],
            coll_loss_weights=[0.0] * S,
        )
        for s in range(S):
            wdict = {
                "data_weight": 1000.0 / 600.0,
                "body_pose_weight": lists["body"][s],
                "shape_weight": lists["shape"][s],
                "bending_prior_weight": 3.17 * lists["body"][s],
                "hand_prior_weight": lists["hand_prior"][s],
                "expr_prior_weight": lists["expr"][s],
                "jaw_prior_weight": lists["jaw"][s],
                "hand_weight": lists["hand_joints"][s],
                "face_weight": lists["face_joints"][s],
            }
            our_w = jtu.tree_map(lambda a: a[s], schedule)
            self._compare_stage(
                ref, settings, model, joint_map, decode, x, frame, base_jw,
                wdict, our_w, s, S, loss)

    def test_term_isolation(self, ref):
        """One weight at a time: pins each term's scaling independently
        (squared vs not, conf^2, jaw elementwise) so a future regression
        points at the exact term, not just the total."""
        from smplifyx_tpu.fitting.energy import StageWeights

        settings, model, joint_map, decode, x, frame, base_jw = \
            self._make_problem("coco25", 25, False, False, seed=23)
        loss = self._ref_loss(ref, False, None, 2)
        zero = dict(data_weight=0.0, body_pose_weight=0.0, shape_weight=0.0,
                    bending_prior_weight=0.0, hand_prior_weight=0.0,
                    expr_prior_weight=0.0, jaw_prior_weight=[0.0] * 3,
                    hand_weight=1.0, face_weight=1.0)
        cases = {
            "data": dict(data_weight=1000.0 / 600.0),
            "body_l2": dict(body_pose_weight=2.0),
            "shape": dict(shape_weight=3.0),
            "bending": dict(bending_prior_weight=1.5),
            "hands": dict(hand_prior_weight=2.5),
            "expr": dict(expr_prior_weight=4.0),
            "jaw": dict(jaw_prior_weight=[1.0, 2.0, 3.0]),
        }
        for name, upd in cases.items():
            wdict = dict(zero, **upd)
            our_w = StageWeights.single(
                body=wdict["body_pose_weight"], shape=wdict["shape_weight"],
                bending=wdict["bending_prior_weight"],
                hand_prior=wdict["hand_prior_weight"],
                expr=wdict["expr_prior_weight"], jaw=wdict["jaw_prior_weight"],
                hand=wdict["hand_weight"], face=wdict["face_weight"],
            )
            fr = frame.replace(
                data_weight=frame.data_weight * 0 + wdict["data_weight"])
            ours, rv = self._compare_stage(
                ref, settings, model, joint_map, decode, x, fr, base_jw,
                wdict, our_w, 0, 2, loss)
            assert name == "data" or ours != 0.0 or name in (), \
                f"term {name} compared trivially at zero"

    def test_gmm_body_prior_path(self, ref, tmp_path):
        """The no-vposer/no-regression path routes the body pose through the
        GMM NLL (fitting.py:399-401) — checked on a 63-dim synthetic GMM."""
        import jax.tree_util as jtu

        from smplifyx_tpu.fitting.stages import build_stage_schedule
        from smplifyx_tpu.priors.priors import load_gmm_pickle

        means, covs, weights = _synthetic_gmm_arrays(K=8, D=63, seed=5)
        pkl = tmp_path / "gmm_08.pkl"
        with open(pkl, "wb") as f:
            pickle.dump({"means": means, "covars": covs,
                         "weights": weights}, f)
        ref_gmm = ref.prior.MaxMixturePrior(prior_folder=str(tmp_path),
                                            num_gaussians=8, use_merged=True)
        our_gmm = load_gmm_pickle(str(pkl))

        settings, model, joint_map, decode, x, frame, base_jw = \
            self._make_problem("coco25", 25, False, False, seed=31,
                               body_prior_type="gmm")
        S = 2
        loss = self._ref_loss(ref, False, None, S, body_prior=ref_gmm)
        schedule = build_stage_schedule(
            body_pose_prior_weights=[404.0, 57.4],
            shape_weights=[100.0, 10.0], expr_weights=[100.0, 10.0],
            hand_pose_prior_weights=[100.0, 10.0],
            hand_joints_weights=[0.0, 1.0], face_joints_weights=[0.0, 1.0],
            coll_loss_weights=[0.0, 0.0],
        )
        import jax.numpy as jnp

        from smplifyx_tpu.fitting.energy import smplify_energy

        for s in range(S):
            wdict = {
                "data_weight": 1000.0 / 600.0,
                "body_pose_weight": [404.0, 57.4][s],
                "shape_weight": [100.0, 10.0][s],
                "bending_prior_weight": 3.17 * [404.0, 57.4][s],
                "hand_prior_weight": [100.0, 10.0][s],
                "expr_prior_weight": [100.0, 10.0][s],
                "jaw_prior_weight": [[100.0] * 3, [10.0] * 3][s],
                "hand_weight": [0.0, 1.0][s],
                "face_weight": [0.0, 1.0][s],
            }
            our_w = jtu.tree_map(lambda a: a[s], schedule)
            ours = float(smplify_energy(
                jnp.asarray(x), settings, model, frame, our_w,
                jnp.asarray(s), S, decode, joint_map, gmm=our_gmm,
            ))
            fake, cam, _ = self._fake_output_and_camera(
                ref, settings, model, joint_map, decode, x, frame)
            loss.reset_loss_weights(wdict)
            jw = base_jw.copy()
            jw[25:67] = wdict["hand_weight"]
            jw[67:] = wdict["face_weight"]
            with torch.no_grad():
                rv = loss(
                    fake, cam,
                    gt_joints=torch.from_numpy(
                        np.asarray(frame.gt_joints))[None],
                    joints_conf=torch.from_numpy(
                        np.asarray(frame.conf))[None],
                    body_model_faces=None,
                    joint_weights=torch.from_numpy(jw)[None],
                    stage=s, use_vposer=False, pose_embedding=None,
                ).item()
            # GMM NLL itself matches at ~2e-3 (merged-path log-sum ordering)
            np.testing.assert_allclose(ours, rv, rtol=3e-3, atol=1e-2)


# ---------------------------------------------------------------------------
# Camera-init energy differential
# ---------------------------------------------------------------------------

class TestCameraInitLossParity:
    """camera_init_energy vs the reference's SMPLifyCameraInitLoss
    (fitting.py:464-520), both conf modes, through the ACTUAL torch
    module — completing the stage-0 leg of the energy differential.

    The reference's use_conf=True path carries a broadcast quirk: the
    already-[1,J,1] conf tensor is unsqueezed AGAIN before squaring, so
    the conf^2 factor outer-products against the per-joint error and the
    term becomes sum(err) * sum(conf^2) (a global scale, not per-joint
    weighting).  camera_conf_mode='global_scale' reproduces it bug-for-bug
    and this test pins that against the real module.
    """

    INIT_IDXS = [9, 12, 2, 5]

    def _setup(self, conf_mode, seed=37):
        import jax.numpy as jnp

        from smplifyx_tpu.fitting.params import FitSettings

        h = TestSMPLifyLossParity()
        settings, model, joint_map, decode, x, frame, base_jw = \
            h._make_problem("coco25", 25, False, False, seed=seed)
        settings = FitSettings(
            use_vposer=False, has_regression_prior=False,
            use_face_contour=True, num_body_kp=25,
            body_prior_type="l2", camera_conf_mode=conf_mode,
        )
        K = int(frame.conf.shape[0])
        mask = np.zeros((K,), np.float32)
        mask[self.INIT_IDXS] = 1.0
        frame = frame.replace(
            init_joints_mask=jnp.asarray(mask),
            trans_estimation=jnp.asarray([0.0, 0.0, 4.2], jnp.float32),
            depth_loss_weight=jnp.asarray(100.0, jnp.float32),
        )
        return h, settings, model, joint_map, decode, x, frame

    @pytest.mark.parametrize("conf_mode,use_conf", [
        ("none", False), ("global_scale", True),
    ])
    def test_matches_reference(self, ref, conf_mode, use_conf):
        import jax.numpy as jnp

        from smplifyx_tpu.fitting.energy import camera_init_energy

        h, settings, model, joint_map, decode, x, frame = \
            self._setup(conf_mode)
        ours = float(camera_init_energy(
            jnp.asarray(x), settings, model, frame, decode, joint_map,
        ))

        fake, cam, _ = h._fake_output_and_camera(
            ref, settings, model, joint_map, decode, x, frame)
        loss = ref.fitting.SMPLifyCameraInitLoss(
            init_joints_idxs=torch.tensor(self.INIT_IDXS, dtype=torch.long),
            trans_estimation=torch.from_numpy(np.asarray(
                frame.trans_estimation, np.float32))[None],
            data_weight=float(frame.data_weight),
            depth_loss_weight=float(frame.depth_loss_weight),
            joints_conf=torch.from_numpy(np.asarray(frame.conf))[None],
            use_conf=use_conf,
        )
        with torch.no_grad():
            rv = loss(
                fake, cam,
                gt_joints=torch.from_numpy(
                    np.asarray(frame.gt_joints))[None],
            ).item()
        np.testing.assert_allclose(ours, rv, rtol=1e-4, atol=1e-3)
        assert ours != 0.0

    def test_depth_term_moves(self, ref):
        """The depth regularizer must respond to cam_t z exactly like the
        reference's (weight^2 * squared depth gap)."""
        import jax.numpy as jnp

        from smplifyx_tpu.fitting.energy import camera_init_energy

        h, settings, model, joint_map, decode, x, frame = \
            self._setup("none")
        x2 = x.copy()
        x2[2] = 6.0  # move depth away from trans_estimation z
        vals = []
        for xv in (x, x2):
            ours = float(camera_init_energy(
                jnp.asarray(xv), settings, model, frame, decode, joint_map,
            ))
            fake, cam, _ = h._fake_output_and_camera(
                ref, settings, model, joint_map, decode, xv, frame)
            loss = ref.fitting.SMPLifyCameraInitLoss(
                init_joints_idxs=torch.tensor(self.INIT_IDXS, dtype=torch.long),
                trans_estimation=torch.from_numpy(np.asarray(
                    frame.trans_estimation, np.float32))[None],
                data_weight=float(frame.data_weight),
                depth_loss_weight=float(frame.depth_loss_weight),
                use_conf=False,
            )
            with torch.no_grad():
                rv = loss(fake, cam, gt_joints=torch.from_numpy(
                    np.asarray(frame.gt_joints))[None]).item()
            np.testing.assert_allclose(ours, rv, rtol=1e-4, atol=1e-3)
            vals.append(ours)
        assert vals[1] != vals[0]
