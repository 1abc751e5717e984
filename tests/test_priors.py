import numpy as np
import jax.numpy as jnp

from smplifyx_tpu.priors import (
    GMMPrior, l2_prior, angle_prior, synthetic_gmm,
)


def np_gmm_nll(means, covs, weights, pose):
    """Independent numpy max-mixture NLL (merged path semantics)."""
    K, D = means.shape
    precs = np.stack([np.linalg.inv(c) for c in covs])
    sqrdets = np.array([np.sqrt(np.linalg.det(c)) for c in covs])
    # exponent hardcoded to 69 like the reference (prior.py:154) — a pure
    # constant NLL offset the implementation preserves for loss parity
    const = (2 * np.pi) ** (69 / 2.0)
    nll_w = weights / (const * (sqrdets / sqrdets.min()))
    lls = []
    for k in range(K):
        d = pose - means[k]
        lls.append(0.5 * d @ precs[k] @ d - np.log(nll_w[k]))
    return min(lls)


class TestGMM:
    def test_matches_numpy(self):
        rng = np.random.default_rng(0)
        K, D = 4, 12
        means = rng.normal(size=(K, D))
        covs = []
        for _ in range(K):
            A = rng.normal(size=(D, D)) * 0.1
            covs.append(A @ A.T + np.eye(D) * 0.5)
        covs = np.stack(covs)
        weights = rng.dirichlet(np.ones(K))

        from smplifyx_tpu.priors.priors import _gmm_from_arrays
        prior = _gmm_from_arrays(means, covs, weights)

        poses = rng.normal(size=(8, D)).astype(np.float32)
        got = np.asarray(prior(jnp.asarray(poses)))
        expect = np.array([np_gmm_nll(means, covs, weights, p) for p in poses])
        np.testing.assert_allclose(got, expect, rtol=2e-4)

    def test_mean_pose(self):
        prior = synthetic_gmm(num_components=3, dim=5, seed=1)
        mean = np.asarray(prior.mean_pose())
        expect = np.asarray(prior.weights) @ np.asarray(prior.means)
        np.testing.assert_allclose(mean, expect, rtol=1e-5)

    def test_min_at_component_mean(self):
        prior = synthetic_gmm(num_components=4, dim=6, seed=2)
        # NLL at a component's mean should be <= NLL at a far point
        at_mean = float(prior(prior.means[0][None])[0])
        far = float(prior(prior.means[0][None] + 100.0)[0])
        assert at_mean < far

    def test_pickle_roundtrip(self, tmp_path):
        import pickle
        rng = np.random.default_rng(3)
        K, D = 3, 8
        A = rng.normal(size=(K, D, D)) * 0.1
        covs = np.einsum("kij,klj->kil", A, A) + np.eye(D) * 0.4
        d = {
            "means": rng.normal(size=(K, D)),
            "covars": covs,
            "weights": rng.dirichlet(np.ones(K)),
        }
        p = tmp_path / "gmm_03.pkl"
        with open(p, "wb") as f:
            pickle.dump(d, f)
        from smplifyx_tpu.priors import load_gmm_pickle
        prior = load_gmm_pickle(str(p))
        pose = rng.normal(size=(2, D)).astype(np.float32)
        got = np.asarray(prior(jnp.asarray(pose)))
        expect = np.array(
            [np_gmm_nll(d["means"], d["covars"], d["weights"], q) for q in pose]
        )
        np.testing.assert_allclose(got, expect, rtol=2e-4)


class TestL2:
    def test_sum_of_squares(self):
        x = jnp.asarray([[1.0, 2.0], [3.0, 0.0]])
        np.testing.assert_allclose(np.asarray(l2_prior(x)), [5.0, 9.0])

    def test_multi_axis(self):
        x = jnp.ones((2, 3, 4))
        np.testing.assert_allclose(np.asarray(l2_prior(x)), [12.0, 12.0])


class TestAnglePrior:
    def test_known_values(self):
        pose = np.zeros((1, 66), dtype=np.float32)
        # without global pose: indices [52, 55, 9, 12]
        pose[0, 52] = 1.0   # sign +1 -> exp(1)^2
        pose[0, 55] = -1.0  # sign -1 -> exp(1)^2
        pose[0, 9] = 2.0    # sign -1 -> exp(-2)^2
        got = float(angle_prior(jnp.asarray(pose))[0])
        expect = np.exp(1) ** 2 + np.exp(1) ** 2 + np.exp(-2) ** 2 + 1.0
        np.testing.assert_allclose(got, expect, rtol=1e-5)

    def test_with_global(self):
        pose = np.zeros((1, 69), dtype=np.float32)
        pose[0, 55] = 1.0
        got = float(angle_prior(jnp.asarray(pose), with_global_pose=True)[0])
        expect = np.exp(1) ** 2 + 3.0
        np.testing.assert_allclose(got, expect, rtol=1e-5)

    def test_penalizes_hyperextension(self):
        # negative left-elbow value (sign +1): exp(negative) small = allowed
        bend = np.zeros((1, 66), dtype=np.float32)
        bend[0, 52] = -1.5
        hyper = np.zeros((1, 66), dtype=np.float32)
        hyper[0, 52] = 1.5
        assert float(angle_prior(jnp.asarray(hyper))[0]) > float(
            angle_prior(jnp.asarray(bend))[0]
        )


class TestHandJawPriorTypes:
    """'mog'/'gmm' hand priors + 'none' variants in the fitting energy
    (reference capability: left/right_hand_prior_type, jaw_prior_type —
    main.py:138-164; its factory rejects its own 'mog' default, so here
    'mog' aliases 'gmm' and actually works)."""

    def _energy(self, settings, lhand_gmm=None, rhand_gmm=None, x=None):
        import jax.numpy as jnp
        from smplifyx_tpu.fitting.energy import FrameData, smplify_energy
        from smplifyx_tpu.fitting.params import pack
        from smplifyx_tpu.fitting.stages import build_stage_schedule
        from smplifyx_tpu.models.bodymodel import synthetic_model
        from smplifyx_tpu.models.joint_mapping import model_to_annotation
        import jax

        model = synthetic_model(num_verts=64, seed=0)
        jm = jnp.asarray(model_to_annotation("smplx", True, True, True,
                                             "coco25"))
        K = jm.shape[0]
        rng = np.random.default_rng(0)
        if x is None:
            x = pack(
                settings,
                cam_t=jnp.asarray([[0.0, 0.0, 4.0]]),
                global_orient=jnp.zeros((1, 3)),
                body=jnp.zeros((1, 63)),
                lhand=jnp.asarray(rng.normal(0, 0.5, (1, 12)), jnp.float32),
                rhand=jnp.asarray(rng.normal(0, 0.5, (1, 12)), jnp.float32),
            )
        frame = FrameData(
            gt_joints=jnp.zeros((K, 2)), conf=jnp.ones(K),
            joint_weights=jnp.ones(K), focal=jnp.full(2, 1000.0),
            center=jnp.zeros(2), data_weight=jnp.asarray(0.0),
            init_joints_mask=jnp.zeros(K), trans_estimation=jnp.zeros(3),
            depth_loss_weight=jnp.asarray(0.0),
            regression_body=jnp.zeros(63),
        )
        sched = build_stage_schedule(
            [1.0], shape_weights=[0.0], expr_weights=[0.0],
            hand_pose_prior_weights=[2.0], hand_joints_weights=[0.0],
            face_joints_weights=[0.0],
        )
        w = jax.tree.map(lambda a: a[0], sched)
        val = jax.jit(lambda xx: smplify_energy(
            xx, settings, model, frame, w, jnp.asarray(0), 1,
            lambda b: b, jm, lhand_gmm=lhand_gmm, rhand_gmm=rhand_gmm,
        ))(x[0])
        return float(val), x

    def test_gmm_hand_prior_value(self):
        from smplifyx_tpu.fitting.params import FitSettings, unpack
        from smplifyx_tpu.priors.priors import synthetic_gmm

        hand_gmm = synthetic_gmm(num_components=4, dim=12, seed=7)
        base = FitSettings(use_face_contour=True)
        e_l2, x = self._energy(base)
        e_gmm, _ = self._energy(
            base.replace(left_hand_prior_type="gmm",
                         right_hand_prior_type="gmm"),
            lhand_gmm=hand_gmm, rhand_gmm=hand_gmm, x=x,
        )
        seg = unpack(base, x)
        expected_l2 = 4.0 * float(
            jnp.sum(seg["lhand"] ** 2) + jnp.sum(seg["rhand"] ** 2)
        )
        expected_gmm = 4.0 * float(
            hand_gmm(seg["lhand"]).sum() + hand_gmm(seg["rhand"]).sum()
        )
        np.testing.assert_allclose(e_gmm - e_l2, expected_gmm - expected_l2,
                                   rtol=1e-4, atol=1e-3)

    def test_none_disables_terms(self):
        from smplifyx_tpu.fitting.params import FitSettings, unpack

        base = FitSettings(use_face_contour=True)
        e_l2, x = self._energy(base)
        e_none, _ = self._energy(
            base.replace(left_hand_prior_type="none",
                         right_hand_prior_type="none"), x=x,
        )
        seg = unpack(base, x)
        expected = 4.0 * float(
            jnp.sum(seg["lhand"] ** 2) + jnp.sum(seg["rhand"] ** 2)
        )
        np.testing.assert_allclose(e_l2 - e_none, expected,
                                   rtol=1e-4, atol=1e-3)

    def test_mog_alias_normalization(self):
        from smplifyx_tpu.fitting.prepare import _norm_prior

        assert _norm_prior("mog") == "gmm"
        assert _norm_prior("MOG") == "gmm"
        assert _norm_prior("None") == "none"
        assert _norm_prior(None) == "none"
        assert _norm_prior("l2") == "l2"
