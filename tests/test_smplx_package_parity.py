"""Differential validation of the SMPL-X forward against an INDEPENDENT
torch oracle implementing the public `smplx` package's published algorithm.

VERDICT round-2 item 2: every golden in test_smplx_forward.py is derived
from this repo's own numpy; a convention that silently diverged from the
real `smplx` package (posedirs reshape order, expression column offset,
hand-mean addition, landmark ordering, neck-chain composition for contour
bucketing) would pass those tests and still produce wrong meshes on real
artifacts.  The real package cannot be installed here (zero egress), so
this file re-implements its forward FROM THE PUBLISHED ALGORITHM (smplx
lbs.py / body_models.py semantics, as driven by the reference at
main.py:109-127 and fitting.py:248-250) in torch/f64, structured like the
upstream code and sharing NOTHING with smplifyx_tpu/models/forward.py, then
compares both on a synthetic artifact written in the exact npz layout at
the real SMPL-X scale (V=10475 so the real vertex-id/landmark tables are
exercised unclamped).

If `smplx` ever becomes importable in the environment, TestAgainstInstalled
runs the same comparison against the actual package as well.
"""

import os.path as osp

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from smplifyx_tpu.models.bodymodel import (
    NUM_VERTS, NUM_FACES, SMPLX_PARENTS, SMPLX_EXTRA_JOINT_VIDS,
    load_body_model,
)
from smplifyx_tpu.models.forward import BodyParams, smplx_forward

pytestmark = pytest.mark.slow  # full-scale artifact, ~1 min total

V, F, J = NUM_VERTS, NUM_FACES, 55
NUM_POSE_FEATS = (J - 1) * 9


# ---------------------------------------------------------------------------
# Synthetic artifact in the REAL npz layout
# ---------------------------------------------------------------------------

def _write_real_layout_npz(path, seed=0):
    rng = np.random.default_rng(seed)
    kintree = np.stack([
        SMPLX_PARENTS.astype(np.int64), np.arange(J, dtype=np.int64)
    ])
    kintree[0, 0] = 2**32 - 1  # stored as uint32 -1 in the real artifact
    # A smooth-ish template (scaled sphere) so rest joints are plausible.
    t = rng.normal(size=(V, 3)) * 0.3
    # J_regressor rows: sparse convex weights, like the real regressor.
    J_reg = np.zeros((J, V))
    for j in range(J):
        ids = rng.choice(V, size=16, replace=False)
        w = rng.dirichlet(np.ones(16))
        J_reg[j, ids] = w
    np.savez(
        path,
        v_template=t,
        shapedirs=rng.normal(size=(V, 3, 400)) * 0.01,  # 300 shape + 100 expr
        posedirs=rng.normal(size=(V, 3, NUM_POSE_FEATS)) * 0.001,
        J_regressor=J_reg,
        weights=rng.dirichlet(np.ones(J), size=V),
        kintree_table=kintree,
        f=rng.integers(0, V, (F, 3)).astype(np.uint32),
        hands_componentsl=rng.normal(size=(45, 45)) * 0.1,
        hands_componentsr=rng.normal(size=(45, 45)) * 0.1,
        hands_meanl=rng.normal(size=45) * 0.05,
        hands_meanr=rng.normal(size=45) * 0.05,
        lmk_faces_idx=rng.integers(0, F, 51).astype(np.int64),
        lmk_bary_coords=rng.dirichlet(np.ones(3), 51),
        dynamic_lmk_faces_idx=rng.integers(0, F, (79, 17)).astype(np.int64),
        dynamic_lmk_bary_coords=rng.dirichlet(np.ones(3), (79, 17)),
    )


# ---------------------------------------------------------------------------
# Torch oracle: the published smplx algorithm, written independently
# ---------------------------------------------------------------------------

def _rodrigues(aa):
    """[N, 3] axis-angle -> [N, 3, 3] (Rodrigues' formula, f64)."""
    angle = torch.norm(aa + 1e-8, dim=1, keepdim=True)
    rot_dir = aa / angle
    cos = torch.cos(angle)[:, None]
    sin = torch.sin(angle)[:, None]
    rx, ry, rz = torch.split(rot_dir, 1, dim=1)
    zeros = torch.zeros_like(rx)
    K = torch.cat(
        [zeros, -rz, ry, rz, zeros, -rx, -ry, rx, zeros], dim=1
    ).view(-1, 3, 3)
    ident = torch.eye(3, dtype=aa.dtype)[None]
    return ident + sin * K + (1 - cos) * torch.bmm(K, K)


class SMPLXOracle:
    """Mirror of smplx.SMPLX's forward (lbs + landmarks), f64 torch."""

    NECK_CHAIN = [15, 12, 9, 6, 3, 0]  # head -> root ancestor chain

    def __init__(self, npz_path, num_betas=10, num_expr=10, num_pca=12,
                 flat_hand_mean=False):
        d = np.load(npz_path)
        f64 = lambda a: torch.tensor(np.asarray(a), dtype=torch.float64)
        self.v_template = f64(d["v_template"])
        sd = np.asarray(d["shapedirs"])
        # the real layout packs 300 shape + 100 expression columns
        self.shapedirs = f64(sd[:, :, :num_betas])
        self.exprdirs = f64(sd[:, :, 300:300 + num_expr])
        pd = np.asarray(d["posedirs"])
        # smplx: posedirs.reshape(-1, posedirs.shape[-1]).T  -> [P, V*3]
        self.posedirs = f64(pd.reshape(-1, pd.shape[-1]).T)
        self.J_regressor = f64(d["J_regressor"])
        self.lbs_weights = f64(d["weights"])
        parents = np.asarray(d["kintree_table"][0]).astype(np.int64)
        parents[0] = -1
        self.parents = parents
        self.faces = torch.tensor(
            np.asarray(d["f"]).astype(np.int64)
        )
        self.hand_comp_l = f64(d["hands_componentsl"][:num_pca])
        self.hand_comp_r = f64(d["hands_componentsr"][:num_pca])
        self.hand_mean_l = f64(d["hands_meanl"])
        self.hand_mean_r = f64(d["hands_meanr"])
        self.flat_hand_mean = flat_hand_mean
        self.lmk_faces_idx = torch.tensor(
            np.asarray(d["lmk_faces_idx"]).astype(np.int64))
        self.lmk_bary = f64(d["lmk_bary_coords"])
        self.dyn_lmk_faces_idx = torch.tensor(
            np.asarray(d["dynamic_lmk_faces_idx"]).astype(np.int64))
        self.dyn_lmk_bary = f64(d["dynamic_lmk_bary_coords"])
        self.extra_joint_idxs = torch.tensor(
            SMPLX_EXTRA_JOINT_VIDS.astype(np.int64))

    # --- smplx.lbs.batch_rigid_transform
    def _rigid_transform(self, rot_mats, joints):
        B = rot_mats.shape[0]
        rel_joints = joints.clone()
        rel_joints[:, 1:] -= joints[:, self.parents[1:]]
        tm = torch.cat([rot_mats, rel_joints[..., None]], dim=-1)  # [B,J,3,4]
        bottom = torch.tensor([0.0, 0.0, 0.0, 1.0], dtype=tm.dtype)
        tm = torch.cat(
            [tm, bottom.expand(B, joints.shape[1], 1, 4)], dim=-2
        )
        chain = [tm[:, 0]]
        for i in range(1, joints.shape[1]):
            chain.append(torch.matmul(chain[self.parents[i]], tm[:, i]))
        transforms = torch.stack(chain, dim=1)
        posed_joints = transforms[:, :, :3, 3]
        # A = T - pack(T @ [j; 0])
        jh = torch.cat([joints, torch.zeros_like(joints[..., :1])], dim=-1)
        corr = torch.matmul(transforms, jh[..., None])
        A = transforms.clone()
        A[..., 3:] -= corr
        return posed_joints, A

    # --- smplx.lbs.find_dynamic_lmk_idx_and_bcoords
    def _dynamic_lmk(self, full_pose_aa):
        B = full_pose_aa.shape[0]
        aa = full_pose_aa.view(B, -1, 3)[:, self.NECK_CHAIN]  # [B, C, 3]
        rot_mats = _rodrigues(aa.reshape(-1, 3)).view(B, -1, 3, 3)
        rel = torch.eye(3, dtype=full_pose_aa.dtype).expand(B, 3, 3).clone()
        for idx in range(len(self.NECK_CHAIN)):
            rel = torch.bmm(rot_mats[:, idx], rel)
        # smplx: key = -rot_mat_to_euler(rel), rot_mat_to_euler = atan2(
        # -rel[2,0], sy) => key = atan2(+rel[2,0], sy).  (An earlier oracle
        # used -asin(rel[2,0]) — the same sign flip as the bug it was meant
        # to catch.)
        sy = torch.sqrt(rel[:, 0, 0] ** 2 + rel[:, 1, 0] ** 2)
        y_deg = torch.clamp(
            torch.rad2deg(torch.atan2(rel[:, 2, 0], sy)), max=39.0
        ).round().to(torch.long)
        neg = y_deg.lt(0).to(torch.long)
        big_neg = y_deg.lt(-39).to(torch.long)
        neg_vals = big_neg * 78 + (1 - big_neg) * (39 - y_deg)
        y_idx = neg * neg_vals + (1 - neg) * y_deg
        return self.dyn_lmk_faces_idx[y_idx], self.dyn_lmk_bary[y_idx]

    # --- smplx.lbs.vertices2landmarks
    def _vertices2landmarks(self, vertices, lmk_faces_idx, lmk_bary):
        B = vertices.shape[0]
        lmk_faces = self.faces[lmk_faces_idx.reshape(-1)].reshape(B, -1, 3)
        lmk_verts = torch.stack([
            vertices[b, lmk_faces[b]] for b in range(B)
        ])  # [B, L, 3, 3]
        return torch.einsum("blfi,blf->bli", lmk_verts, lmk_bary)

    def forward(self, betas, expression, global_orient, body_pose, jaw_pose,
                leye_pose, reye_pose, left_hand_pca, right_hand_pca,
                use_face_contour=True):
        B = betas.shape[0]
        lhand = left_hand_pca @ self.hand_comp_l
        rhand = right_hand_pca @ self.hand_comp_r
        full_pose = torch.cat([
            global_orient, body_pose, jaw_pose, leye_pose, reye_pose,
            lhand, rhand,
        ], dim=1)
        if not self.flat_hand_mean:
            # smplx adds pose_mean (zeros outside the hand segments)
            pose_mean = torch.cat([
                torch.zeros(3 + 63 + 9, dtype=torch.float64),
                self.hand_mean_l, self.hand_mean_r,
            ])
            full_pose = full_pose + pose_mean

        shape_comps = torch.cat([betas, expression], dim=-1)
        shape_dirs = torch.cat([self.shapedirs, self.exprdirs], dim=-1)
        v_shaped = self.v_template + torch.einsum(
            "bl,mkl->bmk", shape_comps, shape_dirs
        )
        joints_rest = torch.einsum("jv,bvk->bjk", self.J_regressor, v_shaped)
        rot_mats = _rodrigues(full_pose.reshape(-1, 3)).view(B, J, 3, 3)
        ident = torch.eye(3, dtype=torch.float64)
        pose_feature = (rot_mats[:, 1:] - ident).view(B, -1)
        v_posed = v_shaped + torch.matmul(
            pose_feature, self.posedirs
        ).view(B, -1, 3)
        posed_joints, A = self._rigid_transform(rot_mats, joints_rest)
        W = self.lbs_weights[None].expand(B, -1, -1)
        T = torch.matmul(W, A.view(B, J, 16)).view(B, -1, 4, 4)
        v_hom = torch.cat(
            [v_posed, torch.ones(B, v_posed.shape[1], 1, dtype=torch.float64)],
            dim=2,
        )
        vertices = torch.matmul(T, v_hom[..., None])[..., :3, 0]

        # landmarks: static (+ dynamic contour appended), then
        # joints = [skeleton, vertex-selected extras, landmarks]
        lmk_faces_idx = self.lmk_faces_idx[None].expand(B, -1)
        lmk_bary = self.lmk_bary[None].expand(B, -1, -1)
        if use_face_contour:
            dyn_faces, dyn_bary = self._dynamic_lmk(full_pose)
            lmk_faces_idx = torch.cat([lmk_faces_idx, dyn_faces], dim=1)
            lmk_bary = torch.cat([lmk_bary, dyn_bary], dim=1)
        landmarks = self._vertices2landmarks(vertices, lmk_faces_idx, lmk_bary)
        extra = vertices[:, self.extra_joint_idxs]
        joints = torch.cat([posed_joints, extra, landmarks], dim=1)
        return vertices, joints


# ---------------------------------------------------------------------------
# The comparison
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def artifact(tmp_path_factory):
    p = tmp_path_factory.mktemp("smplx") / "SMPLX_NEUTRAL.npz"
    _write_real_layout_npz(str(p))
    return str(p)


def _random_params(B, seed, pose_scale=0.3, num_pca=12):
    rng = np.random.default_rng(seed)
    return dict(
        betas=rng.normal(0, 1.0, (B, 10)),
        expression=rng.normal(0, 1.0, (B, 10)),
        global_orient=rng.normal(0, pose_scale, (B, 3)),
        body_pose=rng.normal(0, pose_scale, (B, 63)),
        jaw_pose=rng.normal(0, 0.1, (B, 3)),
        leye_pose=rng.normal(0, 0.1, (B, 3)),
        reye_pose=rng.normal(0, 0.1, (B, 3)),
        left_hand_pca=rng.normal(0, 0.5, (B, num_pca)),
        right_hand_pca=rng.normal(0, 0.5, (B, num_pca)),
    )


def _run_both(artifact, p, flat_hand_mean, use_face_contour):
    oracle = SMPLXOracle(artifact, flat_hand_mean=flat_hand_mean)
    ov, oj = oracle.forward(
        **{k: torch.tensor(v, dtype=torch.float64) for k, v in p.items()},
        use_face_contour=use_face_contour,
    )
    model = load_body_model(artifact, "smplx")
    params = BodyParams(
        global_orient=jnp.asarray(p["global_orient"], jnp.float32),
        body_pose=jnp.asarray(p["body_pose"], jnp.float32),
        betas=jnp.asarray(p["betas"], jnp.float32),
        expression=jnp.asarray(p["expression"], jnp.float32),
        jaw_pose=jnp.asarray(p["jaw_pose"], jnp.float32),
        leye_pose=jnp.asarray(p["leye_pose"], jnp.float32),
        reye_pose=jnp.asarray(p["reye_pose"], jnp.float32),
        left_hand_pose=jnp.asarray(p["left_hand_pca"], jnp.float32),
        right_hand_pose=jnp.asarray(p["right_hand_pca"], jnp.float32),
    )
    out = smplx_forward(
        model, params, use_pca=True, flat_hand_mean=flat_hand_mean,
        use_face_contour=use_face_contour,
    )
    return (np.asarray(ov), np.asarray(oj),
            np.asarray(out.vertices), np.asarray(out.joints))


TOL = 1e-4  # f32 vs f64 oracle at |v| ~ 1


class TestForwardParity:
    def test_rest_pose(self, artifact):
        p = _random_params(2, 0, pose_scale=0.0)
        for k in ("global_orient", "body_pose", "jaw_pose", "leye_pose",
                  "reye_pose", "left_hand_pca", "right_hand_pca"):
            p[k] = np.zeros_like(p[k])
        ov, oj, v, j = _run_both(artifact, p, False, True)
        np.testing.assert_allclose(v, ov, atol=TOL)
        np.testing.assert_allclose(j, oj, atol=TOL)

    def test_posed_shaped_expressive(self, artifact):
        ov, oj, v, j = _run_both(artifact, _random_params(3, 1), False, True)
        assert j.shape == oj.shape == (3, 144, 3)
        np.testing.assert_allclose(v, ov, atol=TOL)
        np.testing.assert_allclose(j, oj, atol=TOL)

    def test_flat_hand_mean(self, artifact):
        ov, oj, v, j = _run_both(artifact, _random_params(2, 2), True, True)
        np.testing.assert_allclose(v, ov, atol=TOL)
        np.testing.assert_allclose(j, oj, atol=TOL)

    def test_no_face_contour(self, artifact):
        ov, oj, v, j = _run_both(artifact, _random_params(2, 3), False, False)
        assert j.shape == oj.shape == (2, 127, 3)
        np.testing.assert_allclose(j, oj, atol=TOL)

    def test_contour_bucketing_across_head_yaws(self, artifact):
        """Large global/neck yaws drive the dynamic-landmark bucket index;
        both implementations must pick the SAME buckets (this is where a
        neck-chain composition-order bug shows up)."""
        B = 7
        p = _random_params(B, 4, pose_scale=0.0)
        yaws = np.linspace(-1.2, 1.2, B)  # +-69 degrees
        p["global_orient"] = np.stack(
            [np.zeros(B), yaws, np.zeros(B)], axis=1
        )
        # add neck/head articulation on top
        rng = np.random.default_rng(5)
        bp = np.zeros((B, 63))
        bp[:, 33 + 1] = rng.uniform(-0.4, 0.4, B)  # joint 12 (neck) y
        bp[:, 42 + 1] = rng.uniform(-0.4, 0.4, B)  # joint 15 (head) y
        p["body_pose"] = bp
        ov, oj, v, j = _run_both(artifact, p, False, True)
        np.testing.assert_allclose(j[:, 127:], oj[:, 127:], atol=TOL)


HAS_SMPLX = False
try:  # pragma: no cover - environment-dependent
    import smplx  # noqa: F401

    HAS_SMPLX = True
except ImportError:
    pass


@pytest.mark.skipif(not HAS_SMPLX, reason="smplx package not installed")
class TestAgainstInstalled:
    def test_installed_package_matches(self, artifact, tmp_path):
        import smplx as smplx_pkg

        layout = tmp_path / "models" / "smplx"
        layout.mkdir(parents=True)
        import shutil

        shutil.copy(artifact, layout / "SMPLX_NEUTRAL.npz")
        body = smplx_pkg.create(
            str(tmp_path / "models"), model_type="smplx", gender="neutral",
            num_betas=10, num_expression_coeffs=10, num_pca_comps=12,
            use_pca=True, use_face_contour=True,
        )
        p = _random_params(2, 6)
        t = {k: torch.tensor(v, dtype=torch.float32) for k, v in p.items()}
        out = body(
            betas=t["betas"], expression=t["expression"],
            global_orient=t["global_orient"], body_pose=t["body_pose"],
            jaw_pose=t["jaw_pose"], leye_pose=t["leye_pose"],
            reye_pose=t["reye_pose"], left_hand_pose=t["left_hand_pca"],
            right_hand_pose=t["right_hand_pca"], return_verts=True,
        )
        model = load_body_model(artifact, "smplx")
        params = BodyParams(
            global_orient=jnp.asarray(p["global_orient"], jnp.float32),
            body_pose=jnp.asarray(p["body_pose"], jnp.float32),
            betas=jnp.asarray(p["betas"], jnp.float32),
            expression=jnp.asarray(p["expression"], jnp.float32),
            jaw_pose=jnp.asarray(p["jaw_pose"], jnp.float32),
            leye_pose=jnp.asarray(p["leye_pose"], jnp.float32),
            reye_pose=jnp.asarray(p["reye_pose"], jnp.float32),
            left_hand_pose=jnp.asarray(p["left_hand_pca"], jnp.float32),
            right_hand_pose=jnp.asarray(p["right_hand_pca"], jnp.float32),
        )
        ours = smplx_forward(model, params, use_face_contour=True)
        np.testing.assert_allclose(
            np.asarray(ours.vertices),
            out.vertices.detach().numpy(), atol=5e-4,
        )
