"""Data layer: keypoint JSON IO, blending + calibration, regression loaders.

Uses the reference demo fixtures (mounted read-only) when present, plus
self-contained synthetic fixtures so the suite passes anywhere.
"""

import json
import os

import numpy as np
import pytest

from smplifyx_tpu.data.blending import (
    blend_keypoints, calibrate_confidences, load_heuristics, pair_names,
    write_openpose_json, OPENPOSE_TOTAL, MMPOSE_TOTAL, MM_IDX, OP_IDX, IS_FACE,
)
from smplifyx_tpu.data.keypoints import (
    read_keypoints, create_dataset, KeypointFolderDataset,
)

REF_DEMO = "/root/reference/demo"


def make_openpose_json(path, num_people=1, seed=0):
    rng = np.random.default_rng(seed)
    people = []
    for _ in range(num_people):
        people.append({
            "person_id": [-1],
            "pose_keypoints_2d": rng.uniform(0, 100, 25 * 3).tolist(),
            "hand_left_keypoints_2d": rng.uniform(0, 100, 21 * 3).tolist(),
            "hand_right_keypoints_2d": rng.uniform(0, 100, 21 * 3).tolist(),
            "face_keypoints_2d": rng.uniform(0, 100, 70 * 3).tolist(),
        })
    with open(path, "w") as f:
        json.dump({"people": people}, f)


class TestReadKeypoints:
    def test_shapes(self, tmp_path):
        p = tmp_path / "img_keypoints.json"
        make_openpose_json(p, num_people=2)
        kp = read_keypoints(str(p), use_hands=True, use_face=True,
                            use_face_contour=True)
        assert kp.keypoints.shape == (2, 25 + 42 + 68, 3)

    def test_no_contour(self, tmp_path):
        p = tmp_path / "img_keypoints.json"
        make_openpose_json(p)
        kp = read_keypoints(str(p), use_hands=True, use_face=True,
                            use_face_contour=False)
        assert kp.keypoints.shape == (1, 25 + 42 + 51, 3)

    def test_face_slice_is_rows_17_to_68(self, tmp_path):
        p = tmp_path / "img_keypoints.json"
        make_openpose_json(p, seed=3)
        with open(p) as f:
            raw = np.asarray(
                json.load(f)["people"][0]["face_keypoints_2d"]
            ).reshape(-1, 3)
        kp = read_keypoints(str(p), use_hands=True, use_face=True,
                            use_face_contour=True).keypoints[0]
        np.testing.assert_allclose(kp[67:118], raw[17:68], rtol=1e-6)
        np.testing.assert_allclose(kp[118:135], raw[:17], rtol=1e-6)

    def test_reference_demo_fixture(self):
        if not os.path.isdir(REF_DEMO):
            pytest.skip("reference demo not mounted")
        fn = os.path.join(REF_DEMO, "keypoints", "18_cropped_blended.json")
        kp = read_keypoints(fn, use_hands=True, use_face=True,
                            use_face_contour=True)
        assert kp.keypoints.shape[0] >= 1
        assert kp.keypoints.shape[1] == 135


class TestDataset:
    def test_folder_dataset(self, tmp_path):
        (tmp_path / "images").mkdir()
        (tmp_path / "keypoints").mkdir()
        # 1x1 PNG
        import struct, zlib, binascii
        def tiny_png(path, w=7, h=5):
            sig = b"\x89PNG\r\n\x1a\n"
            ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
            def chunk(tag, data):
                c = tag + data
                return struct.pack(">I", len(data)) + c + struct.pack(
                    ">I", binascii.crc32(c) & 0xFFFFFFFF)
            raw = zlib.compress(b"".join(b"\x00" + b"\x00" * (3 * w)
                                          for _ in range(h)))
            with open(path, "wb") as f:
                f.write(sig + chunk(b"IHDR", ihdr) + chunk(b"IDAT", raw)
                        + chunk(b"IEND", b""))

        tiny_png(tmp_path / "images" / "a.png")
        make_openpose_json(tmp_path / "keypoints" / "a_keypoints.json")
        ds = create_dataset(
            format="coco25", data_folder=str(tmp_path),
            use_hands=True, use_face=True, use_face_contour=True,
            joints_to_ign=[1, 9, 12],
        )
        assert len(ds) == 1
        rec = ds[0]
        assert rec.fn == "a"
        assert rec.img_size == (5, 7)
        assert rec.keypoints.shape == (1, 135, 3)
        w = ds.get_joint_weights()
        assert w.shape == (135,)
        assert w[1] == 0 and w[9] == 0 and w[12] == 0 and w[0] == 1

    def test_shoulders_by_format(self, tmp_path):
        (tmp_path / "images").mkdir(); (tmp_path / "keypoints").mkdir()
        ds = KeypointFolderDataset(str(tmp_path), format="halpe")
        assert (ds.left_shoulder, ds.right_shoulder) == (5, 6)
        ds2 = KeypointFolderDataset(str(tmp_path), format="coco25")
        assert (ds2.left_shoulder, ds2.right_shoulder) == (2, 5)


class TestBlending:
    def _heuristics(self, tmp_path, seed=0):
        rng = np.random.default_rng(seed)
        names = pair_names()
        for key, (mu, sd) in {
            "openpose_means": (0.5, None), "openpose_stds": (None, 0.2),
            "mmpose_means": (0.7, None), "mmpose_stds": (None, 0.15),
        }.items():
            d = {}
            for n in names:
                if mu is not None:
                    d[n] = float(np.clip(rng.normal(mu, 0.05), 0.05, 0.95))
                else:
                    d[n] = float(np.clip(rng.normal(sd, 0.02), 0.05, 0.5))
            with open(tmp_path / (key + ".json"), "w") as f:
                json.dump(d, f)
        return load_heuristics(str(tmp_path))

    def test_calibration_formula(self):
        c = calibrate_confidences(
            np.asarray([0.7]), np.asarray([0.7]), np.asarray([0.15]),
            np.asarray([0.5]), np.asarray([0.2]),
        )
        np.testing.assert_allclose(c, [0.5])  # z=0 maps to openpose mean
        c2 = calibrate_confidences(
            np.asarray([0.85]), np.asarray([0.7]), np.asarray([0.15]),
            np.asarray([0.5]), np.asarray([0.2]),
        )
        np.testing.assert_allclose(c2, [0.7])  # +1 sigma maps to mean+sigma

    def test_face_always_openpose(self, tmp_path):
        heur = self._heuristics(tmp_path)
        rng = np.random.default_rng(1)
        op = rng.uniform(0, 1, (OPENPOSE_TOTAL, 3)).astype(np.float32)
        mm = rng.uniform(0, 1, (MMPOSE_TOTAL, 3)).astype(np.float32)
        mm[:, 2] = 10.0  # absurdly confident mmpose everywhere
        out = blend_keypoints(op, mm, heur)
        face_op_rows = OP_IDX[IS_FACE]
        np.testing.assert_allclose(
            out[face_op_rows, :2], op[face_op_rows, :2], rtol=1e-6
        )

    def test_higher_confidence_wins(self, tmp_path):
        heur = self._heuristics(tmp_path)
        op = np.zeros((OPENPOSE_TOTAL, 3), np.float32)
        mm = np.zeros((MMPOSE_TOTAL, 3), np.float32)
        op[:, :2] = 1.0
        mm[:, :2] = 2.0
        op[:, 2] = 0.9   # openpose very confident
        mm[:, 2] = 0.0   # mmpose not
        out = blend_keypoints(op, mm, heur)
        body_rows = OP_IDX[~IS_FACE]
        np.testing.assert_allclose(out[body_rows, :2], 1.0)

        op[:, 2] = 0.0
        mm[:, 2] = 1.0
        out2 = blend_keypoints(op, mm, heur)
        # calibrated mm conf is clipped to [0,1] and generally > 0 here
        assert (out2[body_rows, :2] == 2.0).mean() > 0.5

    def test_roundtrip_json(self, tmp_path):
        heur = self._heuristics(tmp_path)
        rng = np.random.default_rng(2)
        op = rng.uniform(0, 1, (OPENPOSE_TOTAL, 3)).astype(np.float32)
        mm = rng.uniform(0, 1, (MMPOSE_TOTAL, 3)).astype(np.float32)
        out = blend_keypoints(op, mm, heur)
        path = tmp_path / "x_blended.json"
        write_openpose_json(out, str(path))
        kp = read_keypoints(str(path), use_hands=True, use_face=True,
                            use_face_contour=True)
        assert kp.keypoints.shape == (1, 135, 3)


class TestRegressors:
    def test_expose_demo(self):
        if not os.path.isdir(REF_DEMO):
            pytest.skip("reference demo not mounted")
        from smplifyx_tpu.data.regressors import (
            load_expose, load_pixie, build_regression_prior,
        )
        expose = load_expose(os.path.join(REF_DEMO, "ExPose_results"), "18_cropped")
        pixie = load_pixie(os.path.join(REF_DEMO, "PIXIE_results"), "18_cropped")
        prior = build_regression_prior(
            "combined", focal_length=1498.0, expose=expose, pixie=pixie,
        )
        assert prior.body_pose.shape == (63,)
        assert prior.global_orient.shape == (3,)
        assert prior.init_translation is not None
        assert prior.init_translation[2] > 0  # in front of the camera
        assert np.isfinite(prior.body_pose).all()
        # Euler conversion must reproduce the rotations (sanity check via
        # rodrigues of converted euler ~ original matrix is NOT expected —
        # euler-xyz composition differs from axis-angle; only finiteness and
        # range are checked here, parity is covered in test_rotation.py).
        assert np.abs(prior.body_pose).max() < np.pi + 1e-3

    def test_pare_formula(self):
        from smplifyx_tpu.data.regressors import pare_camera
        pare = {
            "bboxes": [np.array([100.0, 120.0, 448.0, 0.0])],
            "pred_cam": [np.array([1.0, 0.1, -0.2])],
        }
        init_t, center = pare_camera(pare, focal_length=1000.0)
        # r = 448/224 = 2; tz = 2*1000/(2*224*1) = 4.464
        np.testing.assert_allclose(init_t[2], 2000.0 / 448.0, rtol=1e-6)
        np.testing.assert_allclose(center, [100.0, 120.0])

    def test_expose_focal_rescale(self):
        from smplifyx_tpu.data.regressors import expose_camera
        expose = {
            "transl": np.array([0.1, 0.2, 10.0]),
            "center": np.array([50.0, 60.0]),
        }
        init_t, center = expose_camera(expose, focal_length=2500.0)
        np.testing.assert_allclose(init_t, [0.1, 0.2, 5.0], rtol=1e-6)


class TestNativeParser:
    def test_matches_python_reader(self, tmp_path):
        from smplifyx_tpu.data import native
        if not native.is_available():
            pytest.skip("native parser not built")
        p = tmp_path / "x_keypoints.json"
        make_openpose_json(p, num_people=2, seed=11)
        a = native.read_keypoints_native(str(p), True, True, True)
        b = read_keypoints(str(p), True, True, True).keypoints
        np.testing.assert_allclose(a, b, rtol=1e-6)

    def test_dataset_uses_native_and_falls_back_for_gender(self, tmp_path):
        from smplifyx_tpu.data import native
        if not native.is_available():
            pytest.skip("native parser not built")
        (tmp_path / "images").mkdir(); (tmp_path / "keypoints").mkdir()
        import struct as _s, zlib, binascii
        def tiny_png(path, w=4, h=4):
            sig = b"\x89PNG\r\n\x1a\n"
            ihdr = _s.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
            def chunk(tag, data):
                c = tag + data
                return _s.pack(">I", len(data)) + c + _s.pack(
                    ">I", binascii.crc32(c) & 0xFFFFFFFF)
            raw = zlib.compress(b"".join(b"\x00" + b"\x00" * (3 * w)
                                          for _ in range(h)))
            with open(path, "wb") as f:
                f.write(sig + chunk(b"IHDR", ihdr) + chunk(b"IDAT", raw)
                        + chunk(b"IEND", b""))
        tiny_png(tmp_path / "images" / "a.png")
        # JSON with a gender annotation must go through the python reader
        import json as _json
        rng = np.random.default_rng(0)
        person = {
            "person_id": [-1],
            "gender_pd": "female",
            "pose_keypoints_2d": rng.uniform(0, 10, 25 * 3).tolist(),
            "hand_left_keypoints_2d": rng.uniform(0, 10, 21 * 3).tolist(),
            "hand_right_keypoints_2d": rng.uniform(0, 10, 21 * 3).tolist(),
            "face_keypoints_2d": rng.uniform(0, 10, 70 * 3).tolist(),
        }
        with open(tmp_path / "keypoints" / "a_keypoints.json", "w") as f:
            _json.dump({"people": [person]}, f)
        ds = create_dataset(format="coco25", data_folder=str(tmp_path),
                            use_hands=True, use_face=True,
                            use_face_contour=True)
        rec = ds[0]
        assert rec.gender_pd == ["female"]
        assert rec.keypoints.shape == (1, 135, 3)


class TestBlendDirectory:
    def test_directory_driver_identity_heuristics(self, tmp_path):
        from smplifyx_tpu.data.blending import (
            blend_directory, write_openpose_json,
        )
        (tmp_path / "images").mkdir()
        (tmp_path / "op").mkdir()
        (tmp_path / "mm").mkdir()
        rng = np.random.default_rng(5)
        for name in ("x", "y"):
            (tmp_path / "images" / f"{name}.jpg").write_bytes(b"")
            # OpenPose file (25 body + 70 face layout)
            make_openpose_json(tmp_path / "op" / f"{name}_keypoints.json")
            # MMPose file: 26 body keypoints (Halpe)
            person = {
                "pose_keypoints_2d": rng.uniform(0, 10, 26 * 3).tolist(),
                "hand_left_keypoints_2d": rng.uniform(0, 10, 21 * 3).tolist(),
                "hand_right_keypoints_2d": rng.uniform(0, 10, 21 * 3).tolist(),
                "face_keypoints_2d": rng.uniform(0, 10, 68 * 3).tolist(),
            }
            with open(tmp_path / "mm" / f"{name}_mmpose.json", "w") as f:
                json.dump({"people": [person]}, f)

        written = blend_directory(
            str(tmp_path / "images"), str(tmp_path / "op"),
            str(tmp_path / "mm"), str(tmp_path / "out"), None,
        )
        assert len(written) == 2  # every image written (module bug fixed)
        kp = read_keypoints(written[0], True, True, True)
        assert kp.keypoints.shape == (1, 135, 3)
