"""FitService: micro-batching, gender grouping, HTTP frontend.

Runs on the CPU mesh with a tiny synthetic model (fast tier)."""

import json
import threading
import urllib.request

import numpy as np
import pytest

from smplifyx_tpu.data.keypoints import FrameRecord
from smplifyx_tpu.models.bodymodel import synthetic_model
from smplifyx_tpu.serve import FitService, record_from_request, serve_http
from smplifyx_tpu.utils.config import load_config


def make_cfg(**over):
    return load_config(
        "cfg/fit_smplx_combined_coco25.yaml",
        data_folder="/nonexistent", output_folder="/tmp/unused_serve",
        regression_prior="", use_camera_prior=False,
        interpenetration=False, maxiters=2, lbfgs_iters_per_stage=4,
        synthetic_model=True, synthetic_num_verts=96,
        **over,
    )


def make_record(seed=0, name="frame", num_joints=135):
    rng = np.random.default_rng(seed)
    kp = np.zeros((1, num_joints, 3), np.float32)
    kp[0, :, 0] = rng.uniform(100, 500, num_joints)
    kp[0, :, 1] = rng.uniform(100, 600, num_joints)
    kp[0, :, 2] = 0.9
    return FrameRecord(
        fn=f"{name}_{seed}", img_path=f"{name}_{seed}.jpg",
        keypoints=kp, img_size=(640, 640),
    )


@pytest.fixture(scope="module")
def service():
    cfg = make_cfg()
    model = synthetic_model(num_verts=96, seed=0)
    svc = FitService.from_config(cfg, model=model, max_wait_s=0.3,
                                 max_batch=8)
    yield svc
    svc.stop()


class TestFitService:
    def test_single_fit(self, service):
        res = service.fit(make_record(0), timeout=300)
        assert np.isfinite(res["loss"])
        assert len(res["camera_translation"]) == 3
        assert "body" in res["params"]
        assert res["gender"] == "neutral"
        assert all(e >= 1 for e in res["stage_evals"])

    def test_concurrent_submissions_coalesce(self, service):
        """Concurrent submits land in ONE micro-batch (same compiled
        dispatch), and every future resolves with a finite loss."""
        before = service.batches_dispatched
        futures = [service.submit(make_record(i)) for i in range(4)]
        results = [f.result(timeout=300) for f in futures]
        assert all(np.isfinite(r["loss"]) for r in results)
        # 4 same-gender requests within max_wait_s -> exactly one batch
        assert service.batches_dispatched == before + 1
        # results keep request identity
        assert [r["name"] for r in results] == [
            f"frame_{i}" for i in range(4)
        ]

    def test_deterministic_across_calls(self, service):
        a = service.fit(make_record(7), timeout=300)
        b = service.fit(make_record(7), timeout=300)
        assert a["loss"] == b["loss"]
        np.testing.assert_array_equal(a["params"]["body"],
                                      b["params"]["body"])

    def test_gender_override_groups_separately(self, service):
        before = service.batches_dispatched
        f1 = service.submit(make_record(1), gender="male")
        f2 = service.submit(make_record(2), gender="female")
        r1, r2 = f1.result(timeout=300), f2.result(timeout=300)
        assert (r1["gender"], r2["gender"]) == ("male", "female")
        # one drain, two gender groups -> two dispatches
        assert service.batches_dispatched == before + 2


class TestRecordFromRequest:
    def test_shapes(self):
        rec = record_from_request(
            {"keypoints": np.zeros((135, 3)).tolist(),
             "image_size": [480, 640], "name": "x"},
            num_joints=135,
        )
        assert rec.keypoints.shape == (1, 135, 3)
        assert rec.img_size == (480, 640)

    def test_bad_shape_raises(self):
        with pytest.raises(ValueError, match="keypoints"):
            record_from_request(
                {"keypoints": np.zeros((17, 3)).tolist(),
                 "image_size": [480, 640]},
                num_joints=135,
            )


class TestHTTP:
    def test_fit_and_health(self, service):
        server = serve_http(service, port=0)
        try:
            host, port = server.server_address[:2]
            base = f"http://{host}:{port}"

            with urllib.request.urlopen(base + "/healthz", timeout=30) as r:
                health = json.loads(r.read())
            assert health["ok"] is True

            payload = json.dumps({
                "keypoints": make_record(3).keypoints[0].tolist(),
                "image_size": [640, 640],
                "name": "http_frame",
            }).encode()
            req = urllib.request.Request(
                base + "/fit", data=payload,
                headers={"Content-Type": "application/json"},
            )
            with urllib.request.urlopen(req, timeout=300) as r:
                result = json.loads(r.read())
            assert np.isfinite(result["loss"])
            assert result["name"] == "http_frame"
        finally:
            server.shutdown()

    def test_bad_request_400(self, service):
        server = serve_http(service, port=0)
        try:
            host, port = server.server_address[:2]
            req = urllib.request.Request(
                f"http://{host}:{port}/fit",
                data=json.dumps({"keypoints": [[0, 0, 0]],
                                 "image_size": [10, 10]}).encode(),
                headers={"Content-Type": "application/json"},
            )
            with pytest.raises(urllib.error.HTTPError) as ei:
                urllib.request.urlopen(req, timeout=60)
            assert ei.value.code == 400
        finally:
            server.shutdown()
