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
    # min_bucket=4: the single-fit and 4-way-coalesce tests share ONE
    # compiled executable (the production rationale for the knob applies
    # to suite wall-clock too).
    svc = FitService.from_config(cfg, model=model, max_wait_s=0.3,
                                 max_batch=8, min_bucket=4)
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


class TestBackpressure:
    """Bounded-queue load shedding: submit() raises ServiceOverloadedError
    when max_queue requests are already pending, and the HTTP frontend maps
    it to 503 with a retry hint."""

    @pytest.fixture()
    def blocked_service(self, service):
        """A second FitService sharing the module session (no recompiles),
        with a 2-deep queue and its _fit_group gated on an event so the
        test controls exactly when the worker drains."""
        import threading as _t

        from smplifyx_tpu.serve import FitService

        svc = FitService(service.session, max_batch=1, max_wait_s=0.01,
                         max_queue=2, min_bucket=4)
        entered = _t.Event()
        release = _t.Event()
        orig = svc._fit_group

        def gated(gender, reqs):
            entered.set()
            assert release.wait(timeout=120)
            return orig(gender, reqs)

        svc._fit_group = gated
        yield svc, entered, release
        release.set()
        svc.stop()

    def test_submit_sheds_load_when_full(self, blocked_service):
        from smplifyx_tpu.serve import ServiceOverloadedError

        svc, entered, release = blocked_service
        f1 = svc.submit(make_record(50))      # worker picks this up...
        assert entered.wait(timeout=60)       # ...and blocks inside the fit
        f2 = svc.submit(make_record(51))      # queue slot 1
        f3 = svc.submit(make_record(52))      # queue slot 2 (full now)
        with pytest.raises(ServiceOverloadedError):
            svc.submit(make_record(53))
        release.set()
        for f in (f1, f2, f3):
            assert np.isfinite(f.result(timeout=300)["loss"])

    def test_http_503_when_overloaded(self, blocked_service):
        svc, entered, release = blocked_service
        server = serve_http(svc, port=0)
        try:
            host, port = server.server_address[:2]
            base = f"http://{host}:{port}"
            payload = lambda i: json.dumps({  # noqa: E731
                "keypoints": make_record(i).keypoints[0].tolist(),
                "image_size": [640, 640], "name": f"bp_{i}",
            }).encode()

            def post_async(i):
                req = urllib.request.Request(
                    base + "/fit", data=payload(i),
                    headers={"Content-Type": "application/json"})
                t = threading.Thread(
                    target=lambda: urllib.request.urlopen(req, timeout=300)
                    .read(), daemon=True)
                t.start()
                return t

            threads = [post_async(60)]
            assert entered.wait(timeout=60)
            threads += [post_async(61), post_async(62)]
            # wait until both queue slots are really occupied
            deadline = __import__("time").monotonic() + 30
            while (svc._queue.qsize() < 2
                   and __import__("time").monotonic() < deadline):
                __import__("time").sleep(0.01)
            assert svc._queue.qsize() == 2
            req = urllib.request.Request(
                base + "/fit", data=payload(63),
                headers={"Content-Type": "application/json"})
            with pytest.raises(urllib.error.HTTPError) as exc:
                urllib.request.urlopen(req, timeout=30)
            assert exc.value.code == 503
            body = json.loads(exc.value.read())
            assert "overloaded" in body["error"]
            assert "retry_after_s" in body
            release.set()
            for t in threads:
                t.join(timeout=300)
        finally:
            release.set()
            server.shutdown()
