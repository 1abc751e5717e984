"""Persistent batching fit service — the production-serving counterpart of
the one-shot app driver.

The reference has no serving story (one process, one image, one fit:
main.py:207's serial loop); on TPU the economics invert — a compiled
batched program amortizes dispatch and the chip is fastest at batch — so
the natural deployment is a resident service that coalesces concurrent
requests into micro-batches:

  * `FitService` owns a `FitSession` (smplifyx_tpu/session.py: models,
    priors, schedule, ONE jitted program) and a worker thread; `submit()`
    enqueues a `FrameRecord` and returns a `concurrent.futures.Future`.
  * The worker drains the queue up to `max_batch` or `max_wait_s`
    (whichever first), groups by resolved gender, pads each group to a
    power-of-two bucket (compiled executables are reused across calls,
    exactly like the app's gender loop), fits, and resolves futures with
    per-frame results.
  * `serve_http` wraps a service in a stdlib ThreadingHTTPServer:
    POST /fit with an OpenPose-style JSON body -> fitted parameters;
    GET /healthz for liveness. No external dependencies.

Throughput = the bench numbers (BENCH_r0N.json at the repo root is the
committed source of truth; r4 measured 257.4 frames/s/chip collision-off
at B=128 and 18.15 collision-on at B=64); latency = one bucket fit
(~0.25 s at small buckets) + coalescing wait, so `max_wait_s` is the
knob trading latency for batch efficiency. SERVE_r0N.json records the
measured load/latency tables.
"""

from __future__ import annotations

import json
import queue
import threading
import time
from concurrent.futures import Future
from dataclasses import dataclass, field
from typing import Optional

import numpy as np

from smplifyx_tpu.data.keypoints import FrameRecord
from smplifyx_tpu.session import FitSession, build_fit_session
from smplifyx_tpu.utils.config import Config


class ServiceOverloadedError(RuntimeError):
    """Raised by submit() when the bounded request queue is full — the
    backpressure signal (HTTP frontend maps it to 503)."""


@dataclass
class FitRequest:
    record: FrameRecord
    future: Future = field(default_factory=Future)
    gender: Optional[str] = None  # explicit override of resolution chain


class FitService:
    """Micro-batching fit executor over a persistent FitSession."""

    def __init__(
        self,
        session: FitSession,
        max_batch: int = 32,
        max_wait_s: float = 0.25,
        include_vertices: bool = False,
        default_gender: Optional[str] = None,
        max_queue: int = 0,
        min_bucket: int = 1,
    ):
        """max_queue bounds the pending-request queue (0 = unbounded);
        submit() on a full queue raises ServiceOverloadedError instead of
        letting latency grow without bound (load-shedding backpressure —
        clients see an immediate 503 and can retry elsewhere).

        min_bucket floors the power-of-two padding bucket: with
        min_bucket=4, a lone request and a 3-request burst run the SAME
        compiled executable, so low-traffic periods never pay a fresh
        compile when traffic picks up (padding lanes are near-free —
        the batch is one fused device program either way)."""
        self.session = session
        self.max_batch = int(max_batch)
        self.min_bucket = int(min_bucket)
        self.max_wait_s = float(max_wait_s)
        self.include_vertices = include_vertices
        self.default_gender = default_gender or session.cfg.gender
        self._queue: "queue.Queue[FitRequest]" = queue.Queue(
            maxsize=int(max_queue)
        )
        # Shutdown is signalled out-of-band (not via an in-queue sentinel):
        # with a bounded queue a sentinel re-put can block behind submitters
        # refilling the freed slot, deadlocking the sole consumer on its own
        # full queue; an Event has no such interaction with capacity.
        self._stop = threading.Event()
        self._models = {}          # gender -> (device model, joints model)
        self._joint_weights = session.joint_weights()
        self._lock = threading.Lock()
        self.fits_completed = 0
        self.batches_dispatched = 0
        self._worker = threading.Thread(
            target=self._run, name="fit-service", daemon=True
        )
        self._worker.start()

    @classmethod
    def from_config(cls, cfg: Config, model=None, **kw) -> "FitService":
        return cls(build_fit_session(cfg, model=model), **kw)

    # -- client API ------------------------------------------------------

    def submit(self, record: FrameRecord,
               gender: Optional[str] = None) -> Future:
        """Enqueue one frame; the Future resolves to a result dict
        {name, loss, params: {...}, camera_translation[, vertices]}."""
        if self._stop.is_set():
            raise RuntimeError("FitService is stopped")
        req = FitRequest(record=record, gender=gender)
        try:
            self._queue.put_nowait(req)
        except queue.Full:
            raise ServiceOverloadedError(
                f"request queue full ({self._queue.maxsize} pending)"
            ) from None
        return req.future

    def fit(self, record: FrameRecord, gender: Optional[str] = None,
            timeout: Optional[float] = None) -> dict:
        """Blocking convenience wrapper around submit()."""
        return self.submit(record, gender=gender).result(timeout=timeout)

    def stop(self, timeout: float = 30.0):
        """Flush queued requests, then stop the worker. Never blocks on the
        queue itself (a full bounded queue or a dead worker cannot wedge
        stop()); worst case it just joins with the timeout."""
        self._stop.set()
        self._worker.join(timeout=timeout)

    # -- worker ----------------------------------------------------------

    def _drain(self) -> Optional[list]:
        """Block for the first request (periodically checking the shutdown
        flag), then coalesce up to max_batch or max_wait_s. Returns None
        only once the queue is empty AND stop() was called — so every
        request enqueued before stop() is still flushed."""
        while True:
            try:
                first = self._queue.get(timeout=0.1)
                break
            except queue.Empty:
                if self._stop.is_set():
                    return None
        batch = [first]
        deadline = time.monotonic() + self.max_wait_s
        while len(batch) < self.max_batch:
            remaining = deadline - time.monotonic()
            if remaining <= 0:
                break
            try:
                item = self._queue.get(timeout=remaining)
            except queue.Empty:
                break
            batch.append(item)
        return batch

    def _get_models(self, gender: str):
        import jax

        from smplifyx_tpu.models.sparse import build_joints_model

        with self._lock:
            if gender not in self._models:
                m = jax.device_put(self.session.get_model(gender))
                jm = jax.device_put(build_joints_model(m))
                self._models[gender] = (m, jm)
            return self._models[gender]

    def _resolve_gender(self, req: FitRequest) -> str:
        if req.gender:
            return req.gender
        from smplifyx_tpu.data.gender import resolve_gender

        return resolve_gender(req.record, default=self.default_gender)

    def _run(self):
        while True:
            batch = self._drain()
            if batch is None:
                return
            groups: dict[str, list[FitRequest]] = {}
            for req in batch:
                try:
                    groups.setdefault(self._resolve_gender(req), []).append(req)
                except Exception as e:  # bad record: fail just this future
                    req.future.set_exception(e)
            for gender, reqs in sorted(groups.items()):
                try:
                    self._fit_group(gender, reqs)
                except Exception as e:
                    for r in reqs:
                        if not r.future.done():
                            r.future.set_exception(e)

    def _fit_group(self, gender: str, reqs: list[FitRequest]):
        import jax.numpy as jnp

        from smplifyx_tpu.fitting.params import unpack
        from smplifyx_tpu.fitting.pipeline import recover_outputs
        from smplifyx_tpu.fitting.prepare import pad_prepared, prepare_batch

        sess = self.session
        model, joints_model = self._get_models(gender)
        # prepare_batch silently DROPS records with no detected person
        # (keypoints [0, K, 3]); fail those futures individually up front
        # so row i of the prepared batch is exactly reqs[i] — otherwise
        # every later future would receive its neighbor's fit.
        kept = []
        for r in reqs:
            if r.record.keypoints.shape[0] < 1:
                r.future.set_exception(ValueError(
                    f"record {r.record.fn!r} has no detected people "
                    "(keypoints shape "
                    f"{tuple(r.record.keypoints.shape)})"
                ))
            else:
                kept.append(r)
        reqs = kept
        if not reqs:
            return
        prepared = prepare_batch(
            sess.cfg, [r.record for r in reqs], self._joint_weights,
            vposer=sess.vposer, gmm=sess.gmm,
        )
        assert prepared.num_real == len(reqs), (
            prepared.num_real, len(reqs),
        )
        # Power-of-two bucket so repeat calls share compiled executables
        # (same policy as the app's gender loop).
        bucket = max(self.min_bucket,
                     1 << (max(prepared.num_real, 1) - 1).bit_length())
        prepared = pad_prepared(prepared, bucket)
        res = sess.fit(model, joints_model, prepared.frames,
                       jnp.asarray(prepared.x0))
        verts = None
        if self.include_vertices:
            # Full-mesh forward only when the client wants vertices — the
            # default response is built from the flat params alone.
            out_fwd, _params, _cam_t = recover_outputs(
                model, sess.settings, res.x, sess.decode_body,
                joint_map=None,
            )
            verts = np.asarray(out_fwd.vertices)

        losses = np.asarray(res.loss)
        seg = unpack(sess.settings, res.x)
        seg_np = {k: np.asarray(v) for k, v in seg.items()}
        cam_t_np = seg_np["cam_t"]
        decoded = np.asarray(sess.decode_body(seg["body"]))

        with self._lock:
            self.batches_dispatched += 1
            self.fits_completed += len(reqs)
        stage_evals = np.asarray(res.stage_evals)
        for i, req in enumerate(reqs):
            result = {
                "name": req.record.fn,
                "gender": gender,
                "loss": float(losses[i]),
                "camera_translation": cam_t_np[i].tolist(),
                "params": {k: v[i].tolist() for k, v in seg_np.items()},
                "body_pose_decoded": decoded[i].tolist(),
                # per-stage objective evaluations spent on this lane
                "stage_evals": stage_evals[:, i].tolist(),
            }
            if verts is not None:
                result["vertices"] = verts[i].tolist()
            req.future.set_result(result)


# -- HTTP frontend -------------------------------------------------------


def record_from_request(payload: dict, num_joints: int) -> FrameRecord:
    """Build a FrameRecord from a /fit JSON payload.

    Expected fields: `keypoints` ([K,3] or [P,K,3] nested lists, OpenPose
    order for the configured format), `image_size` ([H, W]); optional
    `name`, `gender`."""
    kp = np.asarray(payload["keypoints"], np.float32)
    if kp.ndim == 2:
        kp = kp[None]
    if kp.ndim != 3 or kp.shape[-1] != 3 or kp.shape[1] != num_joints:
        raise ValueError(
            f"keypoints must be [P, {num_joints}, 3] (got {kp.shape})"
        )
    H, W = (int(v) for v in payload["image_size"])
    name = str(payload.get("name", "request"))
    return FrameRecord(
        fn=name, img_path=name + ".jpg", keypoints=kp, img_size=(H, W),
    )


def serve_http(service: FitService, host: str = "127.0.0.1", port: int = 0):
    """Start a ThreadingHTTPServer for the service; returns the server
    (serving on a daemon thread; use server.server_address for the bound
    port, server.shutdown() to stop)."""
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    num_joints = int(service._joint_weights.shape[0])

    class Handler(BaseHTTPRequestHandler):
        def _send(self, code: int, obj: dict):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                self._send(200, {
                    "ok": True,
                    "fits_completed": service.fits_completed,
                    "batches_dispatched": service.batches_dispatched,
                })
            else:
                self._send(404, {"error": "not found"})

        def do_POST(self):
            if self.path != "/fit":
                self._send(404, {"error": "not found"})
                return
            try:
                n = int(self.headers.get("Content-Length", 0))
                payload = json.loads(self.rfile.read(n))
                record = record_from_request(payload, num_joints)
                result = service.fit(
                    record, gender=payload.get("gender"),
                    timeout=float(payload.get("timeout_s", 300.0)),
                )
                self._send(200, result)
            except ServiceOverloadedError as e:
                self._send(503, {"error": f"overloaded: {e}",
                                 "retry_after_s": service.max_wait_s})
            except Exception as e:
                self._send(400, {"error": f"{type(e).__name__}: {e}"})

        def log_message(self, *a):  # quiet
            pass

    class Server(ThreadingHTTPServer):
        # socketserver's default listen backlog of 5 resets connections
        # under concurrent bursts (measured: 3/64 requests reset at 32
        # simultaneous clients, tools/load_serve.py); coalescing serving
        # WANTS bursts, so size the backlog for them.
        request_queue_size = 128
        daemon_threads = True

    server = Server((host, port), Handler)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    return server


def main(argv=None) -> None:
    """python -m smplifyx_tpu.serve --config cfg/preset.yaml [--port 8123]

    Same config surface as the batch CLI; --port/--serve-host come from
    SMPLIFYX_SERVE_PORT / SMPLIFYX_SERVE_HOST env vars or defaults."""
    import os

    from smplifyx_tpu.utils.config import parse_cli

    cfg = parse_cli(argv)
    host = os.environ.get("SMPLIFYX_SERVE_HOST", "127.0.0.1")
    port = int(os.environ.get("SMPLIFYX_SERVE_PORT", "8123"))
    service = FitService.from_config(cfg)
    server = serve_http(service, host=host, port=port)
    bound = server.server_address
    print(f"smplifyx_tpu fit service on http://{bound[0]}:{bound[1]} "
          f"(POST /fit, GET /healthz)", flush=True)
    try:
        while True:
            time.sleep(3600)
    except KeyboardInterrupt:
        server.shutdown()
        service.stop()


if __name__ == "__main__":
    main()
