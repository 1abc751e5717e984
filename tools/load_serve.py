"""Serving-layer load measurement: N concurrent clients against FitService.

Spawns the HTTP frontend on an ephemeral port, drives it with `clients`
concurrent threads each posting `per_client` /fit requests back-to-back,
and reports p50/p95/max end-to-end latency, achieved frames/s, and batch
coalescing stats — the measured version of serve.py's "latency = one bucket
fit + coalescing wait" claim (docs/ARCHITECTURE.md serving section).

Usage: python tools/load_serve.py [clients] [per_client] [max_wait_s]
                                  [tpu|cpu] [num_verts]
"""

from __future__ import annotations

import json
import os.path as osp
import sys
import threading
import time
import urllib.request

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))


def main(clients=8, per_client=8, max_wait_s=0.25, platform=None,
         num_verts=10475, cfg_path="cfg/fit_smplx_combined_coco25.yaml",
         interp=False, max_batch=32):
    """interp=True serves the config's own interpenetration setting (the
    classic preset runs collision in its late stages — the deployment whose
    multi-second per-bucket fits stress max_wait_s coalescing and bucket
    warmup very differently from the collision-off default); False keeps
    the historical collision-off measurement."""
    import jax

    if platform:
        jax.config.update("jax_platforms", platform)
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

    from smplifyx_tpu.models.bodymodel import synthetic_model
    from smplifyx_tpu.serve import FitService, serve_http
    from smplifyx_tpu.utils.config import load_config

    over = {} if interp else {"interpenetration": False}
    cfg = load_config(
        cfg_path,
        data_folder="/nonexistent", output_folder="/tmp/unused_load",
        regression_prior="", use_camera_prior=False,
        use_gender_classifier=False, vposer_ckpt="synthetic",
        synthetic_model=True, synthetic_num_verts=num_verts,
        **over,
    )
    model = synthetic_model(num_verts=num_verts, seed=0)
    svc = FitService.from_config(cfg, model=model, max_batch=max_batch,
                                 max_wait_s=max_wait_s, max_queue=256)
    server = serve_http(svc, port=0)
    host, port = server.server_address[:2]
    base = f"http://{host}:{port}"

    rng = np.random.default_rng(0)
    K = int(svc._joint_weights.shape[0])

    def payload(i):
        kp = np.zeros((K, 3), np.float32)
        kp[:, 0] = rng.uniform(100, 500, K)
        kp[:, 1] = rng.uniform(100, 600, K)
        kp[:, 2] = 0.9
        return json.dumps({"keypoints": kp.tolist(),
                           "image_size": [640, 640],
                           # outlive a cold first-bucket compile (the
                           # service-side default of 300 s can expire
                           # mid-compile and surface as HTTP 400)
                           "timeout_s": 590.0,
                           "name": f"load_{i}"}).encode()

    def post(i, timeout=600.0):
        req = urllib.request.Request(
            base + "/fit", data=payload(i),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=timeout) as r:
            return json.loads(r.read())

    # Warmup: compile the bucket-1 and bucket-`clients` programs.
    post(0)
    warm = [threading.Thread(target=post, args=(i,)) for i in range(clients)]
    for t in warm:
        t.start()
    for t in warm:
        t.join()

    latencies = []
    lat_lock = threading.Lock()
    errors = []

    def client(cid):
        for k in range(per_client):
            t0 = time.perf_counter()
            try:
                post(cid * 10_000 + k)
            except Exception as e:  # recorded, not raised — report at end
                with lat_lock:
                    errors.append(f"{type(e).__name__}: {e}")
                continue
            dt = time.perf_counter() - t0
            with lat_lock:
                latencies.append(dt)

    b0 = svc.batches_dispatched
    t_start = time.perf_counter()
    threads = [threading.Thread(target=client, args=(c,))
               for c in range(clients)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t_start

    lat = np.asarray(sorted(latencies))
    print(json.dumps({
        "metric": "serve_load",
        "config": cfg_path, "interpenetration": bool(cfg.interpenetration),
        "clients": clients, "per_client": per_client,
        "max_wait_s": max_wait_s, "num_verts": num_verts,
        "completed": int(lat.size), "errors": len(errors),
        "p50_s": round(float(np.percentile(lat, 50)), 3),
        "p95_s": round(float(np.percentile(lat, 95)), 3),
        "max_s": round(float(lat.max()), 3),
        "achieved_fps": round(lat.size / wall, 2),
        "batches": svc.batches_dispatched - b0,
        "frames_per_batch": round(
            lat.size / max(svc.batches_dispatched - b0, 1), 1),
    }))
    if errors:
        print(json.dumps({"first_errors": errors[:3]}), file=sys.stderr)
    server.shutdown()
    svc.stop()


if __name__ == "__main__":
    a = sys.argv[1:]
    main(clients=int(a[0]) if a else 8,
         per_client=int(a[1]) if len(a) > 1 else 8,
         max_wait_s=float(a[2]) if len(a) > 2 else 0.25,
         platform=(a[3] if len(a) > 3 and a[3] != "tpu" else None),
         num_verts=int(a[4]) if len(a) > 4 else 10475,
         cfg_path=(a[5] if len(a) > 5
                   else "cfg/fit_smplx_combined_coco25.yaml"),
         interp=bool(int(a[6])) if len(a) > 6 else False,
         max_batch=int(a[7]) if len(a) > 7 else 32)
