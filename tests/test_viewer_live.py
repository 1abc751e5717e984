"""Live viewer: FitSession.fit_stages split dispatch + the --live HTTP
server refreshing as each stage's result lands (reference parity:
mesh_viewer.py's during-fit updates, stage-granular on TPU).

CPU mesh, tiny synthetic model (fast tier)."""

import json
import threading
import urllib.request

import numpy as np
import pytest

from smplifyx_tpu.fitting.prepare import pad_prepared, prepare_batch
from smplifyx_tpu.models.bodymodel import synthetic_model
from smplifyx_tpu.models.sparse import build_joints_model
from smplifyx_tpu.session import build_fit_session
from smplifyx_tpu.utils.config import load_config
from smplifyx_tpu.viz.live import stream_fit
from smplifyx_tpu.viz.viewer import results_fingerprint, serve_live_viewer


def make_cfg(**over):
    # Two stages: the minimal schedule that exercises a head dispatch plus
    # one body-stage dispatch.
    return load_config(
        "cfg/fit_smplx_combined_coco25.yaml",
        data_folder="/nonexistent", output_folder="/tmp/unused_live",
        regression_prior="", use_camera_prior=False,
        interpenetration=False, maxiters=2, lbfgs_iters_per_stage=4,
        synthetic_model=True, synthetic_num_verts=96,
        body_pose_prior_weights=[400.0, 40.0],
        coll_loss_weights=[0.0, 0.0],
        shape_weights=[75.0, 35.0], expr_weights=[10.0, 5.0],
        hand_pose_prior_weights=[100.0, 10.0],
        jaw_pose_prior_weights=[[4000.0, 4000.0, 4000.0]] * 2,
        hand_joints_weights=[0.0, 1.0], face_joints_weights=[0.0, 1.0],
        **over,
    )


def make_records(n):
    rng = np.random.default_rng(3)
    from smplifyx_tpu.data.keypoints import FrameRecord

    records = []
    for i in range(n):
        kp = np.zeros((1, 135, 3), np.float32)
        kp[0, :, 0] = rng.uniform(100, 500, 135)
        kp[0, :, 1] = rng.uniform(100, 600, 135)
        kp[0, :, 2] = 0.9
        records.append(FrameRecord(
            fn=f"live_{i}", img_path=f"live_{i}.jpg",
            keypoints=kp, img_size=(640, 640),
        ))
    return records


@pytest.fixture(scope="module")
def fitted_stream(tmp_path_factory):
    """Run a 2-stage split-dispatch fit, recording the results tree state
    after each stage dispatch."""
    out = tmp_path_factory.mktemp("live_results")
    cfg = make_cfg()
    model = synthetic_model(num_verts=96, seed=0)
    sess = build_fit_session(cfg, model=model)
    import jax

    dmodel = jax.device_put(model)
    jmodel = jax.device_put(build_joints_model(model))
    prepared = pad_prepared(
        prepare_batch(cfg, make_records(2), sess.joint_weights(),
                      vposer=sess.vposer, gmm=sess.gmm),
        2,
    )
    snapshots = []  # (stage_idx, fingerprint, n_stage_snapshots, loss)
    for stage_idx, res in stream_fit(sess, dmodel, jmodel, prepared,
                                     str(out)):
        from smplifyx_tpu.utils.io import load_result_pickle

        d = load_result_pickle(str(out / "live_0" / "000.pkl"))
        snapshots.append((
            stage_idx,
            results_fingerprint(str(out)),
            len(d.get("stages") or []),
            float(np.asarray(res.loss)[0]),
        ))
    return out, model, snapshots


class TestFitStages:
    def test_two_dispatches_stream_snapshots(self, fitted_stream):
        out, _model, snapshots = fitted_stream
        assert [s[0] for s in snapshots] == [0, 1]
        # each dispatch rewrote the pickle: fingerprint changes, the
        # accumulated stages list grows 1 -> 2
        assert snapshots[0][1] != snapshots[1][1]
        assert [s[2] for s in snapshots] == [1, 2]
        assert all(np.isfinite(s[3]) for s in snapshots)

    def test_matches_monolithic_staging(self, fitted_stream):
        """The split dispatch is the same program cut at stage boundaries:
        the final pickle carries finite params for every frame."""
        out, _model, _ = fitted_stream
        from smplifyx_tpu.utils.io import load_result_pickle

        for frame in ("live_0", "live_1"):
            d = load_result_pickle(str(out / frame / "000.pkl"))
            assert np.isfinite(d["body_pose"]).all()
            assert len(d["stages"]) == 2


class TestLiveViewerServer:
    def test_serves_and_bumps_version(self, fitted_stream):
        out, model, _ = fitted_stream
        server = serve_live_viewer(str(out), model, port=0, poll_ms=50)
        t = threading.Thread(target=server.serve_forever, daemon=True)
        t.start()
        try:
            host, port = server.server_address[:2]
            base = f"http://{host}:{port}"

            def get(path):
                with urllib.request.urlopen(base + path, timeout=30) as r:
                    return r.read().decode()

            ver1 = json.loads(get("/version"))["ver"]
            assert ver1 == results_fingerprint(str(out))
            page = get("/")
            # the page embeds the live poll script and every stage mesh
            assert "LIVE_VER" in page and ver1 in page
            assert "live_0/stage00" in page and "live_0/final" in page

            # a new write (another stage landing) bumps /version and the
            # served page follows
            pkl = out / "live_0" / "000.pkl"
            pkl.touch()
            ver2 = json.loads(get("/version"))["ver"]
            assert ver2 != ver1
            assert ver2 in get("/")
        finally:
            server.shutdown()
            t.join(timeout=10)

    def test_waiting_page_until_first_result(self, tmp_path):
        model = synthetic_model(num_verts=96, seed=0)
        empty = tmp_path / "none"
        empty.mkdir()
        server = serve_live_viewer(str(empty), model, port=0, poll_ms=50)
        t = threading.Thread(target=server.serve_forever, daemon=True)
        t.start()
        try:
            host, port = server.server_address[:2]
            with urllib.request.urlopen(
                f"http://{host}:{port}/", timeout=30
            ) as r:
                page = r.read().decode()
            assert "waiting" in page
        finally:
            server.shutdown()
            t.join(timeout=10)


def test_static_export_unchanged(tmp_path, fitted_stream):
    """--out static export still works through the refactored collector."""
    out, model, _ = fitted_stream
    from smplifyx_tpu.viz.viewer import collect_meshes, export_viewer_html

    meshes = collect_meshes(str(out), model, include_stages=True)
    # 2 frames x (2 stage snapshots + final)
    assert len(meshes) == 6
    path = export_viewer_html(meshes, str(tmp_path / "view.html"))
    html = open(path).read()
    assert "LIVE_VER" not in html
    assert "live_1/final" in html
