"""During-fit result streaming: split-dispatch fit -> per-stage pickles.

The reference renders the mesh INSIDE the optimization loop when run with
`visualize` (fit_single_frame.py:509-520 through the live MeshViewer thread,
mesh_viewer.py:82-97).  A TPU fit is one compiled program with zero host
round-trips, so "live" here means stage-granular: `stream_fit` drives
`FitSession.fit_stages` (one device dispatch per stage) and rewrites each
frame's result pickle — with the accumulated per-stage snapshots under the
standard "stages" key — as every dispatch returns.  Point
`python -m smplifyx_tpu.viz.viewer --results <out_dir> --live` at the same
directory and the WebGL scene refreshes as each stage lands.
"""

from __future__ import annotations

import os
import os.path as osp

import numpy as np

from smplifyx_tpu.utils.io import save_result_pickle


def _stage_dict(seg_np: dict, decoded: np.ndarray, i: int) -> dict:
    return {
        "camera_translation": seg_np["cam_t"][i],
        "global_orient": seg_np["global_orient"][i],
        "body_pose": decoded[i],
        "betas": seg_np["betas"][i],
        "expression": seg_np["expression"][i],
        "jaw_pose": seg_np["jaw"][i],
        "leye_pose": seg_np["leye"][i],
        "reye_pose": seg_np["reye"][i],
        "left_hand_pose": seg_np["lhand"][i],
        "right_hand_pose": seg_np["rhand"][i],
    }


def stream_fit(sess, model, joints_model, prepared, out_dir: str):
    """Run a split-dispatch fit, writing results after EVERY stage.

    sess: FitSession; prepared: a PreparedBatch (fitting/prepare.py).
    Yields (stage_idx, FitResult) after each device dispatch, having
    already rewritten `<out_dir>/<name>/000.pkl` for every real frame with
    the current parameters and the accumulated "stages" snapshots (the
    schema viz/viewer.py --stages / --live reads).  The final yield's
    pickle is a complete standard result.
    """
    from smplifyx_tpu.fitting.params import unpack

    stages_acc: list[list[dict]] = [[] for _ in prepared.names]
    for stage_idx, res in sess.fit_stages(
        model, joints_model, prepared.frames, prepared.x0
    ):
        seg = unpack(sess.settings, res.x)
        seg_np = {k: np.asarray(v) for k, v in seg.items()}
        decoded = np.asarray(sess.decode_body(seg["body"]))
        losses = np.asarray(res.loss)
        for i, name in enumerate(prepared.names):
            stages_acc[i].append(_stage_dict(seg_np, decoded, i))
            frame_dir = osp.join(out_dir, name)
            os.makedirs(frame_dir, exist_ok=True)
            save_result_pickle(
                osp.join(frame_dir, "000.pkl"),
                camera_translation=seg_np["cam_t"][i],
                camera_center=np.asarray(prepared.frames.center[i]),
                focal_length=prepared.focals[i],
                H=prepared.img_sizes[i][0], W=prepared.img_sizes[i][1],
                params={
                    "global_orient": seg_np["global_orient"][i],
                    "betas": seg_np["betas"][i],
                    "expression": seg_np["expression"][i],
                    "jaw_pose": seg_np["jaw"][i],
                    "leye_pose": seg_np["leye"][i],
                    "reye_pose": seg_np["reye"][i],
                    "left_hand_pose": seg_np["lhand"][i],
                    "right_hand_pose": seg_np["rhand"][i],
                },
                body_pose=decoded[i],
                loss=float(losses[i]),
                stages=stages_acc[i],
            )
        yield stage_idx, res
