"""Fit-state checkpointing and warm-starting.

The reference persists only final results and wipes outputs on rerun
(rerun != resume; SURVEY.md §5, main.py:54-55).  The batched TPU pipeline
adds a real mid-pipeline story:

  * `save_fit_state` / `load_fit_state`: the flat parameter matrix [B, D]
    plus frame names and the stage index, as one npz — cheap to write
    between stages of very large sweeps;
  * `warm_start_from_results`: rebuild an x0 batch from a previous run's
    per-frame result pickles (reference-schema), so a new run (e.g. with a
    different weight schedule or added collision term) continues from the
    previous solution instead of from scratch.
"""

from __future__ import annotations

import os.path as osp
from typing import Sequence

import numpy as np

from smplifyx_tpu.fitting.params import FitSettings, pack
from smplifyx_tpu.utils.io import load_result_pickle


def save_fit_state(path: str, x: np.ndarray, names: Sequence[str],
                   stage: int = -1) -> None:
    np.savez(path, x=np.asarray(x), names=np.asarray(list(names)),
             stage=np.asarray(stage))


def load_fit_state(path: str) -> tuple[np.ndarray, list[str], int]:
    d = np.load(path, allow_pickle=False)
    return d["x"], [str(n) for n in d["names"]], int(d["stage"])


def warm_start_from_results(
    result_dir: str,
    names: Sequence[str],
    settings: FitSettings,
    vposer=None,
) -> tuple[np.ndarray, np.ndarray]:
    """Assemble x0 [B, D] from per-frame result pickles.

    Returns (x0, found_mask); frames without a pickle keep zeros and
    found_mask=0 (callers may overwrite those rows with their own init).
    For VPoser configs the saved decoded pose is re-encoded to a latent.
    """
    B = len(names)
    x0 = np.zeros((B, settings.dim), np.float32)
    found = np.zeros(B, bool)
    rows = {"cam_t": [], "global_orient": [], "body": [], "betas": [],
            "expression": [], "jaw": [], "leye": [], "reye": [],
            "lhand": [], "rhand": []}

    import jax.numpy as jnp

    for i, name in enumerate(names):
        pkl = osp.join(result_dir, name, "000.pkl")
        zeros = {k: None for k in rows}
        if osp.exists(pkl):
            d = load_result_pickle(pkl)
            found[i] = True

            def g(key, size):
                return np.asarray(d[key], np.float32).reshape(-1)[:size]

            # settings.body_pose_dof, NOT a literal 63: SMPL configs carry
            # a 69-dof body segment and a hardcoded width would truncate
            # the saved pose and crash pack() on resume.
            body_pose = g("body_pose", settings.body_pose_dof)
            if settings.use_vposer:
                assert vposer is not None
                body = np.asarray(
                    vposer.encode_mean(jnp.asarray(body_pose)[None])[0],
                    np.float32,
                )
            else:
                body = body_pose
            vals = {
                "cam_t": g("camera_translation", 3),
                "global_orient": g("global_orient", 3),
                "body": body,
                "betas": g("betas", settings.num_betas),
                "expression": g("expression", settings.num_expr),
                "jaw": g("jaw_pose", 3),
                "leye": g("leye_pose", 3),
                "reye": g("reye_pose", 3),
                "lhand": g("left_hand_pose", settings.hand_dim),
                "rhand": g("right_hand_pose", settings.hand_dim),
            }
        else:
            sizes = settings.segments()
            vals = {k: np.zeros(sizes[k][1], np.float32) for k in rows}
        for k in rows:
            rows[k].append(vals[k])

    x0 = np.asarray(pack(
        settings, **{k: jnp.asarray(np.stack(v)) for k, v in rows.items()}
    ))
    return x0, found
