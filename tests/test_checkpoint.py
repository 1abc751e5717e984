import numpy as np
import pytest

from smplifyx_tpu.fitting.checkpoint import (
    save_fit_state, load_fit_state, warm_start_from_results,
)
from smplifyx_tpu.fitting.params import FitSettings, unpack
from smplifyx_tpu.utils.io import save_result_pickle
from smplifyx_tpu.utils.timing import Timer, FitStats


class TestFitState:
    def test_roundtrip(self, tmp_path):
        x = np.random.default_rng(0).normal(size=(4, 120)).astype(np.float32)
        p = tmp_path / "state.npz"
        save_fit_state(str(p), x, ["a", "b", "c", "d"], stage=2)
        x2, names, stage = load_fit_state(str(p))
        np.testing.assert_array_equal(x2, x)
        assert names == ["a", "b", "c", "d"]
        assert stage == 2


class TestWarmStart:
    def test_from_result_pickles(self, tmp_path):
        settings = FitSettings()
        (tmp_path / "frameA").mkdir()
        save_result_pickle(
            str(tmp_path / "frameA" / "000.pkl"),
            camera_translation=np.array([0.1, 0.2, 3.0], np.float32),
            camera_center=np.array([320, 240], np.float32),
            focal_length=1000.0, H=480, W=640,
            params={
                "global_orient": np.full(3, 0.5, np.float32),
                "betas": np.arange(10, dtype=np.float32),
                "expression": np.zeros(10, np.float32),
                "jaw_pose": np.zeros(3, np.float32),
                "leye_pose": np.zeros(3, np.float32),
                "reye_pose": np.zeros(3, np.float32),
                "left_hand_pose": np.zeros(12, np.float32),
                "right_hand_pose": np.zeros(12, np.float32),
            },
            body_pose=np.full(63, 0.1, np.float32),
        )
        x0, found = warm_start_from_results(
            str(tmp_path), ["frameA", "frameB"], settings
        )
        assert found.tolist() == [True, False]
        import jax.numpy as jnp
        seg = unpack(settings, jnp.asarray(x0))
        np.testing.assert_allclose(np.asarray(seg["cam_t"][0]),
                                   [0.1, 0.2, 3.0], rtol=1e-6)
        np.testing.assert_allclose(np.asarray(seg["betas"][0]),
                                   np.arange(10), rtol=1e-6)
        np.testing.assert_allclose(np.asarray(seg["body"][0]), 0.1, rtol=1e-5)
        np.testing.assert_allclose(np.asarray(x0[1]), 0.0)


class TestTiming:
    def test_timer_spans(self):
        import time
        t = Timer()
        with t.span("a"):
            time.sleep(0.01)
        assert t.spans["a"] >= 0.01
        assert "a:" in t.report()

    def test_fit_stats(self):
        s = FitStats(
            losses=np.array([1.0, 2.0, np.inf]),
            flipped=np.array([True, False, False]),
            stage_evals=np.array([[10, 20, 30], [5, 5, 5]]),
        )
        out = s.summary()
        assert out["num_nonfinite"] == 1
        assert out["num_flipped_orientation"] == 1
        assert out["stage_evals_mean"] == [20.0, 5.0]
        assert out["stage_evals_max"] == [30, 5]
