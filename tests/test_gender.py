import numpy as np
import pytest

from smplifyx_tpu.data.gender import resolve_gender, group_by_gender
from smplifyx_tpu.data.keypoints import FrameRecord


def rec(name, gt=None, pd=None, keyp_path=None):
    return FrameRecord(
        fn=name, img_path=name + ".jpg",
        keypoints=np.zeros((1, 135, 3), np.float32), img_size=(10, 10),
        gender_gt=gt or [], gender_pd=pd or [],
        keyp_path=keyp_path,
    )


class TestResolveGender:
    def test_gt_wins(self):
        assert resolve_gender(rec("a", gt=["male"], pd=["female"])) == "male"

    def test_pd_fallback(self):
        assert resolve_gender(rec("a", pd=["female"])) == "female"

    def test_classifier_fallback(self):
        assert resolve_gender(rec("a"), classifier=lambda r: "male") == "male"

    def test_default(self):
        assert resolve_gender(rec("a"), default="neutral") == "neutral"

    def test_invalid_annotation_ignored(self):
        assert resolve_gender(rec("a", gt=["alien"]), default="female") == "female"


class TestGrouping:
    def test_groups(self):
        records = [rec("a", gt=["male"]), rec("b", gt=["male"]),
                   rec("c", pd=["female"]), rec("d")]
        groups = group_by_gender(records, default="neutral")
        assert sorted(groups) == ["female", "male", "neutral"]
        assert [r.fn for r in groups["male"]] == ["a", "b"]
        assert [r.fn for r in groups["neutral"]] == ["d"]

    def test_homogenus_hook_raises_helpfully(self):
        from smplifyx_tpu.data.gender import load_homogenus
        with pytest.raises(ImportError, match="homogenus"):
            load_homogenus("/nonexistent")


class TestHomogenusHook:
    def test_classifier_passes_image_and_keypoint_paths(self):
        """The hook must match Homogenus's API: predict_gender_one_img(
        img_dir=<image path>, keypoints_dir=<keypoint JSON path>) — the
        reference calls it with two DIFFERENT paths (main.py:258-271).
        Regression: round 2 passed the image path for both."""
        from smplifyx_tpu.data.gender import homogenus_classifier

        calls = []

        class FakeInferer:
            def predict_gender_one_img(self, img_dir, keypoints_dir):
                calls.append((img_dir, keypoints_dir))
                return "female"

        classify = homogenus_classifier(FakeInferer())
        record = FrameRecord(
            fn="a", img_path="/imgs/a.png",
            keypoints=np.zeros((1, 135, 3), np.float32), img_size=(8, 8),
            keyp_path="/kps/a_keypoints.json",
        )
        assert classify(record) == "female"
        assert calls == [("/imgs/a.png", "/kps/a_keypoints.json")]

    def test_resolution_prefers_annotation_over_classifier(self):
        from smplifyx_tpu.data.gender import homogenus_classifier

        class FakeInferer:
            def predict_gender_one_img(self, img_dir, keypoints_dir):
                return "male"

        classify = homogenus_classifier(FakeInferer())
        assert resolve_gender(rec("a", gt=["female"]),
                              classifier=classify) == "female"
        assert resolve_gender(
            rec("a", keyp_path="a_keypoints.json"), classifier=classify
        ) == "male"

    def test_missing_keyp_path_fails_loudly(self):
        """A record without keyp_path must raise, not silently feed the
        image path to Homogenus as the keypoint JSON path."""
        from smplifyx_tpu.data.gender import homogenus_classifier

        class FakeInferer:
            def predict_gender_one_img(self, img_dir, keypoints_dir):
                return "male"

        classify = homogenus_classifier(FakeInferer())
        with pytest.raises(ValueError, match="keyp_path"):
            classify(rec("a"))
