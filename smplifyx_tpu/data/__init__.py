from smplifyx_tpu.data.keypoints import (
    Keypoints,
    read_keypoints,
    create_dataset,
    FrameRecord,
)
from smplifyx_tpu.data.blending import blend_keypoints, calibrate_confidences
