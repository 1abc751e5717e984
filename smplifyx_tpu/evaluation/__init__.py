from smplifyx_tpu.evaluation.metrics import (
    procrustes_align,
    scale_align,
    pelvis_align,
    mpjpe,
    v2v_error,
    point_fscore,
    procrustes_v2v,
)
