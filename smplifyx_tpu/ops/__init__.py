from smplifyx_tpu.ops.rotation import (
    batch_rodrigues,
    rotmat_to_aa,
    euler_xyz_from_rotmat,
    flip_global_orient_y,
)
from smplifyx_tpu.ops.robustifier import gmof
from smplifyx_tpu.ops.camera import CameraParams, project_points, ehf_gt_camera
