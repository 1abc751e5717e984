from smplifyx_tpu.models.bodymodel import (
    SMPLXModel, load_smplx_npz, synthetic_model,
    SMPL_PARENTS, SMPLH_PARENTS, SMPLX_PARENTS,
)
from smplifyx_tpu.models.forward import BodyParams, SMPLXOutput, smplx_forward
from smplifyx_tpu.models.sparse import JointsModel, build_joints_model, joints_forward
from smplifyx_tpu.models.joint_mapping import model_to_annotation, num_keypoints
