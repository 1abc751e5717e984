from smplifyx_tpu.models.bodymodel import SMPLXModel, load_smplx_npz, synthetic_model
from smplifyx_tpu.models.forward import BodyParams, SMPLXOutput, smplx_forward
