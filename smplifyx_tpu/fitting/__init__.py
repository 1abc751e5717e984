from smplifyx_tpu.fitting.lbfgs import LBFGSConfig, LBFGSResult, minimize
from smplifyx_tpu.fitting.energy import (
    FrameData, StageWeights, smplify_energy, camera_init_energy,
    guess_camera_depth,
)
from smplifyx_tpu.fitting.params import (
    FitSettings, pack, unpack, camera_stage_mask, body_stage_mask,
)
from smplifyx_tpu.fitting.pipeline import FitOptions, FitResult, fit_batch, recover_outputs
from smplifyx_tpu.fitting.stages import build_stage_schedule
from smplifyx_tpu.fitting.prepare import prepare_batch, settings_from_config
from smplifyx_tpu.fitting.optimizers import create_minimizer
from smplifyx_tpu.fitting.checkpoint import (
    save_fit_state, load_fit_state, warm_start_from_results,
)
