from smplifyx_tpu.priors.priors import (
    GMMPrior,
    l2_prior,
    angle_prior,
    load_gmm_pickle,
    synthetic_gmm,
)
