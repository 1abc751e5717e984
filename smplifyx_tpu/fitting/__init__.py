from smplifyx_tpu.fitting.lbfgs import LBFGSConfig, minimize
