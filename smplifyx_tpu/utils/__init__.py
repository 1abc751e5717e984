from smplifyx_tpu.utils.io import read_ply, write_ply, save_result_pickle
