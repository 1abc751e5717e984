from smplifyx_tpu.parallel.mesh import (
    make_mesh,
    shard_frames,
    shard_model,
    replicate,
    fit_batch_sharded,
)
