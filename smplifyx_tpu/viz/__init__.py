from smplifyx_tpu.viz.render import (
    render_mesh_overlay,
    overlay_keypoints,
    render_result_pickle,
)
