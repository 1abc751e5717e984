"""Results browser: re-render fitted meshes from result pickles to images.

CLI parity with the reference's render_results.py / render_pkl.py viewers
(SURVEY.md §2 row 22), headless: instead of an interactive pyrender window it
writes overlay PNGs next to (or instead of) the originals.

    python -m smplifyx_tpu.viz.browse --results out/results \
        --images data/images --out out/overlays \
        [--model_folder models --gender neutral | --synthetic_model]
"""

from __future__ import annotations

import argparse
import glob
import os
import os.path as osp

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--results", required=True,
                   help="results tree containing <frame>/000.pkl")
    p.add_argument("--images", default=None,
                   help="optional folder with the original images")
    p.add_argument("--out", required=True)
    p.add_argument("--model_folder", default="models")
    p.add_argument("--gender", default="neutral")
    p.add_argument("--synthetic_model", action="store_true")
    p.add_argument("--synthetic_num_verts", type=int, default=10475)
    args = p.parse_args(argv)

    # Visualization is host-side; never contend for the TPU.
    import jax

    jax.config.update("jax_platforms", "cpu")

    from smplifyx_tpu.viz.render import render_result_pickle

    if args.synthetic_model:
        from smplifyx_tpu.models.bodymodel import synthetic_model

        model = synthetic_model(num_verts=args.synthetic_num_verts)
    else:
        from smplifyx_tpu.models.bodymodel import load_smplx_npz

        model = load_smplx_npz(osp.join(
            args.model_folder, "smplx", f"SMPLX_{args.gender.upper()}.npz"
        ))

    os.makedirs(args.out, exist_ok=True)
    pkls = sorted(glob.glob(osp.join(args.results, "**/*.pkl"),
                            recursive=True))
    assert pkls, f"no result pickles under {args.results}"

    from PIL import Image

    for pkl in pkls:
        frame = osp.basename(osp.dirname(pkl))
        img = None
        if args.images:
            for ext in (".jpg", ".png", ".jpeg"):
                cand = osp.join(args.images, frame + ext)
                if osp.exists(cand):
                    img = np.asarray(Image.open(cand).convert("RGB"),
                                     np.float32) / 255.0
                    break
        overlay = render_result_pickle(pkl, model, img=img)
        out_path = osp.join(args.out, frame + "_overlay.png")
        Image.fromarray(overlay).save(out_path)
        print(out_path)


if __name__ == "__main__":
    main()
