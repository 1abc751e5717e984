"""Configuration system: dataclass + YAML presets + CLI overrides.

Replaces the reference's configargparse setup (smplifyx/cmd_parser.py:27-317,
~70 flags with YAML config files).  Field names and semantics match the
reference so its cfg_files port directly; the four shipped presets live in
cfg/ and mirror the reference's cfg_files/ semantics (stage counts are
implied by the weight-list lengths, jaw weights are comma-separated
3-vectors, body_tri_idxs flat list becomes pairs).
"""

from __future__ import annotations

import argparse
import dataclasses
import os.path as osp
from dataclasses import dataclass, field
from typing import Any, List, Optional, Sequence

import yaml


@dataclass
class Config:
    # --- data / paths
    data_folder: str = "data"
    img_folder: str = "images"
    keyp_folder: str = "keypoints"
    output_folder: str = "output"
    result_folder: str = "results"
    mesh_folder: str = "meshes"
    model_folder: str = "models"
    prior_folder: str = "prior"
    summary_folder: str = "summaries"
    vposer_ckpt: str = ""
    part_segm_fn: str = ""

    # --- format / model
    format: str = "coco25"              # coco25 | halpe | coco_wholebody
    model_type: str = "smplx"
    gender: str = "neutral"
    float_dtype: str = "float32"
    num_betas: int = 10
    num_expression_coeffs: int = 10
    num_pca_comps: int = 12
    use_pca: bool = True
    flat_hand_mean: bool = False
    use_hands: bool = True
    use_face: bool = True
    use_face_contour: bool = False
    joints_to_ign: List[int] = field(default_factory=lambda: [-1])

    # --- priors
    body_prior_type: str = "l2"          # l2 | gmm | none
    left_hand_prior_type: str = "l2"
    right_hand_prior_type: str = "l2"
    jaw_prior_type: str = "l2"
    num_gaussians: int = 8
    use_vposer: bool = False
    vposer_latent_dim: int = 32

    # --- regression priors
    regression_prior: Optional[str] = None   # PIXIE | ExPose | PARE | combined
    pixie_results_directory: Optional[str] = None
    expose_results_directory: Optional[str] = None
    pare_results_directory: Optional[str] = None
    use_camera_prior: bool = False

    # --- energy
    rho: float = 100.0
    use_joints_conf: bool = True
    use_conf_for_camera_init: bool = False
    confidence_threshold: float = 0.0
    interpenetration: bool = False
    df_cone_height: float = 0.5
    penalize_outside: bool = False
    max_collisions: int = 8
    # Broad-phase calibration (tests/test_collision_oracle.py measures the
    # budgets against an exact all-pairs oracle at SMPL-X face count:
    # ~1.6k surviving pairs under heavy self-contact).  collision_window is
    # accepted for config compatibility; the Morton hierarchy has no
    # window assumption and ignores it.
    collision_window: int = 640
    max_coll_pairs: int = 4096
    # Rebuild the collision candidate-pair list every N optimizer
    # iterations (1 = every iteration; the pair list is AABB-rechecked at
    # every evaluation either way).  The reference rebuilds its BVH every
    # closure evaluation; see fitting/lbfgs.py aux_every for the tradeoff.
    # None => derived from `profile`: fast refreshes every 12 iterations
    # (B=64 A/B, round 5: 12 beat 8 and 15 — 21.4 vs 18.6 vs 19.9 fps —
    # at indistinguishable final loss), reference keeps 1.
    coll_broad_every: Optional[int] = None
    # Optimizer profile — resolves the line-search knobs below when they
    # are not set explicitly:
    #   "fast" (DEFAULT): Armijo backtracking with value-only trials, a
    #     straggler cap on objective evaluations (~1.5x the iteration
    #     budget, the measured p90 of per-lane eval counts), and
    #     soft-accept after 6 line-search probes.  A/B-measured against
    #     strong Wolfe at B=128 (tools/ab_flagship.py, round 4): ~2x
    #     throughput with final loss 1.2% LOWER and full-scale
    #     synthetic-GT quality indistinguishable (43.4 vs 43.3 mm PA-V2V)
    #     — so fast is the production default, not a bench special.
    #   "reference": strong-Wolfe line search with unlimited evaluations —
    #     the reference's lbfgs_ls semantics (optimizers/lbfgs_ls.py),
    #     for trajectory-level comparisons against the torch pipeline.
    # Quality gates covering the default: tests/test_quality_gate.py
    # (fast-profile demo golden + synthetic-GT thresholds) and the
    # per-round TPU quality artifact (tests/test_quality_artifact.py).
    profile: str = "fast"
    # Line-search algorithm for the body stages: "wolfe" (strong Wolfe,
    # the reference's lbfgs_ls) or "armijo" (backtracking
    # sufficient-decrease; ~1-2 objective evaluations per iteration vs ~5
    # under strong Wolfe on these energies — a throughput knob for
    # collision-enabled fits where each evaluation carries a full-mesh
    # forward + narrow phase).  None => derived from `profile`.
    ls_mode: Optional[str] = None
    # Cap on total objective evaluations per stage (0 = unlimited; None =>
    # derived from `profile`: fast caps at ~1.5x the iteration budget —
    # batched fits wait for the slowest lane, and straggler lanes burn ~3x
    # the median eval count for marginal loss improvement).
    max_evals: Optional[int] = None
    # Accept any sufficient-decrease point after this many line-search
    # probes (None => derived from `profile`: 6 under fast, off under
    # reference).
    ls_soft_accept: Optional[int] = None
    point2plane: bool = False
    ign_part_pairs: List[str] = field(default_factory=list)

    # --- runtime
    # Force a JAX platform ("cpu"/"tpu") before backend init; None keeps
    # the environment default.  Must be applied before any jax op runs —
    # app.run() does this first thing (the sandbox's sitecustomize makes
    # the JAX_PLATFORMS env var insufficient).
    platform: Optional[str] = None

    # --- camera
    focal_length: Optional[float] = None  # None => sqrt(W^2 + H^2)
    camera_type: str = "persp"
    depth_loss_weight: float = 1e2
    init_joints_idxs: List[int] = field(default_factory=lambda: [9, 12, 2, 5])
    body_tri_idxs: List[int] = field(default_factory=lambda: [5, 12, 2, 9])
    side_view_thsh: float = 25.0
    # Dual-orientation retry (reference fit_single_frame.py:461-463 tries a
    # 180deg-flipped orientation for frames whose 2D shoulder distance is
    # under side_view_thsh).  The batched pipeline expresses it as a static
    # batch doubling with per-frame eligibility masks; set false to skip
    # the doubling (~2x body-stage compute) when no frame can be side-view.
    try_both_orient: bool = True

    # --- stage weight schedules (list length = number of stages)
    data_weights: Optional[List[float]] = None  # dead in the reference, kept
    body_pose_prior_weights: List[float] = field(
        default_factory=lambda: [404.0, 404.0, 57.4, 4.78]
    )
    shape_weights: Optional[List[float]] = None
    expr_weights: Optional[List[float]] = None
    hand_pose_prior_weights: Optional[List[float]] = None
    jaw_pose_prior_weights: Optional[List[Any]] = None
    hand_joints_weights: Optional[List[float]] = None
    face_joints_weights: Optional[List[float]] = None
    coll_loss_weights: Optional[List[float]] = None

    # Per-group freezing (reference cmd_parser.py:101-110; parsed-but-dead
    # in the fork, live here: frozen groups become 0-entries in the
    # body-stage gradient mask, fitting/params.py::body_stage_mask).
    optim_shape: bool = True
    optim_expression: bool = True
    optim_jaw: bool = True
    optim_hands: bool = True
    # Main-stage energy selector (reference cmd_parser.py:45,
    # fitting.py:278-284): 'smplify' is the only end-to-end loss; the
    # 'camera_init' energy is stage 0 of every fit here
    # (fitting/energy.py::camera_init_energy), not a standalone run mode.
    loss_type: str = "smplify"

    # --- optimizer
    optim_type: str = "lbfgsls"
    lr: float = 1.0
    ftol: float = 1e-9
    gtol: float = 1e-9
    maxiters: int = 30
    # Flat per-stage L-BFGS iteration budget; None derives maxiters * 5
    # (the reference runs up to maxiters outer x maxiters inner with
    # ftol/gtol early exits — a single flat cap fits the one-while-loop
    # batched optimizer; calibration in docs/ARCHITECTURE.md).
    lbfgs_iters_per_stage: Optional[int] = None
    history_size: int = 16
    # Line-search trial cap per iteration.  None => derived from `profile`:
    # fast caps Armijo backtracking at 4 trials (B=64 collision-on A/B,
    # round 5: 32.5 vs 25.2 fps with final loss 1% LOWER — batched lanes
    # pay the per-iteration MAX trial count, and the best-decreasing-point
    # fallback + the final value_and_grad make a capped search safe);
    # reference keeps the torch lbfgs_ls default of 25.
    max_line_search: Optional[int] = None

    # --- runtime
    # Minimum padded batch per gender group.  Groups are always fitted
    # whole (every frame simultaneously — no upper limit); each group is
    # padded up to the next power of two >= max(group size, batch_size) so
    # uneven groups share compiled executables (bucketing).
    batch_size: int = 1
    interactive: bool = True
    visualize: bool = False
    save_meshes: bool = True
    save_vertices: bool = False
    use_gender_classifier: bool = False
    homogeneous_ckpt: str = ""
    max_persons: int = 3
    # Fit every detected person (up to max_persons) instead of person 0 only
    # (the reference's quirk, main.py:245-246).
    fit_all_persons: bool = False
    degrees: List[float] = field(default_factory=lambda: [0, 90, 180, 270])
    # Use a synthetic body model instead of loading SMPLX_{GENDER}.npz —
    # lets the full pipeline run where the licensed artifacts are absent.
    synthetic_model: bool = False
    synthetic_num_verts: int = 10475
    # Warm-start from a previous run's results folder (the reference wipes
    # and restarts; this is the resume story it lacks).
    resume_from: Optional[str] = None

    @property
    def num_stages(self) -> int:
        return len(self.body_pose_prior_weights)

    # --- profile resolution (explicit knobs always win) -----------------

    @property
    def resolved_ls_mode(self) -> str:
        if self.ls_mode is not None:
            return self.ls_mode
        return "armijo" if self.profile == "fast" else "wolfe"

    @property
    def resolved_lbfgs_iters(self) -> int:
        """Flat per-stage L-BFGS iteration budget.  The reference runs up
        to maxiters outer x maxiters inner with ftol/gtol early exits; the
        reference profile keeps the generous 5x flat cap, fast uses 2x
        (the bench-measured budget — with ~1.5 evals/iteration under
        Armijo the eval cap binds first anyway)."""
        if self.lbfgs_iters_per_stage:
            return self.lbfgs_iters_per_stage
        return self.maxiters * (2 if self.profile == "fast" else 5)

    @property
    def resolved_max_evals(self) -> int:
        if self.max_evals is not None:
            return self.max_evals
        if self.profile == "fast":
            return (3 * self.resolved_lbfgs_iters) // 2
        return 0

    @property
    def resolved_coll_broad_every(self) -> int:
        if self.coll_broad_every is not None:
            return self.coll_broad_every
        return 12 if self.profile == "fast" else 1

    @property
    def resolved_max_line_search(self) -> int:
        if self.max_line_search is not None:
            return self.max_line_search
        return 4 if self.profile == "fast" else 25

    @property
    def resolved_ls_soft_accept(self) -> Optional[int]:
        """None => LBFGSConfig keeps its own (effectively-off) default."""
        if self.ls_soft_accept is not None:
            return self.ls_soft_accept
        return 6 if self.profile == "fast" else None

    # Fields accepted for reference-CLI compatibility but intentionally not
    # consumed anywhere (tests/test_config.py asserts every OTHER field is
    # referenced by the package).  Each entry states why.
    IGNORED_FOR_COMPAT = {
        "data_weights": (
            "dead in the reference too: fit_single_frame.py:566 overwrites "
            "the scheduled value with 1000/H every stage"
        ),
        "degrees": (
            "dead in the reference too: accepted at fit_single_frame.py:103 "
            "and never read after the :133-134 default"
        ),
        "collision_window": (
            "legacy sorted-axis sweep parameter; the Morton hierarchy broad "
            "phase has no window assumption (ops/collision.py) and ignores "
            "it — accepted so old configs load"
        ),
        "summary_folder": (
            "dead in the reference too: the TensorBoard flag is parsed at "
            "cmd_parser.py:80-81 and never read; accepted so old configs "
            "load"
        ),
    }

    @property
    def body_tri_pairs(self) -> list[tuple[int, int]]:
        """Flat index list -> pairs (reference cmd_parser.py:307-316)."""
        flat = self.body_tri_idxs
        assert len(flat) % 2 == 0, (
            "Number of body_tri_idxs must be divisible by 2, got "
            f"{len(flat)}"
        )
        return [(flat[i], flat[i + 1]) for i in range(0, len(flat), 2)]

    def validate(self) -> "Config":
        S = self.num_stages
        for name in ("data_weights", "shape_weights", "expr_weights",
                     "hand_pose_prior_weights", "jaw_pose_prior_weights",
                     "hand_joints_weights", "face_joints_weights",
                     "coll_loss_weights"):
            v = getattr(self, name)
            if v is not None and len(v) != S:
                raise ValueError(
                    f"{name} has {len(v)} entries but there are {S} stages "
                    "(stage count is the length of body_pose_prior_weights)"
                )
        if self.format.lower() not in ("coco25", "coco19", "halpe",
                                       "coco_wholebody"):
            raise ValueError(f"Unknown format {self.format}")
        if self.profile.lower() not in ("fast", "reference"):
            raise ValueError(
                f"Unknown profile {self.profile} (fast | reference)"
            )
        if (self.ls_mode is not None
                and self.ls_mode.lower() not in ("wolfe", "armijo")):
            raise ValueError(f"Unknown ls_mode {self.ls_mode}")
        if self.loss_type.lower() != "smplify":
            raise ValueError(
                f"Unknown loss type: {self.loss_type} (the reference's "
                "other value, 'camera_init', is the built-in stage-0 "
                "energy, not a run mode)"
            )
        return self


def load_config(path: Optional[str] = None, **overrides) -> Config:
    """Load a YAML preset, apply keyword overrides, validate."""
    values: dict = {}
    if path is not None:
        with open(osp.expandvars(path)) as f:
            raw = yaml.safe_load(f) or {}
        known = {f.name for f in dataclasses.fields(Config)}
        values = {k: v for k, v in raw.items() if k in known}
        unknown = set(raw) - known
        if unknown:
            import warnings

            warnings.warn(f"ignoring unknown config keys: {sorted(unknown)}")
    values.update(overrides)
    return Config(**values).validate()


def save_config(cfg: Config, path: str) -> None:
    """Dump the resolved config (reference conf.yaml dump, main.py:59-61)."""
    with open(path, "w") as f:
        yaml.safe_dump(dataclasses.asdict(cfg), f)


def parse_cli(argv: Optional[Sequence[str]] = None) -> Config:
    """--config preset.yaml plus --key value overrides for every field."""
    parser = argparse.ArgumentParser(
        prog="smplifyx-tpu", description="TPU-native batched SMPLify-X fitting"
    )
    parser.add_argument("-c", "--config", required=False, default=None,
                        help="YAML config preset")
    known = {f.name: f for f in dataclasses.fields(Config)}
    for name, fld in known.items():
        parser.add_argument(f"--{name}", default=None, nargs="*"
                            if "List" in str(fld.type) else None)
    args = vars(parser.parse_args(argv))
    config_path = args.pop("config")

    overrides = {}
    for k, v in args.items():
        if v is None:
            continue
        fld = known[k]
        t = str(fld.type)
        if "List[float]" in t:
            overrides[k] = [float(x) for x in v]
        elif "List[int]" in t:
            overrides[k] = [int(x) for x in v]
        elif "List" in t:
            overrides[k] = list(v)
        elif "bool" in t:
            overrides[k] = str(v).lower() in ("1", "true", "yes")
        elif "int" in t:
            overrides[k] = int(v)
        elif "float" in t:
            overrides[k] = float(v)
        else:
            overrides[k] = v
    return load_config(config_path, **overrides)
