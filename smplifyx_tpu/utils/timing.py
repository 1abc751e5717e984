"""Timing and profiling helpers.

The reference's observability is wall-clock prints around camera init /
stages / orientations with cuda synchronization (SURVEY.md §5;
fit_single_frame.py:490-507, 587-604, 628-639).  The TPU equivalents:

  * `Timer` — wall-clock spans that block on device work (the moral
    equivalent of torch.cuda.synchronize + time.time);
  * `trace` — a context manager around jax.profiler for real TPU traces
    viewable in TensorBoard/XProf (the reference has no profiler hooks);
  * `FitStats` — per-batch iteration/evaluation counters surfaced from the
    optimizer's LBFGSResult, replacing per-iteration loss prints that would
    force host syncs.
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field
from typing import Optional

import numpy as np


@dataclass
class Timer:
    """Named wall-clock spans; `block_on` forces device completion first."""

    spans: dict = field(default_factory=dict)

    @contextlib.contextmanager
    def span(self, name: str, block_on=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if block_on is not None:
                import jax

                jax.block_until_ready(block_on)
            self.spans[name] = self.spans.get(name, 0.0) + (
                time.perf_counter() - t0
            )

    def report(self) -> str:
        total = sum(self.spans.values())
        lines = [f"{k}: {v:.3f}s ({100 * v / max(total, 1e-9):.1f}%)"
                 for k, v in self.spans.items()]
        return "\n".join(lines)


@contextlib.contextmanager
def trace(log_dir: str):
    """jax.profiler trace around a block (TensorBoard-compatible)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@dataclass
class FitStats:
    """Summary statistics of a batched fit (from FitResult / LBFGSResult)."""

    losses: np.ndarray
    camera_losses: Optional[np.ndarray] = None
    flipped: Optional[np.ndarray] = None
    # [S, B] objective evaluations per body stage (FitResult.stage_evals):
    # the line-search work profile; batch wall-clock tracks the per-stage
    # max over lanes.
    stage_evals: Optional[np.ndarray] = None

    def summary(self) -> dict:
        out = {
            "loss_mean": float(np.mean(self.losses)),
            "loss_median": float(np.median(self.losses)),
            "loss_max": float(np.max(self.losses)),
            "num_frames": int(len(self.losses)),
            "num_nonfinite": int((~np.isfinite(self.losses)).sum()),
        }
        if self.camera_losses is not None:
            out["camera_loss_mean"] = float(np.mean(self.camera_losses))
        if self.flipped is not None:
            out["num_flipped_orientation"] = int(np.sum(self.flipped))
        if self.stage_evals is not None:
            ev = np.asarray(self.stage_evals)
            out["stage_evals_mean"] = [float(m) for m in ev.mean(axis=1)]
            out["stage_evals_max"] = [int(m) for m in ev.max(axis=1)]
        return out
