"""Checkpoint / resume for long renders and optimization runs.

The reference re-renders from scratch every run; its only persisted
artifact is ``output.bmp`` (``/root/reference/src/main.c:329``). SURVEY.md
SS5 mandates restartable renders: we persist the **accumulated sample
buffer** together with the spp-so-far and the RNG root seed. Because
sample streams are counter-based on (pixel, sample) indices
(ops/rng.seed_state) and ``render_tile`` takes a ``sample_offset``,
resuming simply continues at ``spp_done`` — the completed render is
bit-identical to an uninterrupted one (tested). Inverse-rendering runs
persist optimizer params the same way.

Storage is a plain .npz (atomic via temp-file rename); orbax is available
in the environment for sharded multi-host arrays, but a render accumulator
is a single small host array and does not need it.
"""

from __future__ import annotations

import json
import os
import tempfile
from pathlib import Path

import numpy as np

__all__ = ["RenderCheckpoint", "save_render", "load_render", "accumulate"]


class RenderCheckpoint:
    """Accumulated radiance sum + progress counters."""

    def __init__(self, accum, spp_done: int, seed: int, meta: dict | None = None):
        self.accum = np.asarray(accum, np.float32)  # (H, W, 3) radiance *sum*
        self.spp_done = int(spp_done)
        self.seed = int(seed)
        self.meta = dict(meta or {})

    @property
    def image(self):
        """Mean radiance so far."""
        return self.accum / max(self.spp_done, 1)


def save_render(path, ckpt: RenderCheckpoint) -> None:
    """Atomic save: write to a temp file in the same dir, then rename."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=path.parent, suffix=".tmp")
    try:
        with os.fdopen(fd, "wb") as f:
            np.savez(
                f,
                accum=ckpt.accum,
                spp_done=np.int64(ckpt.spp_done),
                seed=np.int64(ckpt.seed),
                meta=np.frombuffer(
                    json.dumps(ckpt.meta).encode(), dtype=np.uint8
                ),
            )
        os.replace(tmp, path)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)


def load_render(path) -> RenderCheckpoint:
    with np.load(path) as z:
        meta = json.loads(bytes(z["meta"]).decode()) if "meta" in z else {}
        return RenderCheckpoint(
            z["accum"], int(z["spp_done"]), int(z["seed"]), meta
        )


def accumulate(ckpt: RenderCheckpoint | None, radiance, spp: int, seed: int,
               meta: dict | None = None) -> RenderCheckpoint:
    """Fold a freshly rendered ``spp``-sample mean into the accumulator."""
    add = np.asarray(radiance, np.float32) * spp
    if ckpt is None:
        return RenderCheckpoint(add, spp, seed, meta)
    if ckpt.seed != seed:
        raise ValueError(f"seed mismatch: checkpoint {ckpt.seed} vs {seed}")
    return RenderCheckpoint(ckpt.accum + add, ckpt.spp_done + spp, seed, ckpt.meta)
