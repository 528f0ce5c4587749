"""Checkpoint / resume for long renders and optimization runs.

The reference re-renders from scratch every run; its only persisted
artifact is ``output.bmp`` (``/root/reference/src/main.c:329``). SURVEY.md
SS5 mandates restartable renders: we persist the **accumulated sample
buffer** together with the spp-so-far and the RNG root seed. Because
sample streams are counter-based on (pixel, sample) indices
(ops/rng.seed_state) and ``render_tile`` takes a ``sample_offset``,
resuming simply continues at ``spp_done`` — the completed render is
bit-identical to an uninterrupted one (tested).

Inverse-rendering runs persist the **optimizer state pytree** (params +
optax state + step counter + loss history) via :func:`save_fit` /
:func:`load_fit`; per-step RNG seeds are step-indexed (grad/diff.py), so
a resumed fit continues bit-identically too (tested in test_app.py).

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

__all__ = [
    "RenderCheckpoint", "save_render", "load_render", "accumulate",
    "save_fit", "load_fit",
]


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


def save_fit(path, step: int, params, opt_state, losses) -> None:
    """Persist an optimization run: params + optax state pytrees, the step
    counter and the loss history. Leaves are saved flat (``leaf_{i}``);
    :func:`load_fit` restores into the caller's template pytrees, so no
    pickling of optax internals is needed. Atomic like save_render."""
    import jax

    leaves_p, _ = jax.tree_util.tree_flatten(params)
    leaves_o, _ = jax.tree_util.tree_flatten(opt_state)
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=path.parent, suffix=".tmp")
    arrays = {f"p_{i}": np.asarray(l) for i, l in enumerate(leaves_p)}
    arrays.update({f"o_{i}": np.asarray(l) for i, l in enumerate(leaves_o)})
    try:
        with os.fdopen(fd, "wb") as f:
            np.savez(
                f,
                step=np.int64(step),
                losses=np.asarray(losses, np.float64),
                n_params=np.int64(len(leaves_p)),
                n_opt=np.int64(len(leaves_o)),
                **arrays,
            )
        os.replace(tmp, path)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)


def load_fit(path, params_like, opt_state_like):
    """Restore ``(step, params, opt_state, losses)`` saved by save_fit.

    ``params_like`` / ``opt_state_like`` provide the pytree structure (and
    leaf dtypes) to restore into — build them exactly as the fit function
    does before resuming. Raises ValueError on a leaf-count mismatch
    (e.g. resuming with a different optimizer or parameterization)."""
    import jax

    with np.load(path) as z:
        step = int(z["step"])
        losses = [float(x) for x in z["losses"]]
        n_p, n_o = int(z["n_params"]), int(z["n_opt"])
        leaves_p = [z[f"p_{i}"] for i in range(n_p)]
        leaves_o = [z[f"o_{i}"] for i in range(n_o)]

    def restore(like, leaves, what):
        flat, treedef = jax.tree_util.tree_flatten(like)
        if len(flat) != len(leaves):
            raise ValueError(
                f"fit checkpoint {what} has {len(leaves)} leaves, "
                f"template has {len(flat)} — different optimizer/params?"
            )
        import jax.numpy as jnp

        cast = [jnp.asarray(l, getattr(f, "dtype", None))
                for f, l in zip(flat, leaves)]
        return jax.tree_util.tree_unflatten(treedef, cast)

    return (
        step,
        restore(params_like, leaves_p, "params"),
        restore(opt_state_like, leaves_o, "opt_state"),
        losses,
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
