"""Mid-solve checkpoint/resume.

The reference's only resumability is artifact-level (stage prototxt/
caffemodel pairs + the frozen pickle, SURVEY.md §5 'Checkpoint / resume');
a crash inside the per-layer solve loop loses the whole pass. Here the solve
drivers (pipeline/c3.py) snapshot their full state every K layers, so a
killed process — including the axon TPU worker faulting mid-run — resumes
from the last completed layer with identical results (everything downstream
of the snapshot is recomputed deterministically).
"""
from __future__ import annotations

import pickle
from pathlib import Path
from typing import Any


class SolveCheckpoint:
    """Pickle-based solve-state snapshotter. `path=None` disables it."""

    def __init__(self, path: str | Path | None, every: int = 3) -> None:
        self.path = Path(path) if path else None
        self.every = max(1, every)

    def load(self) -> tuple[int, dict[str, Any]] | None:
        if self.path is None or not self.path.exists():
            return None
        with open(self.path, "rb") as f:
            snap = pickle.load(f)
        return snap["layer_index"], snap["state"]

    def maybe_save(self, layer_index: int, state: dict[str, Any],
                   force: bool = False) -> None:
        if self.path is None:
            return
        if not force and (layer_index + 1) % self.every:
            return
        tmp = self.path.with_suffix(".tmp")
        self.path.parent.mkdir(parents=True, exist_ok=True)
        with open(tmp, "wb") as f:
            pickle.dump({"layer_index": layer_index, "state": state},
                        f, protocol=4)
        tmp.replace(self.path)

    def clear(self) -> None:
        if self.path is not None and self.path.exists():
            self.path.unlink()
