"""Snapshot / resume via orbax (reference: Caffe solver snapshotting every
20k iters to temp/models/3C4X, temp/solver.prototxt:14-15)."""
from __future__ import annotations

from pathlib import Path
from typing import Any

import jax
import numpy as np


class Checkpointer:
    """Minimal params+optimizer snapshotter. Uses orbax when importable,
    falling back to flat npz (same on-disk contract either way: `latest()`
    restores the newest step)."""

    def __init__(self, directory: str | Path) -> None:
        self.dir = Path(directory)
        self.dir.mkdir(parents=True, exist_ok=True)
        try:
            import orbax.checkpoint as ocp
            self._ocp = ocp
        except Exception:  # pragma: no cover - orbax is baked in normally
            self._ocp = None

    # -- flat (de)construction: pytree <-> {path: array} -------------------
    @staticmethod
    def _flatten(tree: Any) -> dict[str, np.ndarray]:
        flat = {}
        for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
            key = "/".join(str(getattr(p, "key", getattr(p, "idx", p)))
                           for p in path)
            flat[key] = np.asarray(leaf)
        return flat

    def save(self, state, step: int) -> Path:
        path = self.dir / f"step_{step:08d}"
        if self._ocp is not None:
            ckptr = self._ocp.PyTreeCheckpointer()
            ckptr.save(path.absolute(), {"params": state.params,
                                         "opt_state": state.opt_state,
                                         "step": state.step},
                       force=True)
        else:
            np.savez_compressed(
                path.with_suffix(".npz"),
                step=np.asarray(state.step),
                **{f"params/{k}": v for k, v in self._flatten(state.params).items()})
        return path

    def steps(self) -> list[int]:
        out = []
        for p in self.dir.iterdir():
            if p.name.startswith("step_"):
                out.append(int(p.name.split("_")[1].split(".")[0]))
        return sorted(set(out))

    def restore(self, step: int, template=None):
        path = self.dir / f"step_{step:08d}"
        if self._ocp is not None and path.is_dir():
            ckptr = self._ocp.PyTreeCheckpointer()
            return ckptr.restore(path.absolute())
        z = np.load(path.with_suffix(".npz"))
        params: dict[str, dict[str, np.ndarray]] = {}
        for k in z.files:
            if k.startswith("params/"):
                layer, name = k[len("params/"):].rsplit("/", 1)
                params.setdefault(layer, {})[name] = z[k]
        return {"params": params, "opt_state": None, "step": int(z["step"])}

    def latest(self, template=None):
        steps = self.steps()
        if not steps:
            return None
        return self.restore(steps[-1], template)
