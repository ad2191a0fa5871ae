"""Checkpointing: milestone + latest layout over Orbax, with config embedding.

Behavior target: the reference's monolithic torch.save layout
(/root/reference/train_latent_cfg.py:750-781 — `model-{milestone}.pt` plus a
`model-latest.pt` pointer, config dict embedded; train_vqgan.py:372-390 —
`vqgan-{m}.pt` + `vqgan_latest.pt`). Here each milestone is an Orbax
directory `{prefix}-{milestone}/` and `latest` is a JSON pointer file —
re-hydration uses `.get`-style defaults exactly like the reference's loaders
(generate.py:50-86).

All checkpoints store plain pytrees: {step, params/..., config} — trainers
decide the composition.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Dict, Optional

import jax
import orbax.checkpoint as ocp

__all__ = ["CheckpointManager"]


class CheckpointManager:
    def __init__(self, directory: str | Path, prefix: str = "model"):
        self.directory = Path(directory).absolute()
        self.directory.mkdir(parents=True, exist_ok=True)
        self.prefix = prefix
        self._ckptr = ocp.StandardCheckpointer()

    # ------------------------------------------------------------------

    def _milestone_dir(self, milestone: int | str) -> Path:
        return self.directory / f"{self.prefix}-{milestone}"

    def _latest_pointer(self) -> Path:
        return self.directory / f"{self.prefix}-latest.json"

    def save(
        self,
        milestone: int,
        state: Any,
        config: Optional[Dict] = None,
        keep_all: bool = True,
    ) -> Path:
        """Save a milestone and update the latest pointer. `state` is any
        pytree of arrays; `config` is JSON-serializable metadata."""
        path = self._milestone_dir(milestone)
        if path.exists():
            # orbax refuses to overwrite; mirror torch.save semantics
            import shutil

            shutil.rmtree(path)
        self._ckptr.save(path, jax.tree.map(lambda x: x, state))
        self._ckptr.wait_until_finished()
        if config is not None:
            (path.parent / f"{path.name}.config.json").write_text(
                json.dumps(config, default=str, indent=2))
        self._latest_pointer().write_text(
            json.dumps({"milestone": milestone}))
        return path

    def latest_milestone(self) -> Optional[int]:
        p = self._latest_pointer()
        if not p.exists():
            # fall back to scanning (tolerant load, like generate.py's
            # multi-format handling)
            candidates = []
            for d in self.directory.glob(f"{self.prefix}-*"):
                suffix = d.name.rsplit("-", 1)[-1]
                if d.is_dir() and suffix.isdigit():
                    candidates.append(int(suffix))
            return max(candidates) if candidates else None
        return json.loads(p.read_text())["milestone"]

    def restore(
        self, milestone: Optional[int] = None, target: Any = None
    ) -> Any:
        """Restore a milestone ('latest' when None). `target` provides the
        pytree structure/shardings; None restores as raw arrays."""
        if milestone is None:
            milestone = self.latest_milestone()
            if milestone is None:
                raise FileNotFoundError(
                    f"no checkpoints under {self.directory}")
        path = self._milestone_dir(milestone)
        if target is not None:
            return self._ckptr.restore(path, target)
        return self._ckptr.restore(path)

    def load_config(self, milestone: Optional[int] = None) -> Optional[Dict]:
        if milestone is None:
            milestone = self.latest_milestone()
        p = self.directory / f"{self.prefix}-{milestone}.config.json"
        return json.loads(p.read_text()) if p.exists() else None

    def all_milestones(self):
        out = []
        for d in sorted(self.directory.glob(f"{self.prefix}-*")):
            suffix = d.name.rsplit("-", 1)[-1]
            if d.is_dir() and suffix.isdigit():
                out.append(int(suffix))
        return sorted(out)
