"""Structured metrics logging (SURVEY.md §5.5).

The reference logs through tqdm postfixes and optional Accelerate trackers
(train_latent_cfg.py:621-628; train_stage1_diffusers.py:833). Here: an
append-only JSONL stream (one object per logged step — trivially plottable,
greppable, and diffable across runs) plus optional TensorBoard event writing
when `tensorboard` happens to be importable.
"""

from __future__ import annotations

import json
import time
from pathlib import Path
from typing import Dict, Optional

__all__ = ["MetricsLogger"]


class MetricsLogger:
    def __init__(self, log_dir: str | Path, run_name: str = "train",
                 tensorboard: bool = False):
        self.log_dir = Path(log_dir)
        self.log_dir.mkdir(parents=True, exist_ok=True)
        self.path = self.log_dir / f"{run_name}.jsonl"
        self._file = open(self.path, "a")
        self._t0 = time.time()

        self._tb = None
        if tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._tb = SummaryWriter(str(self.log_dir / "tb"))
            except Exception:
                pass  # tensorboard unavailable — JSONL only

    def log(self, step: int, metrics: Dict[str, float],
            prefix: Optional[str] = None):
        rec = {"step": int(step), "wall_s": round(time.time() - self._t0, 3)}
        for k, v in metrics.items():
            key = f"{prefix}/{k}" if prefix else k
            try:
                rec[key] = float(v)
            except (TypeError, ValueError):
                rec[key] = str(v)
        self._file.write(json.dumps(rec) + "\n")
        self._file.flush()
        if self._tb is not None:
            for k, v in rec.items():
                if k not in ("step", "wall_s") and isinstance(v, float):
                    self._tb.add_scalar(k, v, step)

    def close(self):
        self._file.close()
        if self._tb is not None:
            self._tb.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
