"""Metrics logging: JSONL + optional TensorBoard.

The reference logs per-step scalars and image grids through tensorboardX
from inside the model (mnist_train.py:56-61, 703-712).  Here logging is a
standalone subsystem: every scalar goes to an append-only JSONL file (the
canonical record, trivially machine-readable for the plots/ tooling) and,
when the optional torch TensorBoard writer is importable, mirrored there.
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional


class MetricsLogger:
    def __init__(self, logdir: str, tensorboard: bool = True, tag: str = "train"):
        os.makedirs(logdir, exist_ok=True)
        self.logdir = logdir
        self.path = os.path.join(logdir, f"{tag}.jsonl")
        self._f = open(self.path, "a", buffering=1)
        self._tb = None
        if tensorboard:
            try:  # torch's pure-python TB writer; optional
                from torch.utils.tensorboard import SummaryWriter

                self._tb = SummaryWriter(log_dir=os.path.join(logdir, "tb"))
            except Exception:
                self._tb = None

    def scalars(self, step: int, values: Dict[str, float], prefix: str = ""):
        rec = {"step": int(step), "time": time.time()}
        for k, v in values.items():
            key = f"{prefix}{k}"
            rec[key] = float(v)
            if self._tb is not None:
                self._tb.add_scalar(key, float(v), int(step))
        self._f.write(json.dumps(rec) + "\n")

    def image_grid(self, step: int, tag: str, grid_u8):
        """grid_u8: (H, W, C) uint8.  Saved as PNG next to the JSONL (and to
        TensorBoard when available) — the reference's sample/reconstruction
        grids (mnist_train.py:518, 554)."""
        from PIL import Image

        arr = grid_u8 if grid_u8.shape[-1] != 1 else grid_u8[..., 0]
        path = os.path.join(self.logdir, f"{tag}_{step:07d}.png")
        Image.fromarray(arr).save(path)
        if self._tb is not None:
            chw = grid_u8.transpose(2, 0, 1)
            self._tb.add_image(tag, chw, int(step))
        return path

    def text(self, tag: str, s: str):
        if self._tb is not None:
            self._tb.add_text(tag, s)

    def close(self):
        self._f.close()
        if self._tb is not None:
            self._tb.close()
