"""Training loggers: TensorBoard scalars + JSONL fallback.

Mirrors neddf/logger/{base_logger.py,nerf_tb_logger.py}: per-iteration
records (loss, PSNR, per-objective values, batch timing) flushed each
step under the same scalar names ("loss", "PSNR", "objective/<key>",
"iteration duration", "total duration"), log_dir="log".
"""
from __future__ import annotations

import json
from pathlib import Path
from time import time
from typing import Dict


class BaseLogger:
    def __init__(self) -> None:
        self.loss = 0.0
        self.psnr = 0.0
        self.loss_dict: Dict[str, float] = {}
        self.loggerstart = time()
        self.batchstart = self.loggerstart
        self.batchend = self.loggerstart
        self.niter = 0

    def write(
        self,
        loss: float,
        psnr: float,
        loss_dict: Dict[str, float],
        rays_per_sec: float = 0.0,
        duration: float = None,
    ) -> None:
        self.loss = float(loss)
        self.psnr = float(psnr)
        self.loss_dict = {k: float(v) for k, v in loss_dict.items()}
        self.rays_per_sec = float(rays_per_sec)
        # explicit per-step duration (batched flushing records several
        # steps at once; the batchstart/batchend pair only covers the last)
        self.duration = duration

    def write_batchstart(self) -> None:
        self.batchstart = time()

    def write_batchend(self) -> None:
        self.batchend = time()

    def next(self) -> None:
        duration = getattr(self, "duration", None)
        if duration is None:
            duration = self.batchend - self.batchstart
        log_dict: Dict[str, float] = {
            "loss": self.loss,
            "PSNR": self.psnr,
            "iteration duration": duration,
            "total duration": self.batchend - self.loggerstart,
        }
        if getattr(self, "rays_per_sec", 0.0):
            log_dict["rays per sec"] = self.rays_per_sec
        for key, val in self.loss_dict.items():
            log_dict[f"objective/{key}"] = val
        self._next_impl(log_dict)
        self.niter += 1

    def _next_impl(self, log_dict: Dict[str, float]) -> None:
        raise NotImplementedError()


class NeRFTBLogger(BaseLogger):
    """TensorBoard scalars in ./log (like the reference); falls back to
    JSONL if tensorboard is unavailable."""

    def __init__(self, log_dir: str = "log") -> None:
        super().__init__()
        self._writer = None
        try:
            from torch.utils.tensorboard import SummaryWriter

            self._writer = SummaryWriter(log_dir=log_dir)
        except Exception:
            Path(log_dir).mkdir(parents=True, exist_ok=True)
            self._jsonl = open(Path(log_dir) / "train_log.jsonl", "a")

    def _next_impl(self, log_dict: Dict[str, float]) -> None:
        if self._writer is not None:
            for key, val in log_dict.items():
                self._writer.add_scalar(key, val, self.niter)
        else:
            self._jsonl.write(json.dumps({"iter": self.niter, **log_dict}) + "\n")
            self._jsonl.flush()
