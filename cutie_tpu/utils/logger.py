"""TensorBoard logging.

Behavioral parity target: reference cutie/utils/logger.py:29-107
(TensorboardLogger: scalars/strings/images, git SHA stamping, rank-0-only
writer). Uses torch.utils.tensorboard (available in this environment) with a
no-op fallback.
"""
from __future__ import annotations

import datetime
import logging
import os
import subprocess
from typing import Optional

import numpy as np

log = logging.getLogger(__name__)


class TensorboardLogger:
    def __init__(self, run_dir: Optional[str], *, enabled: bool = True,
                 py_logger: Optional[logging.Logger] = None):
        """enabled should be process_index == 0 in multi-host runs."""
        self.py_log = py_logger or log
        self.board = None
        self.time_estimator = None
        if enabled and run_dir is not None:
            try:
                from torch.utils.tensorboard import SummaryWriter
                os.makedirs(run_dir, exist_ok=True)
                self.board = SummaryWriter(run_dir)
            except Exception as e:  # keep training alive without TB
                self.py_log.warning("TensorBoard writer unavailable: %s", e)
        self.log_string("creation_time", str(datetime.datetime.now()))
        self._log_git_sha()

    def _log_git_sha(self):
        try:
            sha = subprocess.check_output(
                ["git", "rev-parse", "HEAD"],
                cwd=os.path.dirname(os.path.abspath(__file__)),
                stderr=subprocess.DEVNULL).decode().strip()
            self.log_string("git_sha", sha)
        except Exception:
            self.log_string("git_sha", "unknown")

    def log_scalar(self, tag: str, x: float, it: int):
        if self.board is not None:
            self.board.add_scalar(tag, x, it)

    def log_metrics(self, prefix: str, metrics: dict, it: int):
        msg = f"{prefix} it={it}"
        for k, v in metrics.items():
            self.log_scalar(f"{prefix}/{k}", float(v), it)
            msg += f" {k}={float(v):.6f}"
        if self.time_estimator is not None:
            self.time_estimator.update()
            avg = self.time_estimator.get_and_reset_avg_time()
            est = self.time_estimator.get_est_remaining(it)
            self.log_scalar(f"{prefix}/avg_time", avg, it)
            msg += (f" avg_time={avg:.3f}s "
                    f"eta={datetime.timedelta(seconds=int(est))}")
        self.py_log.info(msg)

    def log_image(self, tag: str, image: np.ndarray, it: int):
        """image: HWC uint8."""
        if self.board is not None:
            self.board.add_image(tag, image, it, dataformats="HWC")

    def log_string(self, tag: str, x: str):
        self.py_log.info("%s - %s", tag, x)
        if self.board is not None:
            self.board.add_text(tag, x)
