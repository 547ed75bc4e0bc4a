"""Metrics sinks.

The reference logs to three places: TensorBoard summaries, Weights&Biases
and stdout (SURVEY.md §5 "Metrics / logging"; ref lib/model/
train_val.py:156-157,325,362 + tensorboard/{NET}/{imdb}/ dirs).  This
module provides one logger facade with pluggable sinks: stdout + JSONL
always; REAL TensorBoard event files (via torch.utils.tensorboard, which
ships a pure-python tfevents writer) when a tb_dir is given and the
import works; wandb if importable.
"""

from __future__ import annotations

import json
import os
import time
from typing import Optional


class MetricsLogger:
    def __init__(self, logdir: Optional[str] = None,
                 project: Optional[str] = None, quiet: bool = False,
                 tb_dir: Optional[str] = None):
        self.logdir = logdir
        self.quiet = quiet
        self._jsonl = None
        if logdir:
            os.makedirs(logdir, exist_ok=True)
            self._jsonl = open(os.path.join(logdir, 'metrics.jsonl'), 'a')
        self._tb = None
        if tb_dir:
            try:
                # torch bundles a pure-python tfevents writer; real event
                # files keep the reference's TensorBoard contract
                from torch.utils.tensorboard import SummaryWriter
                self._tb = SummaryWriter(tb_dir)
            except Exception:
                self._tb = None
        self._wandb = None
        if project:
            try:
                import wandb  # optional, absent in this environment
                self._wandb = wandb
                wandb.init(project=project)
            except Exception:
                self._wandb = None

    def log(self, metrics: dict, step: Optional[int] = None):
        rec = dict(metrics)
        rec['_time'] = time.time()
        if step is not None:
            rec['_step'] = int(step)
        if not self.quiet:
            parts = ' '.join(f'{k}={v:.6g}' if isinstance(v, float)
                             else f'{k}={v}' for k, v in metrics.items())
            print((f'[step {step}] ' if step is not None else '') + parts)
        if self._jsonl:
            self._jsonl.write(json.dumps(rec) + '\n')
            self._jsonl.flush()
        if self._tb:
            for k, v in metrics.items():
                if isinstance(v, (int, float)):
                    self._tb.add_scalar(k, v, global_step=step)
            self._tb.flush()
        if self._wandb:
            self._wandb.log(metrics, step=step)

    def log_histogram(self, tag: str, values, step: Optional[int] = None):
        """Histogram summary -> tfevents (and wandb when active): the
        reference's TRAIN/ variable, ACT/ activation and SCORE/ prediction
        histograms (ref lib/nets/network.py:57-68 _add_act_summary /
        _add_score_summary / _add_train_summary).  values: any array."""
        import numpy as np
        values = np.asarray(values, np.float32).ravel()
        if values.size == 0:
            return
        if self._tb:
            self._tb.add_histogram(tag, values, global_step=step)
        if self._wandb:
            self._wandb.log({tag: self._wandb.Histogram(values)},
                            step=step)

    def log_scalar_quiet(self, tag: str, value: float,
                         step: Optional[int] = None):
        """Scalar straight to tfevents/wandb, bypassing stdout/JSONL —
        for high-rate per-detection records (ref lib/model/test.py:
        1871-1874 writes one 'score' summary per detection per image).

        The explicit step goes to TensorBoard only: wandb requires
        monotonically non-decreasing steps per run, so per-detection
        eval scores stepped by image index interleaved with
        training-step logs on a shared sink would be dropped (the
        reference writes these summaries to tfevents only)."""
        if self._tb:
            self._tb.add_scalar(tag, float(value), global_step=step)
        if self._wandb:
            self._wandb.log({tag: float(value)})

    def flush(self):
        if self._tb:
            self._tb.flush()

    @property
    def active_sinks(self) -> bool:
        """True when a tb/wandb sink is attached (callers skip expensive
        summary prep otherwise, like the reference's summary_interval
        gate)."""
        return self._tb is not None or self._wandb is not None

    def log_image(self, tag: str, image, step: Optional[int] = None):
        """Image summary -> tfevents (and wandb when active): the
        reference's gt-annotated training-image summaries
        (ref lib/nets/network.py:40-68 _add_gt_image_summary).
        image: (H, W, 3) uint8 RGB."""
        import numpy as np
        image = np.ascontiguousarray(image)
        if self._tb:
            self._tb.add_image(tag, image, global_step=step,
                               dataformats='HWC')
            self._tb.flush()
        if self._wandb:
            self._wandb.log({tag: self._wandb.Image(image)}, step=step)

    def close(self):
        if self._jsonl:
            self._jsonl.close()
        if self._tb:
            self._tb.close()


_GLOBAL: Optional[MetricsLogger] = None


def get_metrics_logger() -> MetricsLogger:
    global _GLOBAL
    if _GLOBAL is None:
        _GLOBAL = MetricsLogger()
    return _GLOBAL


def set_metrics_logger(logger: MetricsLogger):
    global _GLOBAL
    _GLOBAL = logger
