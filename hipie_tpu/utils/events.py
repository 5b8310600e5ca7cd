"""Metrics/event logging: scalar store + console/JSON writers + jax profiler.

Behavioral parity target: detectron2 EventStorage (utils/events.py:274) with
CommonMetricPrinter (:181) and JSONWriter metrics.json (:50); the reference
mirrors to W&B (train_net.py:261-274). Profiling replaces the IterationTimer
hook (engine/hooks.py:84-154) with wall-time tracking + jax.profiler traces.
"""

from __future__ import annotations

import json
import os
import time
from collections import defaultdict, deque
from typing import Any, Dict, Optional


class EventStorage:
    def __init__(self, output_dir: str = "output", window: int = 20):
        self.output_dir = output_dir
        os.makedirs(output_dir, exist_ok=True)
        self._history: Dict[str, deque] = defaultdict(lambda: deque(maxlen=window))
        self._latest: Dict[str, float] = {}
        self.iter = 0
        self._json_path = os.path.join(output_dir, "metrics.json")
        self._start = time.time()
        self._iter_times: deque = deque(maxlen=window)
        self._last_tick = None
        self._tb = None

    def enable_tensorboard(self):
        """Mirror scalars to TensorBoard (reference: TensorboardXWriter,
        utils/events.py:131; W&B mirrors TB via sync_tensorboard). Uses
        torch.utils.tensorboard (bundled with the baked-in torch); silently
        disabled if unavailable."""
        try:
            from torch.utils.tensorboard import SummaryWriter
            self._tb = SummaryWriter(log_dir=os.path.join(self.output_dir, "tb"))
        except Exception:
            self._tb = None

    def put_scalars(self, **scalars):
        for k, v in scalars.items():
            v = float(v)
            self._history[k].append(v)
            self._latest[k] = v

    def median(self, key: str) -> float:
        vals = sorted(self._history[key])
        return vals[len(vals) // 2] if vals else 0.0

    def tick(self):
        now = time.time()
        if self._last_tick is not None:
            self._iter_times.append(now - self._last_tick)
        self._last_tick = now
        self.iter += 1

    def write_json(self):
        rec = {"iteration": self.iter, **self._latest}
        with open(self._json_path, "a") as f:
            f.write(json.dumps(rec) + "\n")
        if self._tb is not None:
            for k, v in self._latest.items():
                self._tb.add_scalar(k, v, self.iter)

    def log_console(self, max_iter: Optional[int] = None, lr: Optional[float] = None):
        it_time = (sum(self._iter_times) / len(self._iter_times)
                   if self._iter_times else 0.0)
        eta = ""
        if max_iter and it_time:
            secs = int((max_iter - self.iter) * it_time)
            eta = f"eta: {secs // 3600}:{secs % 3600 // 60:02d}:{secs % 60:02d}  "
        losses = "  ".join(
            f"{k}: {self.median(k):.4g}" for k in sorted(self._history)
            if k.startswith(("loss", "total")))
        lr_s = f"lr: {lr:.3e}  " if lr is not None else ""
        print(f"{eta}iter: {self.iter}  {losses}  {lr_s}time: {it_time:.4f}s",
              flush=True)


class Profiler:
    """jax.profiler trace wrapper (replaces torch profiler absence + timer hook)."""

    def __init__(self, output_dir: str, start_iter: int = -1, num_iters: int = 5):
        self.dir = os.path.join(output_dir, "profile")
        self.start_iter = start_iter
        self.stop_iter = start_iter + num_iters
        self._active = False

    def maybe_start(self, it: int):
        import jax
        if it == self.start_iter:
            jax.profiler.start_trace(self.dir)
            self._active = True

    def maybe_stop(self, it: int):
        import jax
        if self._active and it >= self.stop_iter:
            jax.profiler.stop_trace()
            self._active = False
