"""Training loop with hooks: timing, periodic checkpoint, periodic eval, logging.

Behavioral parity target: detectron2 DefaultTrainer/TrainerBase
(engine/defaults.py:321+, engine/train_loop.py:88-215) + its hook set
(IterationTimer, LRScheduler logging, PeriodicCheckpointer, EvalHook,
PeriodicWriter(period=20)) assembled in build_hooks (defaults.py:420-467).

TPU-native: the step is a single jitted function over the device mesh; host-side
work per iteration is only data loading + scalar logging. Metrics arrive as
device scalars and are fetched asynchronously every `log_period` steps.
"""

from __future__ import annotations

import os
import time
from typing import Any, Callable, Dict, Iterator, Optional

import jax
import numpy as np

from hipie_tpu.config import HIPIEConfig
from hipie_tpu.train.checkpoint import resume_or_load, save_checkpoint
from hipie_tpu.train.optimizer import lr_schedule
from hipie_tpu.train.step import TrainBatch, TrainState
from hipie_tpu.utils.events import EventStorage, Profiler


class Trainer:
    def __init__(self, cfg: HIPIEConfig, model, state: TrainState, tx,
                 train_step: Callable, loader: Iterator,
                 eval_fn: Optional[Callable] = None,
                 log_period: int = 20, profile_at: int = -1,
                 batch_sharding=None):
        self.cfg = cfg
        self.model = model
        self.state = state
        self.tx = tx
        self.train_step = train_step
        self.loader = loader
        self.eval_fn = eval_fn
        self._best_metric = float("-inf")
        self.storage = EventStorage(cfg.output_dir)
        self.profiler = Profiler(cfg.output_dir, start_iter=profile_at)
        self.log_period = log_period
        # NamedSharding(mesh, P("data")): each batch is device_put over the
        # mesh's data axis so multi-device training is actually data-parallel.
        self.batch_sharding = batch_sharding

    def resume_or_load(self, weights: Optional[str] = None, resume: bool = True):
        self.state, resumed = resume_or_load(
            self.cfg.output_dir, self.state, weights, resume, cfg=self.cfg)
        if resumed:
            self.storage.iter = int(self.state.step)
            # restore the BestCheckpointer watermark so a resumed run doesn't
            # overwrite model_best with a worse post-resume eval.
            import os
            marker = os.path.join(self.cfg.output_dir, "best_checkpoint")
            if os.path.exists(marker):
                try:
                    tail = open(marker).read().strip().rsplit("=", 1)[-1]
                    self._best_metric = float(tail)
                except (ValueError, OSError):
                    pass
        return resumed

    def train(self, start_iter: Optional[int] = None,
              max_iter: Optional[int] = None):
        cfg = self.cfg.solver
        max_iter = max_iter or cfg.max_iter
        rng = jax.random.PRNGKey(self.cfg.seed)
        it = int(self.state.step) if start_iter is None else start_iter
        data_iter = iter(self.loader)
        lr_fn = lr_schedule(cfg, cfg.base_lr)
        pending_metrics = None

        eval_period = getattr(self.cfg.test, "eval_period", 5000) or 5000
        while it < max_iter:
            self.profiler.maybe_start(it)
            t_data = time.time()
            batch = next(data_iter)
            # TrainLoader yields (task, batch_dict); bare batches (tests,
            # custom iterators) default to the single configured step.
            task = None
            if isinstance(batch, tuple) and len(batch) == 2 \
                    and isinstance(batch[0], str):
                task, batch = batch
            if isinstance(batch, dict):
                batch = TrainBatch(**batch)
            if self.batch_sharding is not None:
                batch = jax.device_put(batch, self.batch_sharding)
            data_time = time.time() - t_data

            rng, key = jax.random.split(rng)
            if isinstance(self.train_step, dict):
                step_fn = self.train_step[task or "detection"]
            else:
                step_fn = self.train_step
            self.state, metrics = step_fn(self.state, batch, key)
            self.storage.tick()
            it += 1
            self.storage.put_scalars(data_time=data_time)

            if pending_metrics is not None and (it % self.log_period == 0):
                p_task, p_metrics = pending_metrics
                host = {k: float(v) for k, v in p_metrics.items()}
                if p_task is not None and isinstance(self.train_step, dict) \
                        and len(self.train_step) > 1:
                    # multi-task runs: per-task total so each task's descent
                    # is visible in metrics.json (reference train_net.py joint
                    # recipe logs a merged dict only — this is strictly more).
                    host[f"total_loss_{p_task}"] = host.get("total_loss", 0.0)
                self.storage.put_scalars(**host)
                self.storage.log_console(max_iter, lr=float(lr_fn(it)))
                self.storage.write_json()
            pending_metrics = (task, metrics)
            self.profiler.maybe_stop(it)

            if it % cfg.checkpoint_period == 0 or it == max_iter:
                save_checkpoint(self.cfg.output_dir, self.state, it)
            if self.eval_fn is not None and it % eval_period == 0:
                results = self.eval_fn(self.state.params)
                self.storage.put_scalars(**{f"eval/{k}": v
                                            for k, v in results.items()})
                # BestCheckpointer (reference engine/hooks.py BestCheckpointer):
                # track cfg.test.best_metric (default: first result key) and
                # keep a distinct `model_best` checkpoint (saving under the
                # periodic model_{it} name would collide when checkpoint and
                # eval periods align — orbax refuses to overwrite). The best
                # value is persisted in `best_checkpoint` and restored on
                # resume so a preempted run never regresses the pointer.
                metric = getattr(self.cfg.test, "best_metric", "") or \
                    (sorted(results)[0] if results else "")
                if metric in results:
                    val = float(results[metric])
                    if val > self._best_metric:
                        self._best_metric = val
                        save_checkpoint(self.cfg.output_dir, self.state, it,
                                        name="model_best",
                                        update_marker=False)
                        import os as _os
                        with open(_os.path.join(self.cfg.output_dir,
                                                "best_checkpoint"), "w") as f:
                            f.write(f"model_best iter={it} {metric}={val}\n")
        # Flush the final pending step's metrics (they are logged one step
        # late by design — async device fetch) plus any scalars put at
        # non-log-period iters (e.g. a final eval), so a max_iter run does
        # not lose its last window.
        if pending_metrics is not None:
            self.storage.put_scalars(
                **{k: float(v) for k, v in pending_metrics[1].items()})
            self.storage.log_console(max_iter, lr=float(lr_fn(it)))
        self.storage.write_json()
        return self.state
