"""Training loop orchestration.

Capability match: SimpleTrainer/AMPTrainer + the CLI Trainer subclass
(/root/reference/ape/engine/train_loop.py:21-416, tools/train_net.py:52-420):
multi-dataloader weighted choice per step, per-dataset image/object counters,
metric gather + NaN guard (FloatingPointError on non-finite loss), hooks
(IterationTimer, LRScheduler via optax schedule, PeriodicCheckpointer,
PeriodicWriter), EMA.

TPU-first: one jitted train step per dataset schema (static shapes per dataset
group -> one executable each, SURVEY §7); grad all-reduce is XLA's.
"""

from __future__ import annotations

import logging
import time
from typing import Callable, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ape_tpu.engine.train_step import TrainState
from ape_tpu.utils.events import (
    CommonMetricPrinter,
    EventStorage,
    JSONWriter,
    TensorboardWriter,
)

logger = logging.getLogger("ape_tpu")


class Trainer:
    def __init__(
        self,
        step_fn: Callable,  # (state, batch, rng) -> (state, metrics)
        state: TrainState,
        loaders: Sequence,  # list of TrainLoader (one per dataset group)
        dataset_sampler=None,  # MultiDatasetSampler or None (single loader)
        text_fn: Optional[Callable] = None,  # batch -> batch with text features
        max_iter: int = 10000,
        log_period: int = 20,
        output_dir: str = "./output",
        checkpointer=None,
        rng_seed: int = 0,
        mesh=None,
        step_fn_by_dataset: Optional[Callable] = None,  # ds_id -> step_fn
        eval_fn: Optional[Callable] = None,  # state -> dict of results
        eval_period: int = 0,
        lr_fn: Optional[Callable] = None,  # step -> lr (for logging)
        profile_dir: Optional[str] = None,  # jax.profiler trace output dir
        profile_start: int = 10,  # first profiled iteration (skip compiles)
        profile_iters: int = 5,  # number of iterations in the trace window
    ):
        from ape_tpu.parallel.mesh import is_main_process

        self.step_fn = step_fn
        self.step_fn_by_dataset = step_fn_by_dataset
        self.eval_fn = eval_fn
        self.eval_period = eval_period
        self.lr_fn = lr_fn
        self.is_main = is_main_process()  # writers/checkpoints on process 0 only
        self.state = state
        self.loaders = list(loaders)
        self.iters = [iter(l) for l in self.loaders]
        self.dataset_sampler = dataset_sampler
        self.text_fn = text_fn
        self.max_iter = max_iter
        self.storage = EventStorage()
        self.writers = [
            CommonMetricPrinter(max_iter, log_period),
            JSONWriter(f"{output_dir}/metrics.json", log_period),
            TensorboardWriter(f"{output_dir}/tb", log_period),
        ]
        self.log_period = log_period
        self.checkpointer = checkpointer
        self._rng = jax.random.PRNGKey(rng_seed)
        self.mesh = mesh
        # xplane profiling window (reference relies on external nsys/torch
        # profiler runs; here it is a first-class trainer hook)
        self.profile_dir = profile_dir
        self.profile_start = profile_start
        self.profile_iters = profile_iters

    def _next_batch(self) -> Dict:
        if self.dataset_sampler is not None and len(self.loaders) > 1:
            ds_id = self.dataset_sampler.next_dataset()
        else:
            ds_id = 0
        batch = next(self.iters[ds_id])
        batch["dataset_id"] = ds_id
        return batch

    def run_step(self):
        start = time.perf_counter()
        batch = self._next_batch()
        if self.text_fn is not None:
            batch = self.text_fn(batch)
        data_time = time.perf_counter() - start

        ds_id = batch.pop("dataset_id", 0)
        phrases = batch.pop("phrases", None)
        for k in ("image_id", "height", "width"):
            batch.pop(k, None)

        if self.mesh is not None:
            from ape_tpu.parallel.mesh import shard_batch

            batch = shard_batch(self.mesh, batch)

        self._rng, rng = jax.random.split(self._rng)
        fn = (
            self.step_fn_by_dataset(ds_id)
            if self.step_fn_by_dataset is not None
            else self.step_fn
        )
        self.state, metrics = fn(self.state, batch, rng)

        total = float(metrics["total_loss"])
        if not np.isfinite(total):
            raise FloatingPointError(
                f"Loss became non-finite at iteration {self.storage.iter}: {metrics}"
            )
        self.storage.put_scalar("total_loss", total)
        self.storage.put_scalar("data_time", data_time)
        self.storage.put_scalar(f"count_image/{ds_id}", batch["images"].shape[0])
        n_obj = int(np.asarray(batch["targets"]["valid"]).sum()) if "targets" in batch else 0
        self.storage.put_scalar(f"count_object/{ds_id}", n_obj)
        for k, v in metrics.items():
            if k != "total_loss" and np.ndim(v) == 0:
                self.storage.put_scalar(k, float(v))

    def train(self, start_iter: int = 0):
        logger.info(f"Starting training from iteration {start_iter} to {self.max_iter}")
        self.storage.iter = start_iter
        t0 = time.perf_counter()
        profiling = False
        for it in range(start_iter, self.max_iter):
            if self.profile_dir and self.is_main:
                if it == self.profile_start:
                    logger.info(f"profiler: tracing to {self.profile_dir}")
                    jax.profiler.start_trace(self.profile_dir)
                    profiling = True
                elif profiling and it == self.profile_start + self.profile_iters:
                    jax.profiler.stop_trace()
                    profiling = False
            self.run_step()
            self.storage.put_scalar("time", time.perf_counter() - t0)
            if self.lr_fn is not None:
                self.storage.put_scalar("lr", float(self.lr_fn(it)))
            t0 = time.perf_counter()
            if (it + 1) % self.log_period == 0 and self.is_main:
                for w in self.writers:
                    w.write(self.storage)
            if self.checkpointer is not None and self.is_main:
                self.checkpointer.step(it, self.state)
            if (
                self.eval_fn is not None
                and self.eval_period > 0
                and (it + 1) % self.eval_period == 0
                and (it + 1) != self.max_iter
            ):
                logger.info(f"running evaluation at iteration {it + 1}")
                results = self.eval_fn(self.state)
                for name, res in (results or {}).items():
                    logger.info(f"[eval @ {it + 1}] {name}: {res}")
                t0 = time.perf_counter()  # eval time isn't step time
            self.storage.step()
        if profiling:
            jax.profiler.stop_trace()
        logger.info("Training done")
        return self.state


def inference_on_dataset(
    forward_fn: Callable,  # example -> prediction dict (device+host postprocess)
    data_loader,  # generator of mapped examples
    evaluators: Sequence,
    warmup: int = 5,
) -> Dict[str, float]:
    """Eval loop with stage timing (reference ape/evaluation/evaluator.py:17-200)."""
    total = getattr(data_loader, "__len__", lambda: None)()
    times = {"data": 0.0, "compute": 0.0, "eval": 0.0}
    n = 0
    t_data = time.perf_counter()
    for ex in data_loader():
        times["data"] += time.perf_counter() - t_data
        t = time.perf_counter()
        pred = forward_fn(ex)
        times["compute"] += time.perf_counter() - t
        t = time.perf_counter()
        for ev in evaluators:
            ev.process([pred] if isinstance(pred, dict) else pred)
        times["eval"] += time.perf_counter() - t
        n += 1
        if n == warmup:  # reset timers after warmup (compile amortization)
            times = {k: 0.0 for k in times}
        if n % 100 == 0:
            logger.info(f"inference {n}/{total}: {times}")
        t_data = time.perf_counter()
    results = {}
    for ev in evaluators:
        results.update(ev.evaluate())
    denom = max(n - warmup, 1)
    logger.info(
        f"inference done: {n} images, "
        + ", ".join(f"{k} {v / denom * 1e3:.1f}ms/img" for k, v in times.items())
    )
    return results
