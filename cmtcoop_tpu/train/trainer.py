"""Training loop: the mmcv EpochBasedRunner equivalent.

Per-iteration: prefetch host batch -> sharded train step (forward + DN +
on-device Hungarian loss + backward + clip-35 AdamW with cyclic schedules)
-> periodic logging of the per-decoder-layer loss dict (TextLoggerHook
every 50 iters, coop config:395-398) -> per-epoch checkpoint (keep 5) and
optional eval hook.
"""
from __future__ import annotations

import json
import logging
import os
import time
from typing import Any, Callable, Dict, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from cmtcoop_tpu.parallel.mesh import make_mesh, shard_batch
from cmtcoop_tpu.parallel.train_step import TrainState, make_train_step
from cmtcoop_tpu.train import checkpoint as ckpt
from cmtcoop_tpu.train.optim import make_optimizer
from cmtcoop_tpu.utils.tb_writer import TensorBoardWriter

log = logging.getLogger("cmtcoop")


class Trainer:
    def __init__(
        self,
        model,
        tasks,
        total_steps: int,
        work_dir: str,
        base_lr: float = 1e-4,
        log_interval: int = 50,
        ckpt_interval_steps: Optional[int] = None,
        max_keep_ckpts: int = 5,
        mesh=None,
        seed: int = 0,
    ):
        self.model = model
        self.tasks = tasks
        self.total_steps = total_steps
        self.work_dir = work_dir
        self.log_interval = log_interval
        self.ckpt_interval_steps = ckpt_interval_steps
        self.max_keep_ckpts = max_keep_ckpts
        self.mesh = mesh if mesh is not None else make_mesh()
        self.seed = seed
        self.base_lr = base_lr
        self.state: Optional[TrainState] = None
        self._step_fn = None
        os.makedirs(work_dir, exist_ok=True)
        self._metrics_file = open(
            os.path.join(work_dir, "metrics.jsonl"), "a")
        # TensorboardLoggerHook equivalent (config log_config:395-398)
        self._tb = TensorBoardWriter(os.path.join(work_dir, "tf_logs"))

    def init_state(self, example_batch: Dict[str, Any]) -> TrainState:
        rngs = {
            "params": jax.random.PRNGKey(self.seed),
            "dn": jax.random.PRNGKey(self.seed + 1),
            "dropout": jax.random.PRNGKey(self.seed + 2),
            "gridmask": jax.random.PRNGKey(self.seed + 3),
        }
        batch = shard_batch(example_batch, self.mesh)
        variables = self.model.init(rngs, batch)
        self.tx, _ = make_optimizer(
            variables["params"], total_steps=self.total_steps,
            base_lr=self.base_lr)
        self.state = TrainState(
            jnp.zeros((), jnp.int32), variables["params"],
            variables.get("batch_stats", {}),
            self.tx.init(variables["params"]))
        self._step_fn = make_train_step(
            self.model, self.tx, self.tasks, mesh=self.mesh,
            base_seed=self.seed)
        return self.state

    def resume(self, ckpt_dir: Optional[str] = None,
               step: Optional[int] = None) -> bool:
        ckpt_dir = ckpt_dir or os.path.join(self.work_dir, "ckpts")
        if step is None:
            step = ckpt.latest_step(ckpt_dir)
        if step is None:
            return False
        self.state = ckpt.restore_checkpoint(ckpt_dir, self.state, step)
        log.info("resumed from step %d", step)
        return True

    def load_params(self, params) -> None:
        """Weights-only warm start (`load_from`, coop config:402)."""
        self.state = self.state.replace(params=params)

    def run(self, batch_iter: Iterable[Dict[str, Any]],
            eval_hook: Optional[Callable[[TrainState, int], Dict]] = None,
            eval_interval_steps: Optional[int] = None) -> TrainState:
        assert self.state is not None, "call init_state first"
        t_last = time.time()
        for batch in batch_iter:
            step_idx = int(self.state.step)
            if step_idx >= self.total_steps:
                break
            batch = shard_batch(batch, self.mesh)
            self.state, metrics = self._step_fn(self.state, batch)
            step_idx += 1
            if step_idx % self.log_interval == 0 or step_idx == 1:
                metrics = {k: float(v) for k, v in metrics.items()}
                dt = (time.time() - t_last) / (
                    self.log_interval if step_idx > 1 else 1)
                t_last = time.time()
                metrics.update(step=step_idx, sec_per_step=round(dt, 3))
                log.info("step %d: loss=%.4f (%.2fs/it)", step_idx,
                         metrics["loss"], dt)
                self._metrics_file.write(json.dumps(metrics) + "\n")
                self._metrics_file.flush()
                self._tb.add_scalars(
                    step_idx, {f"train/{k}": v for k, v in metrics.items()
                               if k != "step"})
                self._tb.flush()
            if (self.ckpt_interval_steps and
                    step_idx % self.ckpt_interval_steps == 0):
                ckpt.save_checkpoint(
                    os.path.join(self.work_dir, "ckpts"), step_idx,
                    jax.device_get(self.state),
                    max_keep=self.max_keep_ckpts)
            if (eval_hook is not None and eval_interval_steps and
                    step_idx % eval_interval_steps == 0):
                results = eval_hook(self.state, step_idx)
                log.info("eval @%d: map=%s nds=%s", step_idx,
                         results.get("object/map"),
                         results.get("object/nds"))
                num = {k: v for k, v in results.items()
                       if isinstance(v, (int, float))}
                self._metrics_file.write(json.dumps(
                    {"step": step_idx, "eval": num}) + "\n")
                self._metrics_file.flush()
                self._tb.add_scalars(
                    step_idx, {f"val/{k}": v for k, v in num.items()})
                self._tb.flush()
        return self.state
