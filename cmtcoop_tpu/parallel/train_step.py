"""jit/sharded train + eval steps.

One compiled function per (model config, batch shape): forward (+DN), loss
(Hungarian on device), backward, clip-35, AdamW — no host round-trips inside
the step, unlike the reference whose assigner bounces every cost matrix to
scipy on CPU (hungarian_assigner_3d.py:138-147).
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import flax
import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from cmtcoop_tpu.models.cmt_loss import cmt_loss
from cmtcoop_tpu.parallel.mesh import batch_sharding, replicated


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any


def create_train_state(model, tx, batch, seed: int = 0) -> TrainState:
    rngs = {
        "params": jax.random.PRNGKey(seed),
        "dn": jax.random.PRNGKey(seed + 1),
        "dropout": jax.random.PRNGKey(seed + 2),
        "gridmask": jax.random.PRNGKey(seed + 3),
    }
    variables = model.init(rngs, batch)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    opt_state = tx.init(params)
    return TrainState(jnp.zeros((), jnp.int32), params, batch_stats,
                      opt_state)


def make_train_step(model, tx, tasks, mesh: Optional[Mesh] = None,
                    base_seed: int = 0, donate: bool = True):
    """Returns train_step(state, batch) -> (state, metrics dict)."""

    def step_fn(state: TrainState, batch: Dict[str, jnp.ndarray]):
        base = jax.random.PRNGKey(base_seed)
        folded = jax.random.fold_in(base, state.step)
        k_dn, k_drop, k_grid = jax.random.split(folded, 3)

        def loss_fn(params):
            (task_outs, dn_info), mutated = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                batch, mutable=["batch_stats"],
                rngs={"dn": k_dn, "dropout": k_drop, "gridmask": k_grid})
            losses = cmt_loss(
                task_outs, dn_info, batch["gt_boxes"], batch["gt_labels"],
                batch["gt_mask"], tasks=tasks)
            return losses["loss"], (losses, mutated["batch_stats"])

        (_, (losses, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, new_opt_state = tx.update(
            grads, state.opt_state, state.params)
        new_params = jax.tree.map(
            lambda p, u: p + u.astype(p.dtype), state.params, updates)
        new_state = TrainState(
            state.step + 1, new_params, new_stats, new_opt_state)
        metrics = dict(losses)
        metrics["grad_norm"] = jnp.sqrt(sum(
            jnp.sum(jnp.square(g.astype(jnp.float32)))
            for g in jax.tree.leaves(grads)))
        return new_state, metrics

    kwargs: Dict[str, Any] = {}
    if mesh is not None:
        bsh = batch_sharding(mesh)
        rep = replicated(mesh)
        kwargs = dict(
            in_shardings=(rep, bsh),
            out_shardings=(rep, rep),
        )
    if donate:
        kwargs["donate_argnums"] = (0,)
    return jax.jit(step_fn, **kwargs)


def make_eval_step(model, mesh: Optional[Mesh] = None):
    """Returns eval_step(variables, batch) -> (task_outs, dn_info)."""

    def step_fn(variables, batch):
        outs, _ = model.apply(variables, batch, mutable=["batch_stats"])
        return outs

    kwargs: Dict[str, Any] = {}
    if mesh is not None:
        bsh = batch_sharding(mesh)
        rep = replicated(mesh)
        kwargs = dict(in_shardings=(rep, bsh), out_shardings=bsh)
    return jax.jit(step_fn, **kwargs)
