#!/usr/bin/env python
"""Training CLI (tools/train.py equivalent, reference tools/train.py:116-289).

    python tools/train.py cmt_fusion_coop_tumtraf --data-root data/a9_coop \
        --work-dir runs/coop_fusion --epochs 20

Multi-chip is a single process: batches shard over the local device mesh
(the torch.distributed.launch/NCCL machinery is replaced by GSPMD).
`--synthetic` trains on generated data for smoke/overfit runs.
"""
import argparse
import logging
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

import numpy as np


def parse_args():
    ap = argparse.ArgumentParser()
    ap.add_argument("preset", help="preset name, see cmtcoop_tpu.configs")
    ap.add_argument("--data-root", default=None)
    ap.add_argument("--work-dir", default=None)
    ap.add_argument("--epochs", type=int, default=20)
    ap.add_argument("--batch-size", type=int, default=None,
                    help="global batch (default: one per device)")
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--synthetic", action="store_true",
                    help="train on synthetic data (smoke test)")
    ap.add_argument("--steps", type=int, default=None,
                    help="override total steps (synthetic mode)")
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--load-from", default=None,
                    help="orbax checkpoint dir for weights-only warm start")
    ap.add_argument("--dtype", default="float32",
                    choices=["float32", "bfloat16"])
    ap.add_argument("--num-workers", type=int, default=6)
    ap.add_argument("--eval-interval", type=int, default=0,
                    help="run val eval every N EPOCHS during training "
                         "(reference EvalHook interval=1; 0 = off)")
    ap.add_argument("--eval-interval-steps", type=int, default=None,
                    help="eval every N steps (overrides --eval-interval)")
    ap.add_argument("--eval-split", default="val")
    ap.add_argument("--eval-batch-size", type=int, default=1)
    ap.add_argument("--eval-max-samples", type=int, default=None)
    ap.add_argument("--cfg-options", nargs="*", default=None,
                    help="preset field overrides, key=value")
    ap.add_argument("--multihost", action="store_true",
                    help="multi-host training: run one copy of this "
                         "script per host (the reference's --nnodes path)."
                         " Coordinator via --coordinator/--num-processes/"
                         "--process-id or the JAX_* env vars; on TPU pods "
                         "all are auto-detected and the flag alone "
                         "suffices. --batch-size stays GLOBAL; each "
                         "process loads its own 1/num_processes slice.")
    ap.add_argument("--coordinator", default=None,
                    help="host:port of process 0 (multihost)")
    ap.add_argument("--num-processes", type=int, default=None)
    ap.add_argument("--process-id", type=int, default=None)
    return ap.parse_args()


def main():
    args = parse_args()
    logging.basicConfig(level=logging.INFO,
                        format="%(asctime)s %(levelname)s %(message)s")
    import jax
    if os.environ.get("CMTCOOP_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["CMTCOOP_PLATFORM"])
    if args.multihost:
        from cmtcoop_tpu.parallel.mesh import initialize_multihost
        pid = initialize_multihost(args.coordinator, args.num_processes,
                                   args.process_id)
        logging.info("multihost: process %d/%d, %d global devices",
                     pid, jax.process_count(), len(jax.devices()))
    import jax.numpy as jnp
    from cmtcoop_tpu.configs.presets import get_preset
    from cmtcoop_tpu.models.build import build_detector
    from cmtcoop_tpu.parallel.mesh import make_mesh
    from cmtcoop_tpu.train.trainer import Trainer

    preset = get_preset(args.preset)
    if getattr(args, "cfg_options", None):
        from cmtcoop_tpu.utils.config import apply_overrides
        preset = apply_overrides(preset, args.cfg_options)
    work_dir = args.work_dir or f"runs/{preset.name}"
    dtype = dict(float32=jnp.float32, bfloat16=jnp.bfloat16)[args.dtype]
    mesh = make_mesh()
    n_dev = int(np.prod(mesh.devices.shape))
    batch_size = args.batch_size or n_dev  # GLOBAL batch
    n_proc = jax.process_count()
    # each process feeds its slice of the global batch (shard_batch
    # assembles the global array from process-local data)
    local_batch = batch_size // n_proc

    model = build_detector(preset, train=True, dtype=dtype)

    if args.synthetic:
        from cmtcoop_tpu.data.synthetic import synthetic_batch_iter
        total_steps = args.steps or 100
        batches = synthetic_batch_iter(
            preset, local_batch, args.seed + jax.process_index())
        example = next(batches)
    else:
        from cmtcoop_tpu.data.loader import build_train_loader
        loader, steps_per_epoch = build_train_loader(
            preset, args.data_root, batch_size,
            num_workers=args.num_workers, seed=args.seed,
            process_id=jax.process_index(), num_processes=n_proc)
        total_steps = args.steps or steps_per_epoch * args.epochs
        batches = None  # multi-epoch stream built after resume (below)
        example = loader._make_batch(loader.epoch_indices(0), 0)

    trainer = Trainer(
        model, preset.tasks, total_steps=total_steps, work_dir=work_dir,
        base_lr=args.lr, mesh=mesh,
        ckpt_interval_steps=max(total_steps // args.epochs, 1),
        seed=args.seed)
    trainer.init_state(example)
    if args.resume:
        trainer.resume()
    elif args.load_from:
        from cmtcoop_tpu.train.checkpoint import restore_checkpoint
        restored = restore_checkpoint(args.load_from, trainer.state)
        trainer.load_params(restored.params)

    if batches is None:
        # deterministic multi-epoch stream; a resumed run restarts at the
        # exact batch the checkpointed step stopped at
        batches = loader.iter_steps(start_step=int(trainer.state.step),
                                    max_epochs=args.epochs)
    elif int(trainer.state.step) == 0:
        def chain(first=example, rest=batches):
            yield first
            yield from rest
        batches = chain()

    eval_hook = None
    eval_interval_steps = args.eval_interval_steps
    if (args.eval_interval or eval_interval_steps) and not args.synthetic:
        from cmtcoop_tpu.train.eval_hook import make_eval_hook
        if eval_interval_steps is None:
            eval_interval_steps = max(
                steps_per_epoch * args.eval_interval, 1)
        eval_hook = make_eval_hook(
            preset, args.data_root, split=args.eval_split, dtype=dtype,
            batch_size=args.eval_batch_size,
            max_samples=args.eval_max_samples)
    elif args.eval_interval or eval_interval_steps:
        logging.warning("--eval-interval ignored in --synthetic mode")
        eval_interval_steps = None

    trainer.run(batches, eval_hook=eval_hook,
                eval_interval_steps=eval_interval_steps)
    logging.info("training done: %d steps", int(trainer.state.step))


if __name__ == "__main__":
    main()
