"""Training-loop hardening: cyclic schedule vs the mmcv formula, optimizer
hyperparam wiring, loader epoch reshuffle + deterministic mid-epoch resume,
and trainer resume reproducing the identical loss sequence."""
import os

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from cmtcoop_tpu.data.loader import PrefetchLoader
from cmtcoop_tpu.train.optim import (
    cyclic_momentum_schedule, cyclic_schedule, make_optimizer)
from tests.test_train_overfit import TINY_EXTRACTOR, TINY_HEAD, _scene


# ------------------------------------------------------- cyclic schedules


def _mmcv_cyclic(base, total, target_ratio, step_ratio_up, step):
    """Independent reimplementation of mmcv CyclicLrUpdaterHook
    (cyclic_times=1, anneal_func=annealing_cos, by_epoch=False)."""
    up = int(total * step_ratio_up)
    phases = [(0, up, 1.0, target_ratio[0]),
              (up, total, target_ratio[0], target_ratio[1])]
    step = min(step, total - 1)
    for (s, e, r0, r1) in phases:
        if s <= step < e:
            pct = (step - s) / (e - s)
            start, end = base * r0, base * r1
            return end + (start - end) / 2.0 * (np.cos(np.pi * pct) + 1)
    raise AssertionError(step)


def test_cyclic_lr_matches_mmcv_formula():
    base, total = 1e-4, 500
    sched = cyclic_schedule(base, total, (2.0, 1e-4), 0.4)
    for step in [0, 1, 37, 199, 200, 201, 350, 499, 600]:
        want = _mmcv_cyclic(base, total, (2.0, 1e-4), 0.4, step)
        np.testing.assert_allclose(float(sched(step)), want, rtol=1e-4)
    # key landmarks: start at base, peak 2x at the phase switch, ~0 at end
    np.testing.assert_allclose(float(sched(0)), base, rtol=1e-6)
    np.testing.assert_allclose(float(sched(200)), 2 * base, rtol=1e-6)
    assert float(sched(499)) < base * 1e-3 * 2.1


def test_cyclic_momentum_matches_mmcv_formula():
    base, total = 0.9, 300
    ratio = (0.8947368421052632, 1.0)
    sched = cyclic_momentum_schedule(base, total, ratio, 0.4)
    for step in [0, 60, 119, 120, 121, 250, 299]:
        want = _mmcv_cyclic(base, total, ratio, 0.4, step)
        np.testing.assert_allclose(float(sched(step)), want, rtol=1e-6)
    # dips to 0.85-ish at the switch, returns to base by the end
    np.testing.assert_allclose(float(sched(120)), base * ratio[0],
                               rtol=1e-6)
    np.testing.assert_allclose(float(sched(299)), base, rtol=1e-3)


def test_optimizer_injects_schedule_and_groups():
    params = {
        "img_backbone": {"w": jnp.ones((4, 4))},
        "pts_backbone": {"w": jnp.ones((4, 4))},
    }
    total = 100
    tx, labels = make_optimizer(params, total_steps=total, base_lr=1e-4)
    assert labels["img_backbone"]["w"] == "img_backbone"
    assert labels["pts_backbone"]["w"] == "default"
    state = tx.init(params)
    grads = jax.tree.map(jnp.ones_like, params)
    for k in range(3):
        _, state = jax.jit(tx.update)(grads, state, params)
        inner = state[1].inner_states
        lr_def = float(inner["default"].inner_state.hyperparams[
            "learning_rate"])
        lr_bb = float(inner["img_backbone"].inner_state.hyperparams[
            "learning_rate"])
        want = _mmcv_cyclic(1e-4, total, (2.0, 1e-4), 0.4, k)
        np.testing.assert_allclose(lr_def, want, rtol=1e-5)
        np.testing.assert_allclose(lr_bb, want * 0.01, rtol=1e-5)
        b1 = float(inner["default"].inner_state.hyperparams["b1"])
        np.testing.assert_allclose(
            b1, _mmcv_cyclic(0.9, total, (0.8947368421052632, 1.0), 0.4, k),
            rtol=1e-5)


# ------------------------------------------------------------- the loader


class _StubDataset:
    """Returns (index, epoch) so batch contents encode the data stream."""

    def __init__(self, n):
        self.n = n
        self._epoch = 0

    def set_epoch(self, epoch):
        self._epoch = int(epoch)

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        return {"idx": np.array([i], np.int64),
                "epoch": np.array([self._epoch], np.int64)}


def _collect(it, n):
    out = []
    for b in it:
        out.append((int(b["idx"][0]), int(b["epoch"][0])))
        if len(out) == n:
            break
    return out


def test_loader_epoch_reshuffle_and_mid_epoch_resume():
    ds = _StubDataset(12)
    loader = PrefetchLoader(ds, np.arange(12), batch_size=1,
                            num_workers=2, shuffle_seed=7)
    e0 = loader.epoch_indices(0)
    e1 = loader.epoch_indices(1)
    assert sorted(e0.tolist()) == sorted(e1.tolist()) == list(range(12))
    assert e0.tolist() != e1.tolist()  # reshuffled per epoch

    # continuous 2-epoch stream vs a resume at an arbitrary mid-epoch step
    full = _collect(loader.iter_steps(0), 24)
    for start in (5, 12, 17):
        resumed = _collect(loader.iter_steps(start), 24 - start)
        assert resumed == full[start:], (start, resumed[:4],
                                         full[start:start + 4])
    # epochs are visible to the dataset (augmentation re-keying)
    assert {e for _, e in full[:12]} == {0}
    assert {e for _, e in full[12:]} == {1}


def test_loader_process_workers_match_threads():
    """Fork-pool workers (use_processes) must yield the byte-identical
    stream: batch content is a pure function of (epoch, index)."""
    ds = _StubDataset(12)
    kw = dict(batch_size=1, num_workers=2, shuffle_seed=7)
    thr = PrefetchLoader(ds, np.arange(12), **kw)
    prc = PrefetchLoader(_StubDataset(12), np.arange(12),
                         use_processes=True, **kw)
    assert _collect(thr.iter_steps(0), 18) == _collect(
        prc.iter_steps(0), 18)


def test_dataset_seed_is_process_stable():
    """__getitem__ must not use python hash() (salted per process) — the
    rng stream must be a pure function of (index, epoch, test_mode)."""
    from cmtcoop_tpu.data import datasets as D
    src = open(D.__file__).read()
    start = src.index("def __getitem__")
    assert "abs(hash(" not in src[start:start + 800]
    assert "default_rng(seed)" in src[start:start + 800]


# ---------------------------------------------------- trainer resume e2e


@pytest.mark.slow
def test_trainer_resume_identical_loss_sequence(rng, tmp_path):
    from cmtcoop_tpu.models.detector import CmtDetector
    from cmtcoop_tpu.parallel.mesh import make_mesh
    from cmtcoop_tpu.train.trainer import Trainer

    batches = [_scene(np.random.default_rng(k), b=2, n=256, g=2)
               for k in range(6)]

    def make_trainer(wd):
        model = CmtDetector(
            use_camera=False, extractor_kwargs=TINY_EXTRACTOR,
            head_kwargs=TINY_HEAD, train_mode=True)
        t = Trainer(model, TINY_HEAD["tasks"], total_steps=6,
                    work_dir=str(wd), base_lr=1e-4, log_interval=1,
                    ckpt_interval_steps=3, mesh=make_mesh(num_dp=1),
                    seed=0)
        t.init_state(batches[0])
        return t

    import json

    def losses_of(wd):
        rows = [json.loads(l) for l in
                open(os.path.join(wd, "metrics.jsonl"))]
        return {r["step"]: r["loss"] for r in rows}

    wd_a = tmp_path / "a"
    ta = make_trainer(wd_a)
    ta.run(iter(batches))
    la = losses_of(wd_a)
    assert set(la) == {1, 2, 3, 4, 5, 6}

    # interrupted run: consume the ckpt at step 3, resume, feed the stream
    # from step 3 onward -> losses at steps 4..6 must match exactly
    wd_b = tmp_path / "b"
    tb = make_trainer(wd_b)
    assert tb.resume(os.path.join(wd_a, "ckpts"), step=3)
    assert int(tb.state.step) == 3
    tb.run(iter(batches[3:]))
    lb = losses_of(wd_b)
    for s in (4, 5, 6):
        np.testing.assert_allclose(lb[s], la[s], rtol=0, atol=0), s
