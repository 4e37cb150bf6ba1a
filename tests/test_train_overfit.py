"""End-to-end training smoke: the full step must reduce loss on a tiny
synthetic scene (SURVEY §4 rebuild-implication: train-overfit test)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cmtcoop_tpu.models.detector import CmtDetector
from cmtcoop_tpu.parallel.mesh import make_mesh, shard_batch
from cmtcoop_tpu.parallel.train_step import TrainState, make_train_step
from cmtcoop_tpu.train.optim import make_optimizer

TINY_EXTRACTOR = dict(
    voxel_size=(1.0, 1.0, 0.25),
    pc_range=(-8.0, -8.0, -5.0, 8.0, 8.0, 5.0),
    grid_size=(16, 16, 40),
    max_voxels=128,
    sparse_base_channels=8,
    sparse_channels=((8, 16), (16,)),  # 2 stages: see test_detector
    sparse_out_channels=16,
    sparse_stage_caps=(128, 128),
    pillar_caps=(128, 128),
    second_channels=(16, 32),
    second_layers=(1, 1),
    fpn_channels=(16, 16),
)
TINY_HEAD = dict(
    num_query=24, hidden_dim=32, in_channels=32, depth_num=8,
    max_gt=4, dn_groups=2, num_decoder_layers=2, num_heads=4,
    feedforward_channels=64, dropout=0.0, downsample_scale=2,
    tasks=(("CAR",),),
)


def _scene(rng, b=2, n=512, g=3):
    """Clustered points on g boxes + flat ground."""
    gt = np.zeros((b, g, 9), np.float32)
    pts = np.zeros((b, n, 5), np.float32)
    for bi in range(b):
        gt[bi, :, :2] = rng.uniform(-5, 5, (g, 2))
        gt[bi, :, 2] = -2.0
        gt[bi, :, 3:6] = rng.uniform(1, 2.5, (g, 3))
        gt[bi, :, 6] = rng.uniform(-1, 1, g)
        per = n // (g + 1)
        for gi in range(g):
            local = rng.uniform(-0.5, 0.5, (per, 3)) * gt[bi, gi, 3:6]
            c, s = np.cos(gt[bi, gi, 6]), np.sin(gt[bi, gi, 6])
            pts[bi, gi * per:(gi + 1) * per, 0] = (
                local[:, 0] * c - local[:, 1] * s + gt[bi, gi, 0])
            pts[bi, gi * per:(gi + 1) * per, 1] = (
                local[:, 0] * s + local[:, 1] * c + gt[bi, gi, 1])
            pts[bi, gi * per:(gi + 1) * per, 2] = (
                local[:, 2] + gt[bi, gi, 2])
        pts[bi, g * per:] = rng.uniform(-7, 7, (n - g * per, 5))
        pts[bi, g * per:, 2] = -4.5
    return {
        "points": jnp.asarray(pts),
        "points_mask": jnp.ones((b, n), bool),
        "gt_boxes": jnp.asarray(gt),
        "gt_labels": jnp.zeros((b, g), jnp.int32),
        "gt_mask": jnp.ones((b, g), bool),
    }


@pytest.mark.slow
def test_overfit_synthetic(rng):
    model = CmtDetector(
        use_camera=False, extractor_kwargs=TINY_EXTRACTOR,
        head_kwargs=TINY_HEAD, train_mode=True)
    batch = _scene(rng)
    mesh = make_mesh(num_dp=1)
    batch = shard_batch(batch, mesh)

    rngs = {"params": jax.random.PRNGKey(0), "dn": jax.random.PRNGKey(1),
            "dropout": jax.random.PRNGKey(2),
            "gridmask": jax.random.PRNGKey(3)}
    variables = model.init(rngs, batch)
    tx, _ = make_optimizer(
        variables["params"], total_steps=60, base_lr=3e-4)
    state = TrainState(
        jnp.zeros((), jnp.int32), variables["params"],
        variables.get("batch_stats", {}), tx.init(variables["params"]))
    step = make_train_step(model, tx, TINY_HEAD["tasks"], mesh=mesh)

    losses = []
    for _ in range(40):
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    first = np.mean(losses[:5])
    last = np.mean(losses[-5:])
    assert last < 0.7 * first, (first, last, losses[::8])
