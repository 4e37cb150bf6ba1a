"""Checkpointing: orbax roundtrip + cross-topology surgery."""
import numpy as np
import jax
import jax.numpy as jnp

from cmtcoop_tpu.train import checkpoint as ckpt
from cmtcoop_tpu.parallel.train_step import TrainState


def _tree(seed):
    rng = np.random.default_rng(seed)
    return {
        "extractor": {
            "pts_backbone": {"w": rng.normal(size=(4, 4)).astype(
                np.float32)},
            "img_backbone": {"w": rng.normal(size=(3,)).astype(np.float32)},
        },
        "pts_bbox_head": {
            "reference_points": rng.normal(size=(8, 3)).astype(np.float32),
            "task_heads_0": {"w": rng.normal(size=(2,)).astype(np.float32)},
            "decoder": {"w": rng.normal(size=(5,)).astype(np.float32)},
        },
    }


def test_orbax_roundtrip(tmp_path):
    state = TrainState(
        jnp.asarray(7, jnp.int32),
        jax.tree.map(jnp.asarray, _tree(0)),
        {"bn": {"mean": jnp.ones((4,))}},
        {"momentum": jnp.zeros((3,))},
    )
    d = str(tmp_path / "ckpts")
    ckpt.save_checkpoint(d, 7, jax.device_get(state))
    assert ckpt.latest_step(d) == 7
    restored = ckpt.restore_checkpoint(d, jax.device_get(state))
    assert int(restored.step) == 7
    for a, b in zip(jax.tree.leaves(restored.params),
                    jax.tree.leaves(state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_keep_limit(tmp_path):
    state = TrainState(jnp.asarray(0), {"w": jnp.zeros(2)}, {}, {})
    d = str(tmp_path / "ck")
    for step in range(1, 8):
        ckpt.save_checkpoint(d, step, jax.device_get(state), max_keep=5)
    import orbax.checkpoint as ocp
    with ocp.CheckpointManager(d) as m:
        steps = list(m.all_steps())
    assert len(steps) <= 5 and max(steps) == 7


def test_graft_single_agent():
    coop = {
        "vehicle_model": {"pts_backbone": {"w": np.zeros(3)}},
        "infrastructure_model": {"pts_backbone": {"w": np.zeros(3)}},
        "pts_bbox_head": _tree(1)["pts_bbox_head"],
    }
    single = _tree(2)
    out = ckpt.graft_single_agent_params(coop, single, "vehicle")
    np.testing.assert_allclose(
        out["vehicle_model"]["pts_backbone"]["w"],
        single["extractor"]["pts_backbone"]["w"])
    # infrastructure untouched
    np.testing.assert_allclose(
        out["infrastructure_model"]["pts_backbone"]["w"], np.zeros(3))

    out2 = ckpt.graft_single_agent_params(
        coop, single, "infrastructure", include_head=True)
    # head copied except task heads
    np.testing.assert_allclose(
        out2["pts_bbox_head"]["decoder"]["w"],
        single["pts_bbox_head"]["decoder"]["w"])
    np.testing.assert_allclose(
        out2["pts_bbox_head"]["task_heads_0"]["w"],
        coop["pts_bbox_head"]["task_heads_0"]["w"])
