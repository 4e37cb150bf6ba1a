"""Target assembly + loss semantics on hand-checkable cases."""
import numpy as np
import jax.numpy as jnp

from cmtcoop_tpu.core.boxes import normalize_bbox
from cmtcoop_tpu.models.cmt_loss import cmt_loss, task_targets


def test_task_targets_obvious_match(rng):
    """One GT whose normalized code equals one query's prediction exactly
    must match that query; all other queries are background."""
    nq, g = 8, 3
    gt_boxes = np.zeros((1, g, 9), np.float32)
    gt_boxes[0, 0] = [1.0, 2.0, 0.5, 2.0, 4.0, 1.5, 0.3, 0.0, 0.0]
    gt_labels = np.zeros((1, g), np.int64)
    gt_mask = np.zeros((1, g), bool)
    gt_mask[0, 0] = True

    pred_code = rng.normal(size=(1, nq, 10)).astype(np.float32) * 5
    pred_code[0, 5] = np.asarray(
        normalize_bbox(jnp.asarray(gt_boxes[0, 0])))
    pred_logits = np.full((1, nq, 2), -5.0, np.float32)
    pred_logits[0, 5, 0] = 5.0  # confident for the matching class

    labels, label_w, bbox_t, bbox_w, num_pos = task_targets(
        jnp.asarray(pred_code), jnp.asarray(pred_logits),
        jnp.asarray(gt_boxes), jnp.asarray(gt_labels),
        jnp.asarray(gt_mask), 0, ("CAR", "TRUCK"), 0)
    labels = np.asarray(labels)
    assert int(num_pos) == 1
    assert labels[0, 5] == 0            # matched with its class
    assert (labels[0, np.arange(nq) != 5] == 2).all()  # background
    np.testing.assert_allclose(
        np.asarray(bbox_t)[0, 5],
        np.asarray(normalize_bbox(jnp.asarray(gt_boxes[0, 0]))), rtol=1e-5)
    assert np.asarray(bbox_w)[0, 5].sum() == 10
    assert np.asarray(bbox_w)[0, np.arange(nq) != 5].sum() == 0


def test_cmt_loss_keys_and_finiteness(rng):
    L, B, nq = 3, 2, 8
    tasks = (("CAR",),)
    outs = {
        "center": rng.normal(size=(L, B, nq, 2)).astype(np.float32),
        "height": rng.normal(size=(L, B, nq, 1)).astype(np.float32),
        "dim": rng.normal(size=(L, B, nq, 3)).astype(np.float32),
        "rot": rng.normal(size=(L, B, nq, 2)).astype(np.float32),
        "vel": rng.normal(size=(L, B, nq, 2)).astype(np.float32),
        "cls_logits": rng.normal(size=(L, B, nq, 1)).astype(np.float32),
    }
    gt = np.zeros((B, 4, 9), np.float32)
    gt[..., 3:6] = 1.0
    losses = cmt_loss(
        [
            {k: jnp.asarray(v) for k, v in outs.items()}
        ], None, jnp.asarray(gt),
        jnp.zeros((B, 4), jnp.int32), jnp.ones((B, 4), bool), tasks)
    expected = {"loss_cls", "loss_bbox", "d0.loss_cls", "d0.loss_bbox",
                "d1.loss_cls", "d1.loss_bbox", "loss"}
    assert expected <= set(losses)
    for k, v in losses.items():
        assert np.isfinite(float(v)), k
