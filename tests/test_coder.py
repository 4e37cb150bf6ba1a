"""Decode parity with a torch re-derivation of MultiTaskBBoxCoder."""
import numpy as np
import jax.numpy as jnp
import pytest

from cmtcoop_tpu.core.coder import decode_boxes


def _torch_reference_decode(task_logits, task_codes, max_num, pcr):
    """Oracle mirroring coder.py:46-142 decode_single on one sample."""
    torch = pytest.importorskip("torch")
    logits = [torch.from_numpy(x) for x in task_logits]
    codes = [torch.from_numpy(x) for x in task_codes]
    num_query = logits[0].shape[0]
    all_logits = torch.cat(logits, dim=-1)
    all_codes = torch.cat(codes, dim=0)
    task_ids = torch.cat([
        torch.full_like(lg, t).int() for t, lg in enumerate(logits)], dim=-1)

    cls_scores = all_logits.sigmoid()
    scores, idx = cls_scores.reshape(-1).topk(max_num)
    num_cls = all_logits.shape[-1]
    labels = idx % num_cls
    bbox_index = idx // num_cls
    task_index = torch.gather(task_ids, 1, labels.unsqueeze(1))[..., 0]
    # (task_ids rows are identical; emulate row indexing)
    task_index = task_ids[0][labels]
    code = all_codes[task_index.long() * num_query + bbox_index]
    cx, cy, cz = code[:, 0:1], code[:, 1:2], code[:, 2:3]
    wlh = code[:, 3:6].exp()
    rot = torch.atan2(code[:, 6:7], code[:, 7:8])
    box = torch.cat([cx, cy, cz, wlh, rot, code[:, 8:10]], dim=-1)
    lo = torch.tensor(pcr[:3]); hi = torch.tensor(pcr[3:])
    mask = (box[:, :3] >= lo).all(1) & (box[:, :3] <= hi).all(1)
    box[:, 2] -= box[:, 5] * 0.5
    return box.numpy(), scores.numpy(), labels.numpy(), mask.numpy()


def test_decode_matches_reference(rng):
    nq, max_num = 128, 48
    pcr = [-80.0, -80.0, -10.0, 80.0, 80.0, 10.0]
    task_logits = [rng.normal(size=(nq, 4)).astype(np.float32),
                   rng.normal(size=(nq, 3)).astype(np.float32)]
    task_codes = []
    for _ in range(2):
        c = rng.normal(size=(nq, 10)).astype(np.float32)
        c[:, :3] = rng.uniform(-90, 90, (nq, 3))
        task_codes.append(c)

    ob, osc, olb, om = _torch_reference_decode(
        task_logits, task_codes, max_num, pcr)
    out = decode_boxes(
        [jnp.asarray(x) for x in task_logits],
        [jnp.asarray(x) for x in task_codes],
        max_num=max_num, post_center_range=pcr)
    np.testing.assert_allclose(np.asarray(out.scores), osc, rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(out.labels), olb)
    np.testing.assert_array_equal(np.asarray(out.valid), om)
    np.testing.assert_allclose(np.asarray(out.boxes), ob, rtol=1e-4,
                               atol=1e-4)
