"""Loss/cost parity vs torch re-derivations of the mmdet formulas."""
import numpy as np
import jax.numpy as jnp
import pytest

from cmtcoop_tpu.core import losses as L


def test_sigmoid_focal_loss_matches_mmdet_formula(rng):
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    N, C = 64, 7
    logits = rng.normal(size=(N, C)).astype(np.float32)
    labels = rng.integers(0, C + 1, N)  # C == background
    weights = np.ones(N, np.float32)
    avg = 17.3

    # oracle: mmdet py_sigmoid_focal_loss with one-hot targets
    t_logits = torch.from_numpy(logits)
    target = torch.zeros(N, C)
    fg = labels < C
    target[torch.arange(N)[fg], torch.from_numpy(labels[fg])] = 1.0
    p = t_logits.sigmoid()
    pt = (1 - p) * target + p * (1 - target)
    fw = (0.25 * target + 0.75 * (1 - target)) * pt.pow(2.0)
    bce = F.binary_cross_entropy_with_logits(
        t_logits, target, reduction="none")
    oracle = (bce * fw).sum().item() / avg * 2.0

    ours = float(L.sigmoid_focal_loss(
        jnp.asarray(logits), jnp.asarray(labels), jnp.asarray(weights),
        num_classes=C, avg_factor=avg, loss_weight=2.0))
    np.testing.assert_allclose(ours, oracle, rtol=1e-5)


def test_focal_cost_matches_mmdet_formula(rng):
    torch = pytest.importorskip("torch")
    Q, C, G = 50, 7, 9
    logits = rng.normal(size=(Q, C)).astype(np.float32)
    gt_labels = rng.integers(0, C, G)

    cls_pred = torch.from_numpy(logits).sigmoid()
    eps = 1e-12
    neg_cost = -(1 - cls_pred + eps).log() * (1 - 0.25) * cls_pred.pow(2)
    pos_cost = -(cls_pred + eps).log() * 0.25 * (1 - cls_pred).pow(2)
    oracle = (pos_cost[:, gt_labels] - neg_cost[:, gt_labels]).numpy() * 2.0

    ours = np.asarray(L.focal_cost(
        jnp.asarray(logits), jnp.asarray(gt_labels), weight=2.0))
    np.testing.assert_allclose(ours, oracle, rtol=1e-4, atol=1e-6)


def test_l1_cost_matches_cdist(rng):
    torch = pytest.importorskip("torch")
    a = rng.normal(size=(20, 8)).astype(np.float32)
    b = rng.normal(size=(5, 8)).astype(np.float32)
    oracle = torch.cdist(
        torch.from_numpy(a), torch.from_numpy(b), p=1).numpy() * 0.25
    ours = np.asarray(L.l1_cost(jnp.asarray(a), jnp.asarray(b), weight=0.25))
    np.testing.assert_allclose(ours, oracle, rtol=1e-4, atol=1e-5)


def test_weighted_l1(rng):
    pred = rng.normal(size=(10, 10)).astype(np.float32)
    tgt = rng.normal(size=(10, 10)).astype(np.float32)
    w = rng.uniform(0, 1, (10, 10)).astype(np.float32)
    ours = float(L.weighted_l1_loss(
        jnp.asarray(pred), jnp.asarray(tgt), jnp.asarray(w), avg_factor=4.0,
        loss_weight=0.25))
    oracle = 0.25 * (np.abs(pred - tgt) * w).sum() / 4.0
    np.testing.assert_allclose(ours, oracle, rtol=1e-5)
