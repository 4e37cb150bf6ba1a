"""Native C++ geometry vs the numpy reference implementations."""
import numpy as np
import pytest

from cmtcoop_tpu.data import native
from cmtcoop_tpu.data.pipelines import box_np


def _rand_boxes(rng, n):
    b = np.zeros((n, 7), np.float32)
    b[:, :2] = rng.uniform(-20, 20, (n, 2))
    b[:, 2] = rng.uniform(-3, 0, n)
    b[:, 3:6] = rng.uniform(0.5, 5, (n, 3))
    b[:, 6] = rng.uniform(-np.pi, np.pi, n)
    return b


@pytest.fixture(autouse=True)
def _require_native():
    if native._load() is None:
        pytest.skip("native lib unavailable")


def test_points_in_rbbox_native(rng):
    pts = rng.uniform(-25, 25, (500, 5)).astype(np.float32)
    boxes = _rand_boxes(rng, 12)
    ours = native.points_in_rbbox(pts, boxes)
    ref = box_np.points_in_rbbox(pts, boxes)
    np.testing.assert_array_equal(ours, ref)


def test_box_collision_native(rng):
    a = _rand_boxes(rng, 20)
    b = _rand_boxes(rng, 30)
    ours = native.box_collision_test(a, b)
    ref = box_np.box_collision_test(a, b)
    np.testing.assert_array_equal(ours, ref)


def test_remove_points_native(rng):
    pts = rng.uniform(-25, 25, (400, 5)).astype(np.float32)
    boxes = _rand_boxes(rng, 8)
    ours = native.remove_points_in_boxes(pts, boxes)
    inside = box_np.points_in_rbbox(pts, boxes).any(-1)
    np.testing.assert_allclose(ours, pts[~inside])
