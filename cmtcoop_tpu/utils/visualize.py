"""BEV visualization (the `show_results` capability, coop_base.py:30-94).

The reference uses open3d interactive windows; headless TPU pods get a
matplotlib BEV rendering instead: point cloud + GT (green) and prediction
(red) boxes to a PNG.
"""
from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

from cmtcoop_tpu.data.pipelines.box_np import corners_bev


def render_bev(
    out_path: str,
    points: Optional[np.ndarray] = None,
    gt_boxes: Optional[np.ndarray] = None,
    pred_boxes: Optional[np.ndarray] = None,
    pred_scores: Optional[np.ndarray] = None,
    pc_range: Sequence[float] = (-72, -72, -8, 72, 72, 0),
    title: str = "",
) -> None:
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(10, 10))
    if points is not None and len(points):
        ax.scatter(points[:, 0], points[:, 1], s=0.05, c="#777777",
                   linewidths=0)

    def draw(boxes, color):
        if boxes is None or not len(boxes):
            return
        for c in corners_bev(np.asarray(boxes)):
            poly = np.concatenate([c, c[:1]])
            ax.plot(poly[:, 0], poly[:, 1], color=color, linewidth=0.8)

    draw(gt_boxes, "#2ca02c")
    draw(pred_boxes, "#d62728")
    ax.set_xlim(pc_range[0], pc_range[3])
    ax.set_ylim(pc_range[1], pc_range[4])
    ax.set_aspect("equal")
    ax.set_title(title)
    fig.savefig(out_path, dpi=120, bbox_inches="tight")
    plt.close(fig)
