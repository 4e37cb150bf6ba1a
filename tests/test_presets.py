"""Preset-geometry sanity: every lidar/fusion preset must trace end-to-end.

The r2 advisor found cmt_fusion_r50_nuscenes crashed at trace time with
grid_size=1080: the BEV map after the 8x sparse encoder was 135 (odd), so
SECOND's stride-2 branch gave 67/68 and SECONDFPN's 2x deconv could not
concat back (reference uses sparse_shape [41, 1024, 1024], config:218).
These tests pin the even-stride invariant for all presets and shape-check
the full fusion forward of the r50 preset via jax.eval_shape (no compute).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cmtcoop_tpu.configs.presets import PRESETS


@pytest.mark.parametrize(
    "name", [n for n, p in PRESETS.items() if p.use_lidar and not p.tiny])
def test_bev_even_through_strides(name):
    p = PRESETS[name]
    for ax in (0, 1):
        bev = p.grid_size[ax] // 8  # sparse encoder stride 8
        assert bev * 8 == p.grid_size[ax], (name, p.grid_size)
        # SECOND stride-2 halves, SECONDFPN 2x deconv doubles — concat with
        # the stride-1 branch needs bev even
        assert bev % 2 == 0, (name, bev)


def test_r50_fusion_preset_traces():
    """Full fusion forward of cmt_fusion_r50_nuscenes shape-checks."""
    from cmtcoop_tpu.models.detector import CmtDetector

    p = PRESETS["cmt_fusion_r50_nuscenes"]
    ek = p.extractor_kwargs(train=False)
    # shrink the active-set caps (compile-free shape check; the grid
    # geometry under test is unchanged)
    ek.update(max_voxels=256, sparse_stage_caps=(256,) * 4,
              pillar_caps=(256, 128, 64, 64), encoder_impl="gather")
    model = CmtDetector(
        use_lidar=True, use_camera=True, extractor_kwargs=ek,
        head_kwargs=dict(**p.head_kwargs(), in_channels=512,
                         num_decoder_layers=1),
    )
    h, w = p.img_size
    batch = {
        "points": jnp.zeros((1, 512, 5), jnp.float32),
        "points_mask": jnp.zeros((1, 512), bool),
        "imgs": jnp.zeros((1, p.num_views, h, w, 3), jnp.float32),
        "lidar2img": jnp.broadcast_to(
            jnp.eye(4), (1, p.num_views, 4, 4)),
        "img2lidar": jnp.broadcast_to(
            jnp.eye(4), (1, p.num_views, 4, 4)),
    }
    out_shape = jax.eval_shape(
        lambda b: CmtDetector(
            use_lidar=True, use_camera=True, extractor_kwargs=ek,
            head_kwargs=dict(**p.head_kwargs(), in_channels=512,
                             num_decoder_layers=1),
        ).init_with_output(jax.random.PRNGKey(0), b)[0], batch)
    (task_outs, _dn) = out_shape
    nq = 900
    for t in task_outs:
        assert t["center"].shape == (1, 1, nq, 2)
        assert t["cls_logits"].shape[-2] == nq
