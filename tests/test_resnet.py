"""ResNet backbone + the voxel0100_r50_800x320 preset (SURVEY §2.1 #39)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cmtcoop_tpu.configs.presets import get_preset
from cmtcoop_tpu.models.detector import CmtDetector
from cmtcoop_tpu.models.resnet import ResNet


@pytest.mark.slow
def test_resnet50_shapes(rng):
    x = jnp.asarray(rng.normal(size=(1, 64, 96, 3)).astype(np.float32))
    model = ResNet(50, ("layer3", "layer4"))
    vs = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(vs, x)
    # strides 16 and 32, channels 1024 / 2048
    assert out["layer3"].shape == (1, 4, 6, 1024)
    assert out["layer4"].shape == (1, 2, 3, 2048)


def test_r50_preset_exists_and_builds():
    p = get_preset("cmt_fusion_r50_nuscenes")
    assert p.img_spec == "r50"
    assert p.grid_size == (1024, 1024, 40)  # reference sparse_shape [41, 1024, 1024]
    ek = p.extractor_kwargs()
    assert ek["img_spec"] == "r50"
    assert ek["img_out_features"] == ("layer3", "layer4")


@pytest.mark.slow
def test_r50_camera_forward(rng):
    """Tiny r18 camera-only detector end to end (same code path as r50)."""
    model = CmtDetector(
        use_lidar=False, use_camera=True,
        extractor_kwargs=dict(
            img_spec="r18", img_out_features=("layer3", "layer4"),
            neck_out_channels=32,
            pc_range=(-8.0, -8.0, -5.0, 8.0, 8.0, 5.0),
            grid_size=(16, 16, 40)),
        head_kwargs=dict(
            num_query=12, hidden_dim=32, in_channels=32, depth_num=8,
            max_gt=4, dn_groups=2, num_decoder_layers=2, num_heads=4,
            feedforward_channels=64, tasks=(("CAR",),)))
    batch = {
        "imgs": jnp.asarray(
            rng.normal(size=(1, 2, 64, 96, 3)).astype(np.float32)),
        "lidar2img": jnp.broadcast_to(jnp.eye(4), (1, 2, 4, 4)),
        "img2lidar": jnp.broadcast_to(jnp.eye(4), (1, 2, 4, 4)),
    }
    vs = model.init(jax.random.PRNGKey(0), batch)
    (task_outs, _), _ = model.apply(vs, batch, mutable=["batch_stats"])
    assert task_outs[0]["center"].shape[0] == 2  # num_decoder_layers
