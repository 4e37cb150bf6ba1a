"""Checkpoint converter: converted tree must match the flax model tree.

A synthetic mm-style state_dict (reference key naming + torch layouts) is
generated for the tiny config; after conversion every leaf must land on the
flax model's param/batch_stats tree with the right name and shape.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cmtcoop_tpu.models.detector import CmtDetector
from cmtcoop_tpu.train.torch_convert import convert_state_dict

EXTRACTOR = dict(
    voxel_size=(1.0, 1.0, 0.25),
    pc_range=(-8.0, -8.0, -5.0, 8.0, 8.0, 5.0),
    grid_size=(16, 16, 40),
    max_voxels=128,
    sparse_base_channels=8,
    sparse_channels=((8, 8, 8), (8, 8, 16), (16, 16, 16), (16, 16)),
    sparse_out_channels=16,
    sparse_stage_caps=(128,) * 4,
    pillar_caps=(128,) * 4,
    second_channels=(16, 32),
    second_layers=(1, 1),
    fpn_channels=(16, 16),
)
HEAD = dict(
    num_query=16, hidden_dim=32, in_channels=32, depth_num=8,
    max_gt=4, dn_groups=2, num_decoder_layers=2, num_heads=4,
    feedforward_channels=64, tasks=(("CAR",),),
)


def _fake_sd(rng):
    """Reference-layout state_dict for the lidar-only tiny config."""
    sd = {}

    def conv1d_g(name, cin, cout, groups):
        sd[name + ".weight"] = rng.normal(
            size=(groups * cout, cin, 1)).astype(np.float32)

    def bn(name, c):
        sd[name + ".weight"] = rng.normal(size=(c,)).astype(np.float32)
        sd[name + ".bias"] = rng.normal(size=(c,)).astype(np.float32)
        sd[name + ".running_mean"] = rng.normal(size=(c,)).astype(
            np.float32)
        sd[name + ".running_var"] = rng.uniform(
            0.5, 2, (c,)).astype(np.float32)

    def sparse(name, cin, cout, k=27):
        kz = 3 if k == 27 else k
        shape = ((cout, 3, 3, 3, cin) if k == 27 else (cout, kz, 1, 1, cin))
        sd[name] = rng.normal(size=shape).astype(np.float32)

    # sparse encoder: conv_input + stages + conv_out (derived from the
    # tiny encoder_channels)
    enc_channels = ((8, 8, 8), (8, 8, 16), (16, 16, 16), (16, 16))
    p = "pts_middle_encoder"
    sparse(f"{p}.conv_input.0.weight", 5, 8)
    bn(f"{p}.conv_input.1", 8)
    n_stages = len(enc_channels)
    for i, blocks in enumerate(enc_channels):
        ch = blocks[0]
        layer = f"{p}.encoder_layers.encoder_layer{i + 1}"
        n_sbb = len(blocks) - (0 if i == n_stages - 1 else 1)
        for j in range(n_sbb):
            for cn, nn_ in (("conv1", "norm1"), ("conv2", "norm2")):
                sparse(f"{layer}.{j}.{cn}.weight", ch, ch)
                bn(f"{layer}.{j}.{nn_}", ch)
        if i != n_stages - 1:
            sparse(f"{layer}.{n_sbb}.0.weight", ch, blocks[-1])
            bn(f"{layer}.{n_sbb}.1", blocks[-1])
    sparse(f"{p}.conv_out.0.weight", 16, 16, k=3)
    bn(f"{p}.conv_out.1", 16)

    # SECOND (in 32 after z-flatten? tiny: conv_out 16ch x D) — layer dims
    # follow our tiny config: block0 16ch, block1 32ch, 2 convs each
    cin = 32
    for i, ch in enumerate((16, 32)):
        seq = 0
        for j in range(2):
            sd[f"pts_backbone.blocks.{i}.{seq}.weight"] = rng.normal(
                size=(ch, cin, 3, 3)).astype(np.float32)
            bn(f"pts_backbone.blocks.{i}.{seq + 1}", ch)
            seq += 3
            cin = ch
    # SECONDFPN
    sd["pts_neck.deblocks.0.0.weight"] = rng.normal(
        size=(16, 16, 1, 1)).astype(np.float32)  # conv s1
    bn("pts_neck.deblocks.0.1", 16)
    sd["pts_neck.deblocks.1.0.weight"] = rng.normal(
        size=(32, 16, 2, 2)).astype(np.float32)  # deconv (I, O, kh, kw)
    bn("pts_neck.deblocks.1.1", 16)

    # head
    h = "pts_bbox_head"
    sd[f"{h}.shared_conv.conv.weight"] = rng.normal(
        size=(32, 32, 3, 3)).astype(np.float32)
    bn(f"{h}.shared_conv.bn", 32)
    sd[f"{h}.reference_points.weight"] = rng.uniform(
        0, 1, (16, 3)).astype(np.float32)
    for n, (i_, o_) in (("bev_embedding", (64, 32)),):
        sd[f"{h}.{n}.0.weight"] = rng.normal(size=(o_, i_)).astype(
            np.float32)
        sd[f"{h}.{n}.0.bias"] = rng.normal(size=(o_,)).astype(np.float32)
        sd[f"{h}.{n}.2.weight"] = rng.normal(size=(o_, o_)).astype(
            np.float32)
        sd[f"{h}.{n}.2.bias"] = rng.normal(size=(o_,)).astype(np.float32)
    heads = dict(center=2, height=1, dim=3, rot=2, vel=2, cls_logits=1)
    L = 2
    for hn, od in heads.items():
        base = f"{h}.task_heads.0.{hn}"
        conv1d_g(base + ".0", 32, 64, L)
        sd[base + ".1.weight"] = rng.normal(size=(L * 64,)).astype(
            np.float32)
        sd[base + ".1.bias"] = rng.normal(size=(L * 64,)).astype(np.float32)
        conv1d_g(base + ".3", 64, od, L)
        sd[base + ".3.bias"] = rng.normal(size=(L * od,)).astype(np.float32)
    for l in range(L):
        lp = f"{h}.transformer.decoder.layers.{l}"
        for att in (0, 1):
            sd[f"{lp}.attentions.{att}.attn.in_proj_weight"] = rng.normal(
                size=(96, 32)).astype(np.float32)
            sd[f"{lp}.attentions.{att}.attn.in_proj_bias"] = rng.normal(
                size=(96,)).astype(np.float32)
            sd[f"{lp}.attentions.{att}.attn.out_proj.weight"] = rng.normal(
                size=(32, 32)).astype(np.float32)
            sd[f"{lp}.attentions.{att}.attn.out_proj.bias"] = rng.normal(
                size=(32,)).astype(np.float32)
        sd[f"{lp}.ffns.0.layers.0.0.weight"] = rng.normal(
            size=(64, 32)).astype(np.float32)
        sd[f"{lp}.ffns.0.layers.0.0.bias"] = rng.normal(size=(64,)).astype(
            np.float32)
        sd[f"{lp}.ffns.0.layers.1.weight"] = rng.normal(
            size=(32, 64)).astype(np.float32)
        sd[f"{lp}.ffns.0.layers.1.bias"] = rng.normal(size=(32,)).astype(
            np.float32)
        for ni in range(3):
            sd[f"{lp}.norms.{ni}.weight"] = rng.normal(size=(32,)).astype(
                np.float32)
            sd[f"{lp}.norms.{ni}.bias"] = rng.normal(size=(32,)).astype(
                np.float32)
    sd[f"{h}.transformer.decoder.post_norm.weight"] = rng.normal(
        size=(32,)).astype(np.float32)
    sd[f"{h}.transformer.decoder.post_norm.bias"] = rng.normal(
        size=(32,)).astype(np.float32)
    return sd


@pytest.mark.slow
def test_convert_covers_model_tree(rng):
    sd = _fake_sd(rng)
    params, stats, unused = convert_state_dict(
        sd, dict(encoder_channels=((8, 8, 8), (8, 8, 16), (16, 16, 16),
                                   (16, 16)),
                 second_layers=(1, 1), num_decoder_layers=2,
                 tasks=(("CAR",),)))
    assert unused == [], unused[:5]

    model = CmtDetector(use_camera=False, extractor_kwargs=EXTRACTOR,
                        head_kwargs=HEAD)
    batch = {
        "points": jnp.zeros((1, 64, 5)),
        "points_mask": jnp.ones((1, 64), bool),
    }
    variables = model.init(jax.random.PRNGKey(0), batch)

    # every converted param must exist in the model tree with same shape
    model_leaves = {
        jax.tree_util.keystr(k): v.shape
        for k, v in jax.tree_util.tree_flatten_with_path(
            variables["params"])[0]}
    conv_leaves = {
        jax.tree_util.keystr(k): v.shape
        for k, v in jax.tree_util.tree_flatten_with_path(params)[0]}
    # our flax modules live under extractor/pts_bbox_head; converter uses
    # the same roots
    missing = [k for k in conv_leaves if k not in model_leaves]
    assert missing == [], missing[:8]
    mismatched = [
        (k, conv_leaves[k], model_leaves[k])
        for k in conv_leaves if model_leaves[k] != conv_leaves[k]]
    assert mismatched == [], mismatched[:8]
    # decoder + task head leaves fully covered
    for frag in ("decoder", "task_heads_0", "pts_middle_encoder",
                 "pts_backbone", "pts_neck"):
        assert any(frag in k for k in conv_leaves), frag
