"""Agent-batched coop pillar path vs the per-agent module path.

CmtCoopDetector eval runs both agents' pillar encoders as one
agent-batched fused-kernel chain (detector._batched_pillar_bev ->
pillar_encoder_coop -> fused_pillar_conv(agents=2)); the math must be
identical to two independent per-agent encoder passes.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cmtcoop_tpu.models.detector import CmtCoopDetector
from cmtcoop_tpu.models.pillar_encoder import prepare_variables


def _model(batched: bool):
    return CmtCoopDetector(
        use_lidar=True, use_camera=False,
        coop_batched_pillars=batched,
        extractor_kwargs=dict(
            grid_size=(16, 16, 40), voxel_size=(9.0, 9.0, 0.2),
            max_voxels=96, pillar_caps=(256,) * 4,
            sparse_base_channels=4,
            sparse_channels=((4, 4, 8), (8, 8, 8), (8, 8, 8), (8, 8)),
            sparse_out_channels=8,
            second_channels=(8, 16), second_layers=(1, 1),
            fpn_channels=(16, 16)),
        head_kwargs=dict(num_query=16, in_channels=32, hidden_dim=32,
                         num_heads=2, num_decoder_layers=1,
                         feedforward_channels=64, max_gt=4))


@pytest.fixture
def batch(rng):
    def pts(seed):
        r = np.random.default_rng(seed)
        return jnp.asarray(r.normal(size=(1, 128, 5)).astype(
            np.float32)) * 3.0
    return {
        "vehicle_points": pts(0),
        "vehicle_points_mask": jnp.ones((1, 128), bool),
        "infrastructure_points": pts(1),
        "infrastructure_points_mask": jnp.ones((1, 128), bool),
    }


@pytest.mark.slow
def test_coop_batched_matches_per_agent(batch):
    m_ref = _model(batched=False)
    m_bat = _model(batched=True)
    variables = m_ref.init(jax.random.PRNGKey(0), batch)

    out_ref = m_ref.apply(variables, batch)
    out_bat = m_bat.apply(variables, batch)
    for a, b in zip(jax.tree.leaves(out_ref), jax.tree.leaves(out_bat)):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32),
                                   atol=1e-5, rtol=1e-5)


@pytest.mark.slow
def test_coop_batched_with_prepared_bands(batch):
    """The batched path must pick up load-time-prepared band matrices
    (stacked per agent) without changing results."""
    m_bat = _model(batched=True)
    variables = m_bat.init(jax.random.PRNGKey(0), batch)
    prepped = prepare_variables(m_bat, variables)
    assert "vehicle_model" in prepped["prepared"]
    assert "infrastructure_model" in prepped["prepared"]

    out_plain = m_bat.apply(variables, batch)
    out_prep = m_bat.apply(prepped, batch)
    for a, b in zip(jax.tree.leaves(out_plain), jax.tree.leaves(out_prep)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
