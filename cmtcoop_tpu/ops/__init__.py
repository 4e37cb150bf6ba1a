"""TPU kernels and sparse machinery."""
from cmtcoop_tpu.ops.attention import attend, flash_attention_kvmask  # noqa: F401
from cmtcoop_tpu.ops.voxelize import hard_simple_vfe, voxelize  # noqa: F401
