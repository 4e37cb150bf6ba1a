"""Preset -> model construction (the registry/config layer equivalent)."""
from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp

from cmtcoop_tpu.configs.presets import Preset
from cmtcoop_tpu.models.detector import CmtCoopDetector, CmtDetector


def build_detector(preset: Preset, train: bool, dtype: Any = jnp.float32,
                   **overrides):
    ek = preset.extractor_kwargs(train)
    ek.update(overrides.pop("extractor_kwargs", {}))
    hk = preset.head_kwargs()
    hk.update(overrides.pop("head_kwargs", {}))
    common = dict(
        use_lidar=preset.use_lidar,
        use_camera=preset.use_camera,
        extractor_kwargs=ek,
        head_kwargs=hk,
        train_mode=train,
        dtype=dtype,
        **overrides,
    )
    if preset.domain == "coop":
        return CmtCoopDetector(**common)
    return CmtDetector(**common)
