"""Compose preset-driven train/test pipelines (the config train_pipeline /
test_pipeline lists, coop config:33-181) into single callables."""
from __future__ import annotations

from typing import Callable, Dict, Optional, Sequence

import numpy as np

from cmtcoop_tpu.configs.presets import Preset
from cmtcoop_tpu.data import formats
from cmtcoop_tpu.data.pipelines import transforms as T
from cmtcoop_tpu.data.pipelines.dbsampler import (DataBaseSampler,
                                                  unified_object_sample)


def ida_conf(preset: Preset, src_hw=(900, 1600)) -> Dict:
    return {
        "resize_lim": preset.ida_resize_lim,
        "final_dim": preset.ida_final_dim,
        "bot_pct_lim": (0.0, 0.0),
        "rot_lim": (0.0, 0.0),
        "H": src_hw[0], "W": src_hw[1],
        "rand_flip": False,
    }


def build_pipeline(
    preset: Preset,
    training: bool,
    prefixes: Sequence[str],
    db_sampler: Optional[DataBaseSampler] = None,
    modal_mask: bool = False,
) -> Callable[[Dict, np.random.Generator], Dict]:
    """Returns pipeline(sample, rng) -> fixed-shape model sample dict."""
    conf = ida_conf(preset)
    coop = len(prefixes) > 1

    def run(sample: Dict, rng: np.random.Generator) -> Dict:
        if coop and preset.use_lidar:
            sample = T.vehicle_points_to_infra(sample)
        if coop and preset.use_camera:
            sample = T.transform_lidar2img_to_infra(sample)
        if training:
            if db_sampler is not None and preset.use_lidar:
                sample = unified_object_sample(
                    sample, db_sampler, rng, preset.class_names,
                    prefixes=prefixes)
            if modal_mask:
                sample = T.modal_mask(sample, rng, prefixes=prefixes)
            sample = T.global_rot_scale_trans(
                sample, rng, rot_range=(-0.3925, 0.3925),
                scale_ratio_range=(0.95, 1.05), prefixes=prefixes)
        if preset.use_lidar:
            sample = T.points_range_filter(
                sample, preset.pc_range, prefixes=prefixes)
        if training and "gt_boxes_3d" in sample:
            sample = T.object_range_filter(sample, preset.pc_range)
            sample = T.object_name_filter(sample, preset.class_names)
        if training and preset.use_lidar:
            sample = T.point_shuffle(sample, rng, prefixes=prefixes)
        if preset.use_camera:
            sample = T.resize_crop_flip_image(
                sample, rng, conf, training, prefixes=prefixes)
            sample = T.normalize_images(
                sample, preset.img_norm_mean, preset.img_norm_std,
                prefixes=prefixes)
            sample = T.pad_images(sample, 32, prefixes=prefixes)
        return formats.sample_to_model_batch(
            sample, max_points=preset.max_points, max_gt=preset.max_gt,
            prefixes=prefixes, with_gt=training)

    return run
