"""Prefetching data loader (workers_per_gpu=6 DataLoader equivalent).

Worker pools run the numpy pipeline; a bounded queue keeps batches ready
so the TPU step never waits on the host (SURVEY §7.3 #7). Two worker
modes:

- threads (default): the heavy per-sample work — point decode, image
  resize, GT paste geometry — runs in numpy/PIL which release the GIL;
  the native C++ decode path (cmtcoop_tpu.data.native) removes most
  remaining Python overhead.
- processes (`use_processes=True`, torch DataLoader worker equivalent):
  fork-based pool for pipelines where residual Python time would
  serialize threads. Measured host cost is ~0.5 s CPU/sample at flagship
  shapes (tools/probe_loader.py), so a multi-core host needs ~5 workers
  to outrun the 9.5 FPS eval rate — if thread scaling on a given host
  falls short of cores (GIL), switch this on. Determinism is preserved:
  sample content is a pure function of (epoch, index) (per-index
  SplitMix64 rng, data/datasets.py), so worker assignment cannot change
  the stream.
"""
from __future__ import annotations

from typing import Dict, Iterator, Optional

import numpy as np

from cmtcoop_tpu.configs.presets import Preset
from cmtcoop_tpu.data import formats
from cmtcoop_tpu.data.datasets import (A9NuscCoopDataset, A9NuscDataset,
                                       cbgs_indices)
from cmtcoop_tpu.data.pipeline_builder import build_pipeline
from cmtcoop_tpu.data.pipelines.dbsampler import DataBaseSampler


_FORK_LOADER = None  # (loader, epoch_indices) snapshot for fork workers


def _fork_make_batch(b: int):
    loader, indices = _FORK_LOADER
    return loader._make_batch(indices, b)


class PrefetchLoader:
    """Iterate batches assembled by worker threads, in a deterministic
    order, `prefetch` batches ahead.

    Epoch-aware + resumable: with `shuffle_seed` set, the (fixed, CBGS-
    resampled) index set is reshuffled per epoch with a per-epoch seed
    (= DistributedSampler.set_epoch), the dataset's augmentation rng is
    re-keyed per epoch, and `iter_steps(start_step)` resumes mid-epoch at
    the exact batch a restored checkpoint stopped at — the data stream of
    a resumed run is bit-identical to an uninterrupted one."""

    def __init__(self, dataset, indices: np.ndarray, batch_size: int,
                 num_workers: int = 6, prefetch: int = 4,
                 shuffle_seed: Optional[int] = None,
                 process_id: int = 0, num_processes: int = 1,
                 use_processes: bool = False):
        """`batch_size` is GLOBAL. With num_processes > 1 (multi-host,
        DistributedSampler equivalent) each process yields its own
        batch_size/num_processes slice of every global batch, so the
        global data stream is identical for any process count."""
        assert batch_size % num_processes == 0, (batch_size, num_processes)
        self.dataset = dataset
        self.indices = np.asarray(indices)
        self.batch_size = batch_size
        self.num_workers = max(1, num_workers)
        self.prefetch = prefetch
        self.shuffle_seed = shuffle_seed
        self.process_id = process_id
        self.num_processes = num_processes
        self.use_processes = use_processes

    def __len__(self):
        return len(self.indices) // self.batch_size

    def epoch_indices(self, epoch: int) -> np.ndarray:
        if self.shuffle_seed is None:
            return self.indices
        idx = self.indices.copy()
        np.random.default_rng(self.shuffle_seed + epoch).shuffle(idx)
        return idx

    def _make_batch(self, indices, b: int) -> Dict[str, np.ndarray]:
        local = self.batch_size // self.num_processes
        start = b * self.batch_size + self.process_id * local
        idxs = indices[start:start + local]
        return formats.collate([self.dataset[int(i)] for i in idxs])

    def iter_epoch(self, epoch: int = 0,
                   start_batch: int = 0) -> Iterator[Dict[str, np.ndarray]]:
        from collections import deque

        if hasattr(self.dataset, "set_epoch"):
            self.dataset.set_epoch(epoch)
        indices = self.epoch_indices(epoch)
        n_batches = len(self)
        if self.use_processes:
            # fork AFTER set_epoch so workers inherit the epoch-keyed
            # dataset state through the fork snapshot (a bound-method
            # task would PICKLE the dataset per task — closures in the
            # pipeline don't pickle, and the copy would defeat fork
            # sharing); only the batch index crosses the pipe inbound
            import multiprocessing as mp
            global _FORK_LOADER
            _FORK_LOADER = (self, indices)
            ctx = mp.get_context("fork")
            try:
                with ctx.Pool(self.num_workers) as pool:
                    futures: "deque" = deque()
                    b = start_batch
                    inflight = self.prefetch + self.num_workers
                    while b < n_batches or futures:
                        while b < n_batches and len(futures) < inflight:
                            futures.append(pool.apply_async(
                                _fork_make_batch, (b,)))
                            b += 1
                        yield futures.popleft().get()
            finally:
                _FORK_LOADER = None
            return
        from concurrent.futures import ThreadPoolExecutor
        with ThreadPoolExecutor(self.num_workers) as ex:
            futures = deque()
            b = start_batch
            inflight = self.prefetch + self.num_workers
            while b < n_batches or futures:
                while b < n_batches and len(futures) < inflight:
                    futures.append(ex.submit(self._make_batch, indices, b))
                    b += 1
                yield futures.popleft().result()

    def iter_steps(self, start_step: int = 0,
                   max_epochs: Optional[int] = None
                   ) -> Iterator[Dict[str, np.ndarray]]:
        """Infinite (or max_epochs-bounded) multi-epoch stream starting at
        global batch `start_step` — the resume entry point."""
        spe = len(self)
        epoch = start_step // spe
        start = start_step % spe
        while max_epochs is None or epoch < max_epochs:
            yield from self.iter_epoch(epoch, start)
            epoch += 1
            start = 0

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        return self.iter_epoch(0)


DEFAULT_SAMPLE_GROUPS = dict(  # coop config:70-78
    CAR=2, TRAILER=5, TRUCK=3, VAN=3, PEDESTRIAN=7, BUS=5, BICYCLE=7)


def build_train_loader(preset: Preset, data_root: str, batch_size: int,
                       num_workers: int = 6, seed: int = 0,
                       use_cbgs: bool = True,
                       db_sampler_cfg: Optional[dict] = None,
                       modal_mask: bool = False,
                       process_id: int = 0, num_processes: int = 1):
    import os
    prefixes = (("vehicle_", "infrastructure_")
                if preset.domain == "coop" else ("",))
    db_sampler = None
    if db_sampler_cfg:
        db_sampler = DataBaseSampler(**db_sampler_cfg)
    else:
        # auto-wire the GT-paste database when present (dbinfos built by
        # tools/create_data.py, coop config:49-84)
        dbinfos = os.path.join(
            data_root, preset.ann_prefix.replace("infos", "dbinfos")
            + "_train.pkl")
        if os.path.exists(dbinfos):
            db_sampler = DataBaseSampler(
                info_path=dbinfos, data_root=data_root,
                sample_groups={k: v for k, v in
                               DEFAULT_SAMPLE_GROUPS.items()
                               if k in preset.class_names},
                classes=preset.class_names,
                filter_by_min_points={c: 5 for c in preset.class_names})
    pipeline = build_pipeline(preset, training=True, prefixes=prefixes,
                              db_sampler=db_sampler,
                              modal_mask=modal_mask)
    cls = A9NuscCoopDataset if preset.domain == "coop" else A9NuscDataset
    ds = cls(
        ann_file=f"{data_root}/{preset.ann_prefix}_train.pkl",
        class_names=preset.class_names, pipeline=pipeline,
        use_camera=preset.use_camera, use_lidar=preset.use_lidar)
    rng = np.random.default_rng(seed)
    # CBGS index set drawn once (mmdet3d CBGSDataset semantics); the
    # per-epoch ORDER comes from PrefetchLoader.epoch_indices
    indices = cbgs_indices(ds, rng) if use_cbgs else np.arange(len(ds))
    loader = PrefetchLoader(ds, indices, batch_size, num_workers,
                            shuffle_seed=seed, process_id=process_id,
                            num_processes=num_processes)
    return loader, len(loader)


def build_test_loader(preset: Preset, data_root: str, split: str = "val",
                      batch_size: int = 1, num_workers: int = 6):
    prefixes = (("vehicle_", "infrastructure_")
                if preset.domain == "coop" else ("",))
    pipeline = build_pipeline(preset, training=False, prefixes=prefixes)
    cls = A9NuscCoopDataset if preset.domain == "coop" else A9NuscDataset
    ds = cls(
        ann_file=f"{data_root}/{preset.ann_prefix}_{split}.pkl",
        class_names=preset.class_names, pipeline=pipeline, test_mode=True,
        use_camera=preset.use_camera, use_lidar=preset.use_lidar)
    loader = PrefetchLoader(ds, np.arange(len(ds)), batch_size, num_workers)
    return ds, loader
