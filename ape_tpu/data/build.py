"""Data loader construction.

Capability match: build_detection_train_loader_multi_dataset[_copypaste] /
build_detection_test_loader (/root/reference/ape/data/build_multi_dataset.py:106-353,
build.py:74): concat per-group dataset dicts with dataset_id tags, per-dataset
empty-filtering, samplers, batch assembly; MultiDatasetAspectRatioGroupedDataset
is unnecessary here because LSJ yields fixed square batches (SURVEY §7).

Host-side, synchronous with optional thread prefetch (the image decode work the
reference does in DataLoader worker processes).
"""

from __future__ import annotations

import logging
import queue
import threading
from typing import Callable, Dict, Iterator, List, Optional, Sequence

import numpy as np

from ape_tpu.data.catalog import DatasetCatalog
from ape_tpu.data.samplers import (
    InferenceSampler,
    MultiDatasetSampler,
    RepeatFactorTrainingSampler,
    TrainingSampler,
    repeat_factors_from_category_frequency,
)

logger = logging.getLogger("ape_tpu")


def get_detection_dataset_dicts(
    names: Sequence[str], filter_empty: bool = True, dataset_id: int = 0
) -> List[dict]:
    dicts: List[dict] = []
    for name in [names] if isinstance(names, str) else names:
        ds = DatasetCatalog.get(name)
        for d in ds:
            d = dict(d)
            d["dataset_name"] = name
            d["dataset_id"] = dataset_id
            dicts.append(d)
    if filter_empty:
        n0 = len(dicts)
        dicts = [d for d in dicts if d.get("annotations")]
        logger.info(f"filtered empty: {n0} -> {len(dicts)}")
    return dicts


def _stack_batch(samples: List[Dict]) -> Dict:
    """Stack mapper outputs into batch arrays (all fixed-shape already)."""
    out: Dict = {}
    out["images"] = np.stack([s["image"] for s in samples])
    out["image_sizes"] = np.stack([s["image_size"] for s in samples])
    if "targets" in samples[0]:
        t0 = samples[0]["targets"]
        out["targets"] = {
            k: np.stack([s["targets"][k] for s in samples]) for k in t0
        }
    for k in ("image_id", "height", "width"):
        if k in samples[0]:
            out[k] = [s[k] for s in samples]
    if "phrases" in samples[0]:
        out["phrases"] = [s["phrases"] for s in samples]
    if "dataset_id" in samples[0]:
        out["dataset_id"] = samples[0]["dataset_id"]
    return out


class TrainLoader:
    """Single-dataset-group infinite loader: sampler -> mapper -> batches."""

    def __init__(self, dataset_dicts, mapper, batch_size, sampler=None, prefetch=2):
        self.dicts = dataset_dicts
        self.mapper = mapper
        self.batch_size = batch_size
        self.sampler = sampler or TrainingSampler(len(dataset_dicts))
        self._prefetch = prefetch
        self._q: Optional[queue.Queue] = None

    def _produce(self):
        it = iter(self.sampler)
        while True:
            batch = []
            while len(batch) < self.batch_size:
                d = self.dicts[next(it)]
                ex = self.mapper(d)
                if ex is None:
                    continue
                if "targets" in ex and not ex["targets"]["valid"].any():
                    continue  # skip batches w/ empty GT (train_net.py:129-132)
                ex["dataset_id"] = d.get("dataset_id", 0)
                batch.append(ex)
            self._q.put(_stack_batch(batch))

    def __iter__(self) -> Iterator[Dict]:
        if self._prefetch:
            self._q = queue.Queue(maxsize=self._prefetch)
            t = threading.Thread(target=self._produce, daemon=True)
            t.start()
            while True:
                yield self._q.get()
        else:
            it = iter(self.sampler)
            while True:
                batch = []
                while len(batch) < self.batch_size:
                    ex = self.mapper(self.dicts[next(it)])
                    if ex is None or (
                        "targets" in ex and not ex["targets"]["valid"].any()
                    ):
                        continue
                    batch.append(ex)
                yield _stack_batch(batch)


def build_detection_train_loader(
    dataset_names, mapper, batch_size, sampler_name: str = "TrainingSampler",
    repeat_thresh: float = 0.001, seed: int = 0, rank: int = 0, world_size: int = 1,
    dataset_id: int = 0, filter_empty: bool = True, copypaste_prob: float = 0.0,
):
    dicts = get_detection_dataset_dicts(dataset_names, filter_empty, dataset_id)
    if copypaste_prob > 0:
        # the reference's _copypaste loader draws backgrounds from the group's
        # own dataset pool (build_multi_dataset_copypaste.py:402-412, flagship
        # data config dataset_bg = the same names) at copypaste_prob=0.5
        from ape_tpu.data.copypaste import CopyPasteMapper

        mapper = CopyPasteMapper(mapper, dicts, prob=copypaste_prob, seed=seed)
    if sampler_name == "RepeatFactorTrainingSampler":
        rf = repeat_factors_from_category_frequency(dicts, repeat_thresh)
        sampler = RepeatFactorTrainingSampler(rf, seed, rank, world_size)
    elif sampler_name == "ClassAwareSampler":
        from ape_tpu.data.samplers import ClassAwareSampler

        sampler = ClassAwareSampler(dicts, seed, rank, world_size)
    else:
        sampler = TrainingSampler(len(dicts), True, seed, rank, world_size)
    return TrainLoader(dicts, mapper, batch_size, sampler)


def build_detection_train_loader_multi_dataset(
    dataset_groups: Sequence[Sequence[str]],
    mappers: Sequence[Callable],
    batch_sizes: Sequence[int],
    dataset_ratio: Sequence[float],
    sampler_names: Optional[Sequence[str]] = None,
    seed: int = 0,
    rank: int = 0,
    world_size: int = 1,
):
    """Returns (loaders, MultiDatasetSampler): each training step picks
    loader = loaders[mds.next_dataset()] — the reference's list-of-loaders
    round-robin (tools/train_net.py:404-420)."""
    loaders = []
    for i, group in enumerate(dataset_groups):
        s = sampler_names[i] if sampler_names else "TrainingSampler"
        loaders.append(
            build_detection_train_loader(
                group, mappers[i], batch_sizes[i], s,
                seed=seed + i, rank=rank, world_size=world_size, dataset_id=i,
            )
        )
    return loaders, MultiDatasetSampler(dataset_ratio, seed)


def build_detection_test_loader(dataset_name: str, mapper, rank: int = 0, world_size: int = 1):
    """batch-1 eval loader with exact-cover sharding."""
    dicts = get_detection_dataset_dicts([dataset_name], filter_empty=False)
    sampler = InferenceSampler(len(dicts), rank, world_size)

    def gen():
        for i in sampler:
            ex = mapper(dicts[i])
            if ex is None:
                continue
            ex["dataset_dict"] = dicts[i]
            yield ex

    gen.__len__ = lambda: len(sampler)
    return gen
