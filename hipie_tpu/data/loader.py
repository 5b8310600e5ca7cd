"""Training/eval data loaders with multi-dataset ratio sampling.

Behavioral parity target: reference hipie/data/custom_dataset_dataloader.py —
MultiDatasetSampler (:195-266, ratio-weighted infinite sampling with optional
repeat-factor upweighting) and MDAspectRatioGroupedDataset (:268-307, batches
grouped by dataset x aspect so every batch is single-dataset/single-task).

TPU redesign: batches carry static shapes; the aspect grouping maps onto the
two padded buckets (tall/wide) so at most 2 x num_datasets compiled programs
exist. Workers prefetch with a simple thread pool (the C++ loader daemon is a
follow-up; see hipie_tpu/data/README in repo docs).
"""

from __future__ import annotations

import threading
from queue import Queue
from typing import Any, Dict, Iterator, List, Optional, Sequence, Tuple

import numpy as np

from hipie_tpu.config import DataConfig
from hipie_tpu.data.datasets import get_dataset, materialize_record
from hipie_tpu.data.mapper import HIPIEMapper, MapperOutput
from hipie_tpu.losses.criterion import Targets


class MultiDatasetSampler:
    """Infinite index stream: (dataset_idx, record_idx) with dataset ratios."""

    def __init__(self, sizes: Sequence[int], ratios: Sequence[float],
                 seed: int = 0, shard_rank: int = 0, num_shards: int = 1):
        self.sizes = list(sizes)
        p = np.asarray(ratios, np.float64)
        self.p = p / p.sum()
        self.rng = np.random.RandomState(seed + shard_rank)
        self.shard_rank = shard_rank
        self.num_shards = num_shards

    def __iter__(self) -> Iterator[Tuple[int, int]]:
        while True:
            d = int(self.rng.choice(len(self.sizes), p=self.p))
            i = int(self.rng.randint(self.sizes[d]))
            yield d, i


def collate_train(outs: List[MapperOutput]) -> Dict[str, np.ndarray]:
    """Stack mapper outputs (same bucket) into TrainBatch arrays."""
    t = Targets(
        labels=np.stack([o.labels for o in outs]),
        boxes=np.stack([o.boxes for o in outs]),
        masks=np.stack([o.masks for o in outs]),
        positive_map=np.stack([o.positive_map for o in outs]),
        is_thing=np.stack([o.is_thing for o in outs]),
        valid=np.stack([o.valid for o in outs]),
    )
    return dict(
        images=np.stack([o.image for o in outs]),
        pad_mask=np.stack([o.pad_mask for o in outs]),
        input_ids=np.stack([o.input_ids for o in outs]),
        lang_mask=np.stack([o.attention_mask for o in outs]),
        image_sizes=np.asarray([o.image_size for o in outs], np.int32),
        targets=t,
    )


class TrainLoader:
    """Ratio-sampled, dataset-homogeneous, bucket-padded infinite batches."""

    def __init__(self, cfg: DataConfig, mapper: HIPIEMapper,
                 batch_size: int, seed: int = 0,
                 shard_rank: int = 0, num_shards: int = 1,
                 prefetch: int = 2):
        self.cfg = cfg
        self.mapper = mapper
        self.batch_size = batch_size
        self.datasets = [get_dataset(n) for n in cfg.train_datasets]
        self.sampler = MultiDatasetSampler(
            [len(d) for d in self.datasets], cfg.dataset_ratios, seed,
            shard_rank, num_shards)
        self.bucket = (cfg.crop_size, cfg.crop_size) if cfg.lsj_crop else None
        self._queue: Queue = Queue(maxsize=prefetch)
        self._thread = threading.Thread(target=self._worker, daemon=True)
        self._started = False

    def _make_batch(self, it):
        d, i = next(it)
        outs = [self.mapper(materialize_record(self.datasets[d][i]),
                            bucket=self.bucket)]
        while len(outs) < self.batch_size:
            _, j = next(it)
            outs.append(self.mapper(materialize_record(self.datasets[d][j]),
                                    bucket=self.bucket))
        return collate_train(outs)

    def _worker(self):
        it = iter(self.sampler)
        while True:
            self._queue.put(self._make_batch(it))

    def __iter__(self):
        if not self._started:
            self._thread.start()
            self._started = True
        while True:
            yield self._queue.get()


def test_loader(dataset_name: str, mapper: HIPIEMapper,
                bucket: Optional[Tuple[int, int]] = None):
    """bs=1 eval iterator (reference build_detection_test_loader)."""
    records = get_dataset(dataset_name)
    for r in records:
        yield mapper(materialize_record(r), bucket=bucket), r
