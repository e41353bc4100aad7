"""Dataset base class + loader (role of reference `datasets/base_dataset.py:100-209`).

Design: datasets are host-side (numpy/cv2) and emit nested dicts of numpy
arrays with STATIC shapes per split (TPU batches must compile once). Geometry
objects are emitted as plain arrays (`camera` as a dict of arrays, poses as
4x4 matrices) so no JAX state is touched in worker processes;
`prepare_batch` converts a collated numpy batch into device types
(`Pose`/`Camera` pytrees + jnp arrays) on the main process.

The loader engine is torch.utils.data.DataLoader (CPU torch is the one
battle-tested multiprocess loader in this image) with a numpy collate —
torch tensors never cross into JAX land.
"""

from __future__ import annotations

import numpy as np
import torch
import torch.utils.data as torch_data

from ..core.config import Config, merge
from ..geometry.wrappers import Camera, Pose


def collate(batch: list):
    """Stack nested dicts of numpy arrays; lists for strings/objects."""
    elem = batch[0]
    if isinstance(elem, dict):
        return {k: collate([b[k] for b in batch]) for k in elem}
    if isinstance(elem, np.ndarray):
        return np.stack(batch, axis=0)
    if isinstance(elem, (float, np.floating)):
        return np.asarray(batch, dtype=np.float32)
    if isinstance(elem, (int, np.integer)):
        return np.asarray(batch, dtype=np.int64)
    if isinstance(elem, (bool, np.bool_)):
        return np.asarray(batch, dtype=bool)
    return list(batch)


def prepare_batch(batch):
    """Convert a collated numpy batch into device-side types: camera dicts ->
    `Camera`, pose matrices (`T_*` keys) -> `Pose`. Returns a pytree ready for
    jit (arrays stay numpy; jit will device-put them)."""
    import jax.numpy as jnp

    def convert(key, value):
        if isinstance(value, dict):
            if key == "camera":
                return Camera(
                    jnp.asarray(value["size"]),
                    jnp.asarray(value["f"]),
                    jnp.asarray(value["c"]),
                    jnp.asarray(value.get("dist")) if "dist" in value else None,
                )
            return {k: convert(k, v) for k, v in value.items()}
        if isinstance(key, str) and key.startswith("T_") and isinstance(value, np.ndarray):
            return Pose.from_4x4mat(jnp.asarray(value, jnp.float32))
        return value

    return {k: convert(k, v) for k, v in batch.items()}


class LoopSampler(torch_data.Sampler):
    """Loop over a few indices forever (overfit mode, reference
    `base_dataset.py:25-34`)."""

    def __init__(self, loop_size: int, total_size: int | None = None):
        self.loop_size = loop_size
        self.total_size = total_size - (total_size % loop_size) if total_size else None

    def __iter__(self):
        return (i % self.loop_size for i in range(self.total_size))

    def __len__(self):
        return self.total_size


def worker_init_fn(i):
    info = torch_data.get_worker_info()
    if hasattr(info.dataset, "conf"):
        seed = info.dataset.conf.get("seed", 0)
    else:
        seed = 0
    np.random.seed(seed + i)


class BaseDataset:
    """Subclasses define `default_conf`, `_init(conf)` and `get_dataset(split)`
    returning a map-style dataset (len + getitem -> nested numpy dict)."""

    base_default_conf = {
        "name": None,
        "num_workers": 0,
        # per-split overrides; when unset, `batch_size` applies to every
        # split (reference base_dataset.py:19-24 — a default of 1 here would
        # shadow `batch_size` for configs that only set the global key)
        "train_batch_size": None,
        "val_batch_size": None,
        "test_batch_size": None,
        "batch_size": 1,
        "shuffle_training": True,
        "batch_size_divisor": None,  # e.g. number of devices
        "prefetch_factor": 2,
        "seed": 0,
    }
    default_conf: dict = {}
    strict_conf = False

    def __init__(self, conf=None):
        defaults = merge(Config(self.base_default_conf), self.default_conf)
        self.conf = merge(defaults, conf or {}, strict=self.strict_conf)
        self._init(self.conf)

    def _init(self, conf):
        pass

    def get_dataset(self, split: str):
        raise NotImplementedError

    def batch_size(self, split: str) -> int:
        return self.conf.get(f"{split}_batch_size") or self.conf.batch_size

    def get_data_loader(self, split: str, shuffle: bool | None = None, distributed: bool = False):
        """With `distributed=True`, each JAX process loads its 1/num_processes
        shard of the dataset (role of the reference's DistributedSampler,
        `base_dataset.py:166-169` — per-host data loading for multi-host pjit)."""
        dataset = self.get_dataset(split)
        bs = self.batch_size(split)
        if shuffle is None:
            shuffle = split == "train" and self.conf.shuffle_training
        num_workers = self.conf.num_workers
        kwargs = {}
        if num_workers > 0:
            kwargs["prefetch_factor"] = self.conf.prefetch_factor
            kwargs["worker_init_fn"] = worker_init_fn
        generator = torch.Generator()
        generator.manual_seed(self.conf.seed)
        if distributed:
            import jax

            # drop_last on train keeps per-process shards disjoint when the
            # dataset size is not divisible by process_count (the sampler
            # would otherwise pad with duplicated indices); matches reference
            # base_dataset.py:166-169 semantics
            sampler = torch_data.distributed.DistributedSampler(
                dataset,
                num_replicas=jax.process_count(),
                rank=jax.process_index(),
                shuffle=shuffle,
                seed=self.conf.seed,
                drop_last=split == "train",
            )
            kwargs["sampler"] = sampler
            shuffle = False
        return torch_data.DataLoader(
            dataset,
            batch_size=bs,
            shuffle=shuffle if not distributed else False,
            num_workers=num_workers,
            collate_fn=collate,
            drop_last=split == "train",
            generator=generator,
            **kwargs,
        )

    def get_overfit_loader(self, split: str):
        """Loop a single batch forever (reference `base_dataset.py:187-209`)."""
        dataset = self.get_dataset("train")
        sampler = LoopSampler(
            self.batch_size(split), len(dataset) if split == "train" else self.batch_size(split)
        )
        return torch_data.DataLoader(
            dataset,
            batch_size=self.batch_size(split),
            sampler=sampler,
            num_workers=0,
            collate_fn=collate,
        )
