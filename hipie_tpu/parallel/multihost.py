"""Multi-host utilities: cross-process metric/prediction aggregation.

Replaces the reference's Gloo-side comm helpers (detectron2/utils/comm.py
all_gather/gather/reduce_dict, SURVEY.md §2.6) with
jax.experimental.multihost_utils. On a single host every function is a no-op
passthrough, mirroring comm.py's world_size==1 short-circuits.
"""

from __future__ import annotations

from typing import Any, Dict, List

import jax
import numpy as np


def is_main_process() -> bool:
    return jax.process_index() == 0


def num_processes() -> int:
    return jax.process_count()


def all_gather_objects(obj: Any) -> List[Any]:
    """Gather an arbitrary picklable object from every host (comm.all_gather).

    Two-phase: gather pickled byte lengths, pad to the max, gather the padded
    byte buffers, unpickle per rank — handles ragged per-rank prediction lists
    (the evaluator use case, detectron2/utils/comm.py:99-123), unlike a plain
    array allgather.
    """
    if jax.process_count() == 1:
        return [obj]
    import pickle
    from jax.experimental import multihost_utils
    buf = np.frombuffer(pickle.dumps(obj), np.uint8)
    sizes = multihost_utils.process_allgather(
        np.asarray([buf.size], np.int64)).reshape(-1)
    padded = np.zeros(int(sizes.max()), np.uint8)
    padded[:buf.size] = buf
    data = np.asarray(multihost_utils.process_allgather(padded))
    return [pickle.loads(data[i, :int(sizes[i])].tobytes())
            for i in range(len(sizes))]


def reduce_metrics(metrics: Dict[str, float]) -> Dict[str, float]:
    """Mean-reduce scalar metrics across hosts (comm.reduce_dict)."""
    if jax.process_count() == 1:
        return metrics
    from jax.experimental import multihost_utils
    keys = sorted(metrics)
    vals = np.asarray([metrics[k] for k in keys], np.float64)
    gathered = multihost_utils.process_allgather(vals)
    mean = np.asarray(gathered).mean(0)
    return {k: float(v) for k, v in zip(keys, mean)}


def sync() -> None:
    """Barrier (comm.synchronize)."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils
        multihost_utils.sync_global_devices("hipie_tpu_sync")
