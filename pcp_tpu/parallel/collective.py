"""Collective-communication helpers.

Counterpart of /root/reference/pcdet/utils/commu_utils.py (all_gather of
arbitrary picklables, reduce_dict, average_reduce_value over NCCL) and
``merge_results_dist``'s pickle-tmpdir gather (common_utils.py:223-244).
On TPU, in-graph collectives are psum/all_gather inside jit over the mesh;
these helpers cover the *host-side* multi-process cases (eval merging,
metric reduction) through jax.experimental.multihost_utils, degrading to
no-ops in single-process runs.
"""
import jax
import numpy as np


def get_dist_info():
    return jax.process_index(), jax.process_count()


def all_gather_objects(obj):
    """Gather arbitrary picklables from every process (reference
    commu_utils.all_gather). Single-process: [obj]."""
    if jax.process_count() == 1:
        return [obj]
    from jax.experimental import multihost_utils
    import pickle

    payload = np.frombuffer(pickle.dumps(obj), dtype=np.uint8)
    # pad to the max length across processes
    length = np.array([payload.size], np.int32)
    all_len = multihost_utils.process_allgather(length)
    max_len = int(all_len.max())
    padded = np.zeros(max_len, np.uint8)
    padded[: payload.size] = payload
    gathered = multihost_utils.process_allgather(padded)
    out = []
    for i in range(jax.process_count()):
        out.append(pickle.loads(gathered[i][: int(all_len[i])].tobytes()))
    return out


def merge_results_dist(part_list, total_size):
    """Merge per-process eval results into one ordered list on every process
    (reference common_utils.merge_results_dist without the tmpdir dance)."""
    parts = all_gather_objects(part_list)
    merged = []
    for p in parts:
        merged.extend(p)
    return merged[:total_size]


def average_reduce_value(value):
    """Mean of a scalar across processes (reference
    commu_utils.average_reduce_value)."""
    vals = all_gather_objects(float(value))
    return float(np.mean(vals))


def reduce_dict(d, average=True):
    keys = sorted(d.keys())
    stacked = np.array([float(d[k]) for k in keys])
    gathered = np.stack(all_gather_objects(stacked))
    red = gathered.mean(0) if average else gathered.sum(0)
    return {k: float(v) for k, v in zip(keys, red)}
