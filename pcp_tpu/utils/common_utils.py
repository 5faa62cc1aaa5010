"""Common runtime utilities: logging, seeding, dict flattening.

Counterpart of /root/reference/pcdet/utils/common_utils.py minus the NCCL
bootstrap (JAX process/mesh setup lives in pcp_tpu.parallel instead).
"""
import logging
import os
import random

import numpy as np


def create_logger(log_file=None, rank=0, log_level=logging.INFO):
    logger = logging.getLogger(f"pcp_tpu.r{rank}.{log_file}")
    logger.setLevel(log_level if rank == 0 else logging.ERROR)
    logger.propagate = False
    if logger.handlers:
        return logger
    formatter = logging.Formatter("%(asctime)s  %(levelname)5s  %(message)s")
    console = logging.StreamHandler()
    console.setLevel(log_level if rank == 0 else logging.ERROR)
    console.setFormatter(formatter)
    logger.addHandler(console)
    if log_file is not None:
        fh = logging.FileHandler(log_file)
        fh.setLevel(log_level if rank == 0 else logging.ERROR)
        fh.setFormatter(formatter)
        logger.addHandler(fh)
    return logger


def set_random_seed(seed):
    random.seed(seed)
    np.random.seed(seed)
    os.environ["PYTHONHASHSEED"] = str(seed)


def worker_init_fn(worker_id, seed=666):
    if seed is not None:
        random.seed(seed + worker_id)
        np.random.seed(seed + worker_id)


def keep_arrays_by_name(gt_names, used_classes):
    inds = [i for i, x in enumerate(gt_names) if x in used_classes]
    return np.array(inds, dtype=np.int64)


def drop_info_with_name(info, name):
    ret_info = {}
    keep_indices = [i for i, x in enumerate(info["name"]) if x != name]
    for key in info.keys():
        if isinstance(info[key], np.ndarray) and info[key].shape[0] == len(info["name"]):
            ret_info[key] = info[key][keep_indices]
        else:
            ret_info[key] = info[key]
    ret_info["name"] = info["name"][keep_indices] if isinstance(info["name"], np.ndarray) else [
        info["name"][i] for i in keep_indices
    ]
    return ret_info
