"""Pack a per-object gt database into one resident .npy (integrated DB).

Counterpart of /root/reference/tools/process_tools/create_integrated_database.py:
reads a ``*_dbinfos_*.pkl``, concatenates every object's .bin rows into
``{new_db_name}.npy`` and stamps ``global_data_offset`` ranges back into the
pkl. ``DataBaseSampler`` slices the array when the sampler config names it via
``DB_DATA_PATH`` — one mmap instead of a file-open per pasted object.
"""
import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

from pcp_tpu.datasets.augmentor.gt_database import create_integrated_database


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--src_db_info", type=str, required=True,
                        help="path to the *_dbinfos_*.pkl produced by create_groundtruth_database")
    parser.add_argument("--root_path", type=str, required=True,
                        help="dataset root the db-info 'path' entries are relative to")
    parser.add_argument("--new_db_name", type=str, required=True,
                        help="output npy name (without extension), written under root_path")
    parser.add_argument("--num_point_features", type=int, default=4)
    args = parser.parse_args()

    create_integrated_database(
        args.src_db_info, args.root_path, args.new_db_name, args.num_point_features
    )


if __name__ == "__main__":
    main()
