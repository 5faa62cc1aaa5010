"""Self-labeled "custom" dataset (points + plain-text lidar boxes).

Behavioral counterpart of
/root/reference/pcdet/datasets/custom/custom_dataset.py: info-pkl runtime
over `points/*.npy` + `labels/*.txt` (x y z dx dy dz heading class per line),
KITTI-protocol evaluation through MAP_CLASS_TO_KITTI, raw info building and
GT-database creation for gt_sampling.
"""
import copy
import pickle
from pathlib import Path

import numpy as np

from ..dataset import DatasetTemplate


class CustomDataset(DatasetTemplate):
    def __init__(self, dataset_cfg, class_names, training=True, root_path=None, logger=None):
        root_path = Path(root_path) if root_path is not None else Path(dataset_cfg["DATA_PATH"])
        if not root_path.is_absolute():
            from ...config import ROOT_DIR

            stripped = str(root_path)
            while stripped.startswith("../"):
                stripped = stripped[3:]
            root_path = ROOT_DIR / stripped
        super().__init__(dataset_cfg, class_names, training, root_path, logger)
        self.split = dataset_cfg["DATA_SPLIT"][self.mode]
        split_file = self.root_path / "ImageSets" / f"{self.split}.txt"
        self.sample_id_list = (
            [x.strip() for x in open(split_file).readlines()] if split_file.exists() else None
        )
        self.custom_infos = []
        self.include_data(self.mode)
        self.map_class_to_kitti = dataset_cfg.get("MAP_CLASS_TO_KITTI", {})

    def include_data(self, mode):
        for info_path in self.dataset_cfg.get("INFO_PATH", {}).get(mode, []):
            p = self.root_path / info_path
            if not p.exists():
                continue
            with open(p, "rb") as f:
                self.custom_infos.extend(pickle.load(f))
        if self.logger is not None:
            self.logger.info(f"Total samples for CUSTOM dataset: {len(self.custom_infos)}")
        if not self.custom_infos:
            raise FileNotFoundError(
                f"no custom infos under {self.root_path} — run create_custom_infos first")

    def get_lidar(self, idx):
        return np.load(str(self.root_path / "points" / f"{idx}.npy"))

    def get_label(self, idx):
        lines = open(self.root_path / "labels" / f"{idx}.txt").readlines()
        boxes, names = [], []
        for line in lines:
            parts = line.strip().split(" ")
            if not parts or not parts[0]:
                continue
            boxes.append([float(v) for v in parts[:-1]])
            names.append(parts[-1])
        return np.array(boxes, np.float32).reshape(-1, 7), np.array(names)

    def __len__(self):
        if self._merge_all_iters_to_one_epoch:
            return len(self.custom_infos) * self.total_epochs
        return len(self.custom_infos)

    def __getitem__(self, index):
        if self._merge_all_iters_to_one_epoch:
            index = index % len(self.custom_infos)
        info = copy.deepcopy(self.custom_infos[index])
        sample_idx = info["point_cloud"]["lidar_idx"]
        input_dict = {
            "frame_id": sample_idx,
            "points": self.get_lidar(sample_idx),
            "metadata": {"frame_id": sample_idx},
        }
        if "annos" in info:
            annos = info["annos"]
            keep = np.asarray(annos["name"]) != "DontCare"
            input_dict["gt_names"] = np.asarray(annos["name"])[keep]
            input_dict["gt_boxes"] = np.asarray(annos["gt_boxes_lidar"],
                                                np.float64)[keep]
        return self.prepare_data(data_dict=input_dict)

    def generate_prediction_dicts(self, batch_dict, final_box_dicts, class_names,
                                  output_path=None):
        annos = []
        for i in range(batch_dict["batch_size"]):
            valid = np.asarray(final_box_dicts["pred_valid"][i])
            boxes = np.asarray(final_box_dicts["pred_boxes"][i])[valid][:, :7]
            scores = np.asarray(final_box_dicts["pred_scores"][i])[valid]
            labels = np.asarray(final_box_dicts["pred_labels"][i])[valid]
            annos.append({
                "name": np.array(class_names, dtype=object)[labels - 1]
                if boxes.shape[0] else np.zeros(0, dtype=object),
                "score": scores,
                "boxes_lidar": boxes,
                "pred_labels": labels,
                "frame_id": batch_dict["metadata"][i]["frame_id"],
            })
        return annos

    def evaluation(self, det_annos, class_names, **kwargs):
        if "annos" not in self.custom_infos[0]:
            return "No ground-truth boxes for evaluation", {}
        from ..kitti import kitti_utils
        from ..kitti.kitti_eval import eval as kitti_eval

        eval_det = copy.deepcopy(det_annos)
        eval_gt = [copy.deepcopy(info["annos"]) for info in self.custom_infos]
        kitti_utils.transform_annotations_to_kitti_format(
            eval_det, map_name_to_kitti=self.map_class_to_kitti)
        kitti_utils.transform_annotations_to_kitti_format(
            eval_gt, map_name_to_kitti=self.map_class_to_kitti,
            info_with_fakelidar=self.dataset_cfg.get("INFO_WITH_FAKELIDAR", False))
        kitti_classes = [self.map_class_to_kitti[x] for x in class_names]
        return kitti_eval.get_official_eval_result(eval_gt, eval_det, kitti_classes)

    def get_infos(self, class_names, has_label=True, sample_id_list=None, num_features=4):
        infos = []
        for sample_idx in (sample_id_list or self.sample_id_list or []):
            info = {"point_cloud": {"num_features": num_features, "lidar_idx": sample_idx}}
            if has_label:
                boxes, names = self.get_label(sample_idx)
                infos.append({**info, "annos": {
                    "name": names, "gt_boxes_lidar": boxes[:, :7],
                }})
            else:
                infos.append(info)
        return infos


    def create_groundtruth_database(self, info_path=None, used_classes=None, split="train"):
        """GT-paste database producer (reference custom_dataset.py:167-219)."""
        from ..augmentor.gt_database import create_groundtruth_database

        with open(info_path, "rb") as f:
            infos = pickle.load(f)
        return create_groundtruth_database(
            infos, self.get_lidar, self.root_path, "custom",
            used_classes=used_classes, split=split, logger=self.logger,
        )


def create_custom_infos(dataset_cfg, class_names, data_path, save_path, with_gt_database=True):
    """Reference custom_dataset.py:233-263."""
    dataset = CustomDataset.__new__(CustomDataset)
    DatasetTemplate.__init__(dataset, dataset_cfg, class_names, False, data_path, None)
    dataset.logger = None
    for split in ("train", "val"):
        ids_file = Path(data_path) / "ImageSets" / f"{split}.txt"
        if not ids_file.exists():
            continue
        dataset.sample_id_list = [x.strip() for x in open(ids_file).readlines()]
        infos = dataset.get_infos(class_names)
        out = Path(save_path) / f"custom_infos_{split}.pkl"
        with open(out, "wb") as f:
            pickle.dump(infos, f)
        print(f"custom infos {split}: {len(infos)} -> {out}")
        if split == "train" and with_gt_database:
            dataset.create_groundtruth_database(info_path=out, split=split)
