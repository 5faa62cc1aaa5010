"""KITTI 3D object detection dataset.

Behavioral counterpart of
/root/reference/pcdet/datasets/kitti/kitti_dataset.py: info-pkl runtime
(__getitem__ :371-431 — velodyne .bin load, optional FOV crop, camera->lidar
GT conversion), prediction formatting back to KITTI camera annotations
(generate_prediction_dicts :277-352), official AP evaluation (:353-363), and
raw-data info building (get_infos :150-222, gated on the raw dataset being on
disk). Under this codebase's padded collate, per-sample host objects (calib,
image_shape, frame_id) ride the metadata list.
"""
import copy
import pickle
from pathlib import Path

import numpy as np

from ...utils import box_utils
from ...utils.calibration_kitti import Calibration, get_calib_from_file
from ..dataset import DatasetTemplate


class KittiDataset(DatasetTemplate):
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
        self.root_split_path = self.root_path / (
            "training" if self.split != "test" else "testing")
        split_file = self.root_path / "ImageSets" / f"{self.split}.txt"
        self.sample_id_list = (
            [x.strip() for x in open(split_file).readlines()] if split_file.exists() else None
        )
        self.kitti_infos = []
        self.include_kitti_data(self.mode)

    def include_kitti_data(self, mode):
        infos = []
        for info_path in self.dataset_cfg.get("INFO_PATH", {}).get(mode, []):
            p = self.root_path / info_path
            if not p.exists():
                continue
            with open(p, "rb") as f:
                infos.extend(pickle.load(f))
        self.kitti_infos.extend(infos)
        if self.logger is not None:
            self.logger.info(f"Total samples for KITTI dataset: {len(self.kitti_infos)}")
        if not self.kitti_infos:
            raise FileNotFoundError(
                f"no KITTI infos found under {self.root_path} — run "
                "pcp_tpu.datasets.kitti.kitti_dataset.create_kitti_infos on the raw "
                "dataset first (requires the KITTI object files on disk)")

    # ------------------------------------------------------------- raw files
    def get_lidar(self, idx):
        f = self.root_split_path / "velodyne" / f"{idx}.bin"
        return np.fromfile(str(f), dtype=np.float32).reshape(-1, 4)

    def get_calib(self, idx):
        return Calibration(str(self.root_split_path / "calib" / f"{idx}.txt"))

    def get_image_shape(self, idx):
        try:
            from PIL import Image

            with Image.open(self.root_split_path / "image_2" / f"{idx}.png") as im:
                w, h = im.size
            return np.array([h, w], dtype=np.int32)
        except Exception:
            return np.array([375, 1242], dtype=np.int32)

    @staticmethod
    def get_fov_flag(pts_rect, img_shape, calib):
        """Reference kitti_dataset.py:132-148."""
        pts_img, pts_rect_depth = calib.rect_to_img(pts_rect)
        val_flag_1 = np.logical_and(pts_img[:, 0] >= 0, pts_img[:, 0] < img_shape[1])
        val_flag_2 = np.logical_and(pts_img[:, 1] >= 0, pts_img[:, 1] < img_shape[0])
        val_flag_merge = np.logical_and(val_flag_1, val_flag_2)
        return np.logical_and(val_flag_merge, pts_rect_depth >= 0)

    # -------------------------------------------------------------- getitem
    def __len__(self):
        if self._merge_all_iters_to_one_epoch:
            return len(self.kitti_infos) * self.total_epochs
        return len(self.kitti_infos)

    def __getitem__(self, index):
        if self._merge_all_iters_to_one_epoch:
            index = index % len(self.kitti_infos)
        info = copy.deepcopy(self.kitti_infos[index])
        sample_idx = info["point_cloud"]["lidar_idx"]
        img_shape = info["image"]["image_shape"]
        calib = (Calibration(info["calib"]) if "calib" in info
                 else self.get_calib(sample_idx))

        input_dict = {"frame_id": sample_idx}
        if "annos" in info:
            annos = {k: np.asarray(v) for k, v in info["annos"].items()}
            keep = annos["name"] != "DontCare"
            loc = annos["location"][keep]
            dims = annos["dimensions"][keep]
            rots = annos["rotation_y"][keep]
            gt_names = annos["name"][keep]
            gt_boxes_camera = np.concatenate(
                [loc, dims, rots[..., None]], axis=1).astype(np.float32)
            gt_boxes_lidar = box_utils.boxes3d_kitti_camera_to_lidar(gt_boxes_camera, calib)
            input_dict.update({"gt_names": gt_names,
                               "gt_boxes": gt_boxes_lidar.astype(np.float64)})

        points = self.get_lidar(sample_idx)
        if self.dataset_cfg.get("FOV_POINTS_ONLY", False):
            pts_rect = calib.lidar_to_rect(points[:, 0:3])
            points = points[self.get_fov_flag(pts_rect, img_shape, calib)]
        input_dict["points"] = points
        input_dict["metadata"] = {
            "calib": calib, "image_shape": np.asarray(img_shape),
            "frame_id": sample_idx,
        }
        return self.prepare_data(data_dict=input_dict)

    # --------------------------------------------------------- output format
    def generate_prediction_dicts(self, batch_dict, final_box_dicts, class_names,
                                  output_path=None):
        """Fixed-shape device outputs -> KITTI camera annos (reference :277-352)."""
        annos = []
        b = batch_dict["batch_size"]
        for i in range(b):
            meta = batch_dict["metadata"][i]
            valid = np.asarray(final_box_dicts["pred_valid"][i])
            boxes = np.asarray(final_box_dicts["pred_boxes"][i])[valid][:, :7]
            scores = np.asarray(final_box_dicts["pred_scores"][i])[valid]
            labels = np.asarray(final_box_dicts["pred_labels"][i])[valid]
            n = boxes.shape[0]
            anno = {
                "name": np.zeros(n, dtype=object), "truncated": np.zeros(n),
                "occluded": np.zeros(n), "alpha": np.zeros(n),
                "bbox": np.zeros([n, 4]), "dimensions": np.zeros([n, 3]),
                "location": np.zeros([n, 3]), "rotation_y": np.zeros(n),
                "score": np.zeros(n), "boxes_lidar": boxes,
                "frame_id": meta["frame_id"],
            }
            if n:
                calib = meta["calib"]
                cam = box_utils.boxes3d_lidar_to_kitti_camera(boxes, calib)
                img = box_utils.boxes3d_kitti_camera_to_imageboxes(
                    cam, calib, image_shape=meta["image_shape"])
                anno["name"] = np.array(class_names)[labels - 1]
                anno["alpha"] = -np.arctan2(-boxes[:, 1], boxes[:, 0]) + cam[:, 6]
                anno["bbox"] = img
                anno["dimensions"] = cam[:, 3:6]
                anno["location"] = cam[:, 0:3]
                anno["rotation_y"] = cam[:, 6]
                anno["score"] = scores
            annos.append(anno)
            if output_path is not None:
                with open(Path(output_path) / f"{meta['frame_id']}.txt", "w") as f:
                    for k in range(n):
                        bb, lo, dd = anno["bbox"][k], anno["location"][k], anno["dimensions"][k]
                        print("%s -1 -1 %.4f %.4f %.4f %.4f %.4f %.4f %.4f %.4f %.4f %.4f %.4f %.4f %.4f"
                              % (anno["name"][k], anno["alpha"][k], bb[0], bb[1], bb[2], bb[3],
                                 dd[1], dd[2], dd[0], lo[0], lo[1], lo[2],
                                 anno["rotation_y"][k], anno["score"][k]), file=f)
        return annos

    def evaluation(self, det_annos, class_names, **kwargs):
        if "annos" not in self.kitti_infos[0]:
            return "no GT annos", {}
        from .kitti_eval import eval as kitti_eval

        eval_det = copy.deepcopy(det_annos)
        eval_gt = [copy.deepcopy(info["annos"]) for info in self.kitti_infos]
        return kitti_eval.get_official_eval_result(eval_gt, eval_det, class_names)

    # ----------------------------------------------------------- info build
    def get_infos(self, has_label=True, count_inside_pts=True, sample_id_list=None):
        """Raw-data info building (reference :150-222); requires the KITTI
        object files (velodyne/calib/label_2/image_2) on disk."""
        from ...ops.points_in_boxes import points_in_boxes_mask
        import jax.numpy as jnp

        infos = []
        for sample_idx in (sample_id_list or self.sample_id_list or []):
            calib_dict = get_calib_from_file(self.root_split_path / "calib" / f"{sample_idx}.txt")
            calib = Calibration(calib_dict)
            info = {
                "point_cloud": {"num_features": 4, "lidar_idx": sample_idx},
                "image": {"image_idx": sample_idx,
                          "image_shape": self.get_image_shape(sample_idx)},
                "calib": calib_dict,
            }
            if has_label:
                lines = open(self.root_split_path / "label_2" / f"{sample_idx}.txt").readlines()
                objs = [l.strip().split(" ") for l in lines if l.strip()]
                annos = {
                    "name": np.array([o[0] for o in objs]),
                    "truncated": np.array([float(o[1]) for o in objs]),
                    "occluded": np.array([int(float(o[2])) for o in objs]),
                    "alpha": np.array([float(o[3]) for o in objs]),
                    "bbox": np.array([[float(v) for v in o[4:8]] for o in objs]).reshape(-1, 4),
                    "dimensions": np.array(
                        [[float(o[10]), float(o[8]), float(o[9])] for o in objs]).reshape(-1, 3),  # lhw
                    "location": np.array([[float(v) for v in o[11:14]] for o in objs]).reshape(-1, 3),
                    "rotation_y": np.array([float(o[14]) for o in objs]),
                    "score": np.array([float(o[15]) if len(o) > 15 else -1.0 for o in objs]),
                }
                # KITTI difficulty levels (object3d_kitti.get_kitti_obj_level):
                # bbox height / occlusion / truncation thresholds
                bb_h = annos["bbox"][:, 3] - annos["bbox"][:, 1]
                occ, trunc = annos["occluded"], annos["truncated"]
                difficulty = np.full(len(objs), -1, dtype=np.int32)
                difficulty[(bb_h >= 25) & (occ <= 2) & (trunc <= 0.50)] = 2
                difficulty[(bb_h >= 25) & (occ <= 1) & (trunc <= 0.30)] = 1
                difficulty[(bb_h >= 40) & (occ <= 0) & (trunc <= 0.15)] = 0
                annos["difficulty"] = difficulty
                num_objects = int((annos["name"] != "DontCare").sum())
                annos["index"] = np.concatenate(
                    [np.arange(num_objects), -np.ones(len(objs) - num_objects)]).astype(np.int32)
                gt_cam = np.concatenate(
                    [annos["location"], annos["dimensions"], annos["rotation_y"][..., None]],
                    axis=1)[:num_objects]
                annos["gt_boxes_lidar"] = box_utils.boxes3d_kitti_camera_to_lidar(gt_cam, calib)
                if count_inside_pts:
                    points = self.get_lidar(sample_idx)
                    pts_rect = calib.lidar_to_rect(points[:, 0:3])
                    fov = self.get_fov_flag(pts_rect, info["image"]["image_shape"], calib)
                    inside = np.asarray(points_in_boxes_mask(
                        jnp.asarray(points[fov][:, :3]),
                        jnp.asarray(annos["gt_boxes_lidar"].astype(np.float32))))
                    cnt = inside.sum(axis=0)
                    annos["num_points_in_gt"] = np.concatenate(
                        [cnt, -np.ones(len(objs) - num_objects)]).astype(np.int32)
                info["annos"] = annos
            infos.append(info)
        return infos


    def create_groundtruth_database(self, info_path=None, used_classes=None, split="train"):
        """GT-paste database producer (reference kitti_dataset.py:224-275):
        one box-centered .bin per object + kitti_dbinfos_{split}.pkl."""
        from ..augmentor.gt_database import create_groundtruth_database

        with open(info_path, "rb") as f:
            infos = pickle.load(f)
        return create_groundtruth_database(
            infos, self.get_lidar, self.root_path, "kitti",
            used_classes=used_classes, split=split, logger=self.logger,
        )


def create_kitti_infos(dataset_cfg, class_names, data_path, save_path, with_gt_database=True):
    """Reference kitti_dataset.py:431-469 (train/val/trainval/test pkls +
    the train gt database)."""
    dataset = KittiDataset.__new__(KittiDataset)
    DatasetTemplate.__init__(dataset, dataset_cfg, class_names, False, data_path, None)
    dataset.logger = None
    for split, has_label in (("train", True), ("val", True), ("test", False)):
        dataset.split = split
        dataset.root_split_path = Path(data_path) / ("training" if split != "test" else "testing")
        ids_file = Path(data_path) / "ImageSets" / f"{split}.txt"
        if not ids_file.exists():
            continue
        dataset.sample_id_list = [x.strip() for x in open(ids_file).readlines()]
        infos = dataset.get_infos(has_label=has_label)
        out = Path(save_path) / f"kitti_infos_{split}.pkl"
        with open(out, "wb") as f:
            pickle.dump(infos, f)
        print(f"KITTI infos {split}: {len(infos)} -> {out}")
        if split == "train" and with_gt_database:
            dataset.create_groundtruth_database(info_path=out, split=split)
