"""V2X-Sim roadside-unit (RSU, LIDAR_TOP_id_0) single-agent dataset.

Capability match for /root/reference/pcdet/datasets/v2x_sim/v2x_sim_dataset_rsu.py:
town-based train/val split (towns 4,5 train / 3 val, :77-108), info building
(:110-164), pseudo-sweep __getitem__ (:230-268), nuScenes-protocol evaluation
keyed by lidar_token (:166-228). Runs on either the real V2X-Sim DB (via
nuscenes-devkit) or the deterministic synthetic world (source.py) when the
dataset is absent — selected by ``USE_SYNTHETIC_DATA`` or auto-detected.
"""
import copy
import pickle
from pathlib import Path

import numpy as np

from ..dataset import DatasetTemplate
from .source import SyntheticV2XSource, NuScenesV2XSource, NUM_AGENTS
from .v2x_sim_utils import get_pseudo_sweeps_of_1lidar


class V2XSimDataset_RSU(DatasetTemplate):
    LIDAR_IDS = (0,)

    def __init__(self, dataset_cfg, class_names, training=True, root_path=None, logger=None, source=None):
        root_path = Path(root_path) if root_path is not None else Path(dataset_cfg["DATA_PATH"])
        if not root_path.is_absolute():
            # reference-style relative paths (../data/v2x-sim, resolved against
            # tools/) are anchored at the repo root here — never at the CWD
            from ...config import ROOT_DIR

            stripped = str(root_path)
            while stripped.startswith("../"):
                stripped = stripped[3:]
            root_path = ROOT_DIR / stripped
        root_path = root_path / dataset_cfg["VERSION"]
        super().__init__(dataset_cfg, class_names, training, root_path, logger)
        self._prefix = "mini" if "mini" in dataset_cfg["VERSION"] else "full"

        self.classes_of_interest = set(
            dataset_cfg.get("CLASSES_OF_INTEREST", ["car", "pedestrian"])
        )
        self.num_historical_sweeps = int(dataset_cfg.get("NUM_HISTORICAL_SWEEPS", 10))
        self.num_sweeps = self.num_historical_sweeps + 1
        self.threshold_boxes_by_points = dataset_cfg.get("THRESHOLD_BOXES_BY_POINTS", 5)

        # real V2X-Sim present iff the nuScenes table dir exists
        # (dataroot/VERSION/VERSION/sample.json layout, as the reference loads)
        real_db_present = (self.root_path / dataset_cfg["VERSION"] / "sample.json").exists()
        self.synthetic = bool(dataset_cfg.get("USE_SYNTHETIC_DATA", False)) or not real_db_present
        if source is not None:
            self.source = source
            self.synthetic = isinstance(source, SyntheticV2XSource)
        elif self.synthetic:
            syn = dataset_cfg.get("SYNTHETIC", {})
            self.source = SyntheticV2XSource(
                num_scenes=int(syn.get("NUM_SCENES", 4)),
                keyframes_per_scene=int(syn.get("KEYFRAMES_PER_SCENE", 12)),
                num_cars=int(syn.get("NUM_CARS", 24)),
                num_peds=int(syn.get("NUM_PEDS", 8)),
                seed=int(syn.get("SEED", 0)),
                world=str(syn.get("WORLD", "open")),
                num_parked=int(syn.get("NUM_PARKED", 0)),
                visible_faces=bool(syn.get("VISIBLE_FACES", False)),
                car_profile=(bool(syn["CAR_PROFILE"]) if "CAR_PROFILE" in syn else None),
            )
            if logger is not None:
                logger.info("V2X-Sim data not found -> synthetic V2X world active")
        else:
            self.source = NuScenesV2XSource(self.root_path, dataset_cfg["VERSION"])

        self.infos = []
        self.include_v2x_sim_data(self.mode)
        self.all_sample_data_tokens = [i["lidar_token"] for i in self.infos]

    # ------------------------------------------------------------------ infos
    def _split_for_scene(self, scene):
        return "train" if scene.town in (4, 5) else "val"

    def _build_infos_synthetic(self, split):
        infos = []
        for scene, kf in self.source.iter_samples():
            if self._split_for_scene(scene) != split:
                continue
            for lidar_id in self.LIDAR_IDS:
                token = self.source.lidar_token(scene, kf, lidar_id)
                infos.append(
                    {
                        "token": self.source.sample_token(scene, kf),
                        "lidar_token": token,
                        "lidar_id": lidar_id,
                        "lidar_path": f"{token}.bin",
                        "timestamp": int(kf * 1e6),
                        "glob_se3_lidar": self.source.get_pose(token),
                    }
                )
        return infos

    def _filter_sem(self, infos):
        """Drop semantic-lidar channels (reference rsu :64-67, car :33-35)."""
        if not hasattr(self.source, "nusc"):
            return infos
        kept = []
        for info in infos:
            try:
                ch = self.source.nusc.get("sample_data", info["lidar_token"]).get("channel", "")
            except (KeyError, AttributeError):
                ch = ""
            if "SEM" not in ch:
                kept.append(info)
        return kept

    def include_v2x_sim_data(self, mode):
        split = self.dataset_cfg["DATA_SPLIT"][mode]
        if self.synthetic:
            self.infos = self._build_infos_synthetic(split)
        else:
            for info_path in self.dataset_cfg["INFO_PATH"][mode]:
                p = self.root_path / f"{self._prefix}_{info_path}"
                if not p.exists():
                    continue
                with open(p, "rb") as f:
                    self.infos.extend(pickle.load(f))
            self.infos = self._filter_sem(self.infos)
        self.infos.sort(key=lambda e: e["timestamp"])
        if self.training and int(self.dataset_cfg.get("MINI_TRAINVAL_STRIDE", 1)) > 1:
            self.infos = self.infos[:: int(self.dataset_cfg["MINI_TRAINVAL_STRIDE"])]
        if self.logger is not None:
            self.logger.info("Total samples for V2X-Sim dataset: %d" % len(self.infos))

    # ------------------------------------------------- raw-DB info building
    def _build_train_val_split(self):
        """Town-location scene split persisted to pkl (reference
        v2x_sim_dataset_rsu.py:77-108: towns 4,5 train / town 3 val; mini
        versions collapse to a single split for plumbing tests)."""
        nusc = self.source.nusc
        train_scenes, val_scenes = [], []
        for scene in nusc.scene:
            log = nusc.get("log", scene["log_token"])
            if log["location"] in (4, 5, "4", "5"):
                train_scenes.append(scene["token"])
            else:
                val_scenes.append(scene["token"])
        if "mini" not in self.dataset_cfg["VERSION"]:
            trainval = {"train": set(train_scenes), "val": val_scenes}
        else:
            toks = train_scenes if train_scenes else val_scenes
            trainval = {"train": set(toks), "val": toks}
        path = self.root_path / f"{self._prefix}_trainval_split.pkl"
        path.parent.mkdir(parents=True, exist_ok=True)
        with open(path, "wb") as f:
            pickle.dump(trainval, f)
        return trainval

    def _load_trainval_split(self):
        path = self.root_path / f"{self._prefix}_trainval_split.pkl"
        if not path.exists():
            return self._build_train_val_split()
        with open(path, "rb") as f:
            return pickle.load(f)

    def _info_of_lidar_token(self, sample, lidar_token, threshold_boxes_by_points):
        """One info row (reference rsu :124-147 / car :85-109), built through
        the source abstraction (frame accessors match the reference
        get_points_and_boxes_of_1lidar)."""
        nusc = self.source.nusc
        frame = self.source.get_frame(
            lidar_token,
            classes_of_interest=tuple(self.classes_of_interest),
            threshold_boxes_by_points=threshold_boxes_by_points,
        )
        sd = nusc.get("sample_data", lidar_token)
        return {
            "token": sample["token"],
            "lidar_token": lidar_token,
            "glob_se3_lidar": frame["glob_se3_lidar"],
            "gt_boxes": frame["boxes"],
            "gt_names": frame["names"],
            "num_points_in_boxes": frame["num_points_in_boxes"],
            "lidar_path": nusc.get_sample_data_path(lidar_token),
            "timestamp": sd["timestamp"],
        }

    def build_v2x_sim_info(self):
        """Write {prefix}_v2x_sim_infos_{N}sweeps_{train,val}.pkl (reference
        v2x_sim_dataset_rsu.py:110-164). Requires a real/mocked devkit."""
        assert not self.synthetic, "info building needs a (possibly mocked) V2X-Sim DB"
        trainval = self._load_trainval_split()
        nusc = self.source.nusc
        lidar_name = "LIDAR_TOP_id_0"
        train_infos, val_infos = [], []
        for sample in nusc.sample:
            if lidar_name not in sample["data"]:
                continue
            info = self._info_of_lidar_token(
                sample, sample["data"][lidar_name],
                self.dataset_cfg.get("THRESHOLD_BOXES_BY_POINTS", 5))
            if sample["scene_token"] in trainval["train"]:
                train_infos.append(info)
            else:
                val_infos.append(info)
        for split, infos in (("train", train_infos), ("val", val_infos)):
            if not infos:
                continue
            p = self.root_path / (
                f"{self._prefix}_v2x_sim_infos_{self.num_historical_sweeps}sweeps_{split}.pkl")
            with open(p, "wb") as f:
                pickle.dump(infos, f)
            if self.logger is not None:
                self.logger.info(f"v2x-sim infos {split}: {len(infos)} -> {p}")
        return train_infos, val_infos

    def __len__(self):
        if self._merge_all_iters_to_one_epoch:
            return len(self.infos) * self.total_epochs
        return len(self.infos)

    # --------------------------------------------------------------- getitem
    def __getitem__(self, index):
        if self._merge_all_iters_to_one_epoch:
            index = index % len(self.infos)
        info = copy.deepcopy(self.infos[index])

        stuff = get_pseudo_sweeps_of_1lidar(
            self.source,
            info["lidar_token"],
            self.num_historical_sweeps,
            self.classes_of_interest,
            points_in_boxes_by_gpu=self.dataset_cfg.get("POINTS_IN_BOXES_GPU", False),
            threshold_boxes_by_points=self.threshold_boxes_by_points,
        )

        input_dict = {
            "points": stuff["points"],
            "gt_boxes": stuff["gt_boxes"],
            "gt_names": stuff["gt_names"],
            "instances_tf": stuff["instances_tf"],
            "frame_id": Path(info["lidar_path"]).stem,
            "metadata": {
                "lidar_token": info["lidar_token"],
                "num_sweeps_target": self.num_sweeps,
                "sample_token": info["token"],
                "lidar_id": info.get("lidar_id", 0),
            },
        }
        return self.prepare_data(data_dict=input_dict)

    # ------------------------------------------------------------ prediction
    def generate_prediction_dicts(self, batch_dict, final_box_dicts, class_names, output_path=None):
        """Convert fixed-shape device outputs to per-sample numpy annos
        (counterpart of dataset.py:60-107)."""
        annos = []
        boxes = np.asarray(final_box_dicts["pred_boxes"])
        scores = np.asarray(final_box_dicts["pred_scores"])
        labels = np.asarray(final_box_dicts["pred_labels"])
        valid = np.asarray(final_box_dicts["pred_valid"])
        for i in range(boxes.shape[0]):
            v = valid[i]
            lab = labels[i][v].astype(np.int64)
            anno = {
                "boxes_lidar": boxes[i][v],
                "score": scores[i][v],
                "pred_labels": lab,
                "name": np.array([class_names[j - 1] for j in lab]),
                "metadata": batch_dict["metadata"][i],
            }
            annos.append(anno)
        return annos

    # ------------------------------------------------------------ evaluation
    def evaluation(self, det_annos, class_names, **kwargs):
        if kwargs.get("eval_metric", "nuscenes") != "nuscenes":
            raise NotImplementedError
        from ..eval.detection_metrics import nuscenes_protocol_eval

        gt_by_token = {}
        for info in self.infos:
            if "gt_boxes" in info:
                gt_by_token[info["lidar_token"]] = {
                    "boxes": np.asarray(info["gt_boxes"])[:, :7],
                    "names": np.asarray(info["gt_names"]),
                    "velocities": None,
                }
            else:
                frame = self.source.get_frame(
                    info["lidar_token"],
                    classes_of_interest=tuple(self.classes_of_interest),
                    threshold_boxes_by_points=self.threshold_boxes_by_points,
                )
                gt_by_token[info["lidar_token"]] = {
                    "boxes": frame["boxes"],
                    "names": frame["names"],
                    "velocities": (frame["boxes"][:, :2] - frame["prev_boxes"][:, :2]) / 0.2,
                }
        return nuscenes_protocol_eval(
            det_annos, gt_by_token, class_names, output_path=kwargs.get("output_path")
        )
