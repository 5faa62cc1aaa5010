"""V2X-Sim ego dataset — the "lately fusion" data path.

Capability match for /root/reference/pcdet/datasets/v2x_sim/v2x_sim_dataset_ego.py:
  * ego (lidar id 1) pseudo-sweeps;
  * merged ground truth from every agent, deduplicated with rotated NMS and
    cached to ``{mode}_gt_from_all_range60.pkl`` (:42-66, :90-137);
  * MoDAR + foreground exchange read from the exchange database of each other
    agent at the previous keyframe (async) or current (EXCHANGE_NOW);
  * async compensation: MoDAR positions advanced by 2x the mean scene flow of
    the foreground points pooled per box (constant-velocity, :196-232) — done
    in numpy on the host (the reference runs CUDA inside the dataloader);
  * 13-feature point assembly: x,y,z,intensity,time | dx,dy,dz,heading,score,
    label | sweep_idx, inst_idx (:161-164).
"""
import copy
import hashlib
import pickle
from pathlib import Path

import numpy as np

from ...exchange.database import ExchangeDatabase
from ...utils.geometry import se3_inverse, apply_se3
from .source import NUM_AGENTS, _points_in_boxes_np
from .v2x_sim_dataset_car import V2XSimDataset_CAR
from .v2x_sim_utils import get_pseudo_sweeps_of_1lidar

EGO_LIDAR_ID = 1


def _nms_dedup_host(boxes, thresh=0.2):
    """Greedy rotated-BEV NMS on host (all scores equal -> keeps first of each
    overlapping cluster), mirroring the GT dedup (:128-137). Pure numpy: GT
    dedup runs at dataset-init time with variable box counts, which would
    force a device recompile per shape."""
    from ...utils.nms_np import nms_bev_np

    n = boxes.shape[0]
    if n == 0:
        return np.zeros((0,), dtype=np.int64)
    return nms_bev_np(boxes[:, :7], np.ones(n), thresh)


class V2XSimDataset_EGO(V2XSimDataset_CAR):
    LIDAR_IDS = (EGO_LIDAR_ID,)

    def __init__(self, dataset_cfg, class_names, training=True, root_path=None, logger=None, source=None):
        super().__init__(dataset_cfg, class_names, training, root_path, logger, source)
        self.exchange_now = bool(dataset_cfg.get("EXCHANGE_NOW", False))
        # async-compensation ablation: with False, stale MoDAR boxes are used
        # as-is (no constant-velocity advance from the exchanged scene flow)
        self.flow_propagation = bool(dataset_cfg.get("EXCHANGE_FLOW_PROPAGATION", True))
        exch_dir = dataset_cfg.get("EXCHANGE_DATABASE_DIRECTORY", "exchange_database_flow")
        self.exchange_database = {
            lid: ExchangeDatabase(self.root_path / exch_dir) for lid in range(NUM_AGENTS)
        }
        self.exchange_with_rsu_only = bool(dataset_cfg.get("EXCHANGE_WITH_RSU_ONLY", False))
        # ablation levers (no reference counterpart; used to decompose the
        # lately-vs-early gap and the async degradation, README results):
        #   EXCHANGE_ORACLE      — senders broadcast their GT boxes (score 1,
        #                          exact constant-velocity flow): upper-bounds
        #                          lately fusion given perfect sender detectors
        #   EXCHANGE_ORACLE_FLOW — predicted boxes keep their scores but the
        #                          pooled flow is replaced by the matched GT
        #                          velocity: isolates flow-prediction error
        #                          from box/matching error in the async rows
        #   EXCHANGE_DROPOUT     — p(drop each agent's broadcast). Applies in
        #                          training (robustness to missing agents) and,
        #                          at eval, simulates lossy broadcast: how
        #                          gracefully the trained ego degrades when a
        #                          fraction of agent messages never arrives.
        #                          Eval draws are deterministic per (sample,
        #                          agent) so repeated evals are reproducible.
        self.exchange_oracle = bool(dataset_cfg.get("EXCHANGE_ORACLE", False))
        self.exchange_oracle_flow = bool(dataset_cfg.get("EXCHANGE_ORACLE_FLOW", False))
        self.exchange_dropout = float(dataset_cfg.get("EXCHANGE_DROPOUT", 0.0))
        self._exchange_rng = np.random.default_rng(12345)
        self._exchange_misses = 0

        if dataset_cfg.get("USE_GT_FROM_EVERY_AGENT", True):
            rng_limit = float(dataset_cfg.get("EVAL_FILTER_GT_BEYOND_RANGE", -1))
            cache = self.root_path / f"{self.mode}_gt_from_all_range60.pkl"
            if self.synthetic:
                cache = Path("/nonexistent")  # synthetic GT is cheap; don't cache
            if cache.exists():
                with open(cache, "rb") as f:
                    self.infos = pickle.load(f)
            else:
                for idx, info in enumerate(self.infos):
                    gt_boxes, gt_names = self.get_all_ground_truth(info["lidar_token"])
                    if rng_limit > 0:
                        kept = np.linalg.norm(gt_boxes[:, :2], axis=1) < rng_limit
                        if np.any(kept):
                            gt_boxes, gt_names = gt_boxes[kept], gt_names[kept]
                        else:
                            gt_boxes = np.zeros((1, gt_boxes.shape[1]))
                            gt_names = gt_names[[0]] if gt_names.shape[0] else np.array(["car"])
                    self.infos[idx]["gt_boxes"] = gt_boxes
                    self.infos[idx]["gt_names"] = gt_names
                if not self.synthetic:
                    try:
                        cache.parent.mkdir(parents=True, exist_ok=True)
                        with open(cache, "wb") as f:
                            pickle.dump(self.infos, f)
                    except OSError:
                        pass

    def get_all_ground_truth(self, ego_lidar_token):
        """GT from every agent mapped into the ego frame, NMS-deduplicated."""
        sample_token = "_".join(ego_lidar_token.split("_")[:-1]) if self.synthetic else None
        if self.synthetic:
            sample = self.source.sample_record(sample_token)
        else:
            sd = self.source.nusc.get("sample_data", ego_lidar_token)
            sample = self.source.nusc.get("sample", sd["sample_token"])

        ego_se3_glob = se3_inverse(self.source.get_pose(ego_lidar_token))

        gt_boxes, gt_names = [], []
        for lidar_name, lidar_token in sample["data"].items():
            if not lidar_name.startswith("LIDAR_TOP_id_"):
                continue
            frame = self.source.get_frame(
                lidar_token,
                classes_of_interest=tuple(self.classes_of_interest),
                threshold_boxes_by_points=1,
            )
            boxes = frame["boxes"].copy()
            if boxes.shape[0] == 0:
                continue
            ego_se3_lidar = ego_se3_glob @ frame["glob_se3_lidar"]
            boxes = apply_se3(ego_se3_lidar, boxes=boxes)
            gt_boxes.append(boxes)
            gt_names.append(frame["names"])

        if not gt_boxes:
            return np.zeros((0, 7)), np.zeros((0,), dtype="<U16")
        gt_boxes = np.concatenate(gt_boxes)
        gt_names = np.concatenate(gt_names)
        selected = _nms_dedup_host(gt_boxes)
        return gt_boxes[selected], gt_names[selected]

    # --------------------------------------------------------------- getitem
    def _exchange_agent_ids(self):
        ids = [0] if self.exchange_with_rsu_only else [i for i in range(NUM_AGENTS)]
        return [i for i in ids if i != EGO_LIDAR_ID]

    def _oracle_boxflow(self, lidar_token):
        """(N, 12) boxflow rows from the sender's GT at that keyframe: box7,
        score=1, 1-based label, exact half-keyframe constant-velocity flow
        (the x2.0 propagation then advances boxes by exactly v * KEYFRAME_DT)."""
        frame = self.source.get_frame(
            lidar_token,
            classes_of_interest=tuple(self.class_names),
            threshold_boxes_by_points=1,
        )
        boxes = frame["boxes"]
        n = boxes.shape[0]
        out = np.zeros((n, 12))
        if n:
            out[:, :7] = boxes[:, :7]
            out[:, 7] = 1.0
            name_to_label = {name: i + 1 for i, name in enumerate(self.class_names)}
            out[:, 8] = [name_to_label.get(nm, 1) for nm in frame["names"]]
            out[:, 9:12] = (boxes[:, :3] - frame["prev_boxes"][:, :3]) / 2.0
        return out

    def _load_and_propagate_modar(self, sample_token, lidar_id, propagate=True,
                                  lidar_token=None):
        if self.exchange_oracle and lidar_token is not None:
            boxflow = self._oracle_boxflow(lidar_token)
            modar = boxflow[:, :9].copy()
            if propagate and modar.shape[0]:
                modar[:, :3] += boxflow[:, 9:12] * 2.0
            return modar, 0
        if self.exchange_oracle_flow and lidar_token is not None:
            modar = self._predicted_modar_with_oracle_flow(
                sample_token, lidar_id, lidar_token, propagate)
            return modar, 0
        return self._load_and_propagate_modar_pred(sample_token, lidar_id, propagate)

    def _predicted_modar_with_oracle_flow(self, sample_token, lidar_id, lidar_token,
                                          propagate):
        """Predicted boxes, GT flow: each modar box takes the constant-velocity
        flow of the nearest GT center within 2 m (else stays put)."""
        db = self.exchange_database[lidar_id]
        modar = db.load_boxflow(sample_token, lidar_id)
        modar = modar[:, :9].copy() if modar is not None else db.load_modar(sample_token, lidar_id)
        if modar is None:
            return None
        modar = np.asarray(modar)[:, :9].copy()
        if propagate and modar.shape[0]:
            gt = self._oracle_boxflow(lidar_token)
            if gt.shape[0]:
                d = np.linalg.norm(
                    modar[:, None, :2] - gt[None, :, :2], axis=-1)  # (M, G)
                j = d.argmin(axis=1)
                matched = d[np.arange(modar.shape[0]), j] < 2.0
                modar[matched, :3] += gt[j[matched], 9:12] * 2.0
        return modar

    def _load_and_propagate_modar_pred(self, sample_token, lidar_id, propagate=True):
        """MoDAR boxes + scene-flow propagation (:196-215).

        Prefers the ``boxflow`` wire format (12 floats/box: the sender pools
        its foreground flow per box — identical propagation math at
        late-fusion bandwidth); falls back to receiver-side pooling over the
        full foreground broadcast for legacy databases.

        Returns ``(modar (N, 9), n_foreground_broadcast)`` — the foreground
        count feeds the bandwidth measurement (0 under boxflow; the broadcast
        is then modar rows x 12 floats, workspace/measure_exchange_size.py)."""
        db = self.exchange_database[lidar_id]
        boxflow = db.load_boxflow(sample_token, lidar_id)
        if boxflow is not None:
            modar = boxflow[:, :9].copy()
            if propagate and modar.shape[0]:
                # one-step constant-velocity: keyframe dt is half the flow
                # horizon, hence the x2.0 (ref v2x_sim_dataset_ego.py:196-215)
                modar[:, :3] += boxflow[:, 9:12] * 2.0
            return modar, 0
        modar = db.load_modar(sample_token, lidar_id)
        if modar is None:
            # a missing exchange file means that agent broadcast nothing for
            # this keyframe — legitimate for the first async frame, but a
            # SYSTEMATIC miss means the exchange DB was never generated for
            # this split (the ego would silently train without MoDAR)
            self._exchange_misses += 1
            if self._exchange_misses == 50 and self.logger is not None:
                self.logger.warning(
                    "exchange database: 50 modar files missing so far "
                    f"(e.g. token={sample_token} id={lidar_id}) — was the "
                    "exchange DB generated for this split?"
                )
            return None, 0
        modar = modar.copy()
        n_fg = 0
        if propagate:
            foregr = db.load_foreground(sample_token, lidar_id)
            if foregr is not None and foregr.shape[0] > 0 and modar.shape[0] > 0:
                n_fg = int(foregr.shape[0])
                box_idx = _points_in_boxes_np(foregr[:, :3], modar[:, :7])
                valid = box_idx > -1
                if valid.any():
                    fg, bi = foregr[valid], box_idx[valid]
                    for b in np.unique(bi):
                        offset = fg[bi == b, -3:].mean(axis=0) * 2.0
                        modar[b, :3] += offset
        return modar, n_fg

    def __getitem__(self, index):
        if self._merge_all_iters_to_one_epoch:
            index = index % len(self.infos)
        info = copy.deepcopy(self.infos[index])

        ego_stuff = get_pseudo_sweeps_of_1lidar(
            self.source,
            info["lidar_token"],
            self.num_historical_sweeps,
            self.classes_of_interest,
            points_in_boxes_by_gpu=self.dataset_cfg.get("POINTS_IN_BOXES_GPU", False),
            threshold_boxes_by_points=self.dataset_cfg.get("THRESHOLD_BOXES_BY_POINTS", 5),
        )
        points = ego_stuff["points"]  # (N, 7)
        gt_boxes = info.get("gt_boxes", ego_stuff["gt_boxes"])
        gt_names = info.get("gt_names", ego_stuff["gt_names"])

        # 13-feature layout: point-5 | box-6 (dx,dy,dz,heading,score,label) | sweep, inst
        points_ = np.zeros((points.shape[0], 5 + 6 + 2))
        points_[:, :5] = points[:, :5]
        points_[:, -2:] = points[:, -2:]
        num_original = points_.shape[0]

        target_se3_glob = se3_inverse(self.source.get_pose(info["lidar_token"]))
        max_sweep_idx = points[:, -2].max() if points.shape[0] else 0.0

        sample_token = info["token"]
        sample = self.source.sample_record(sample_token)
        exchange_metadata = {i: [0.0, 0.0] for i in range(NUM_AGENTS) if i != EGO_LIDAR_ID}
        exchange_coord = {i: np.zeros(3) for i in range(NUM_AGENTS) if i != EGO_LIDAR_ID}

        use_prev = sample["prev"] != "" and not self.exchange_now
        exch_sample = self.source.sample_record(sample["prev"]) if use_prev else sample
        do_exchange = use_prev or self.exchange_now

        if do_exchange and self.dataset_cfg.get("EXCHANGE_MODAR", True):
            exch_token = exch_sample["token"]
            for lidar_name, lidar_token in exch_sample["data"].items():
                if not lidar_name.startswith("LIDAR_TOP_id_"):
                    continue
                lidar_id = int(lidar_name.split("_")[-1])
                if lidar_id == EGO_LIDAR_ID or lidar_id not in self._exchange_agent_ids():
                    continue
                if self.exchange_dropout > 0.0:
                    if self.training:
                        drop = self._exchange_rng.random() < self.exchange_dropout
                    else:
                        # eval: deterministic per (sample, agent) so the lossy-
                        # broadcast measurement is reproducible run-to-run
                        h = hashlib.blake2b(
                            f"{exch_token}/{lidar_id}".encode(), digest_size=8
                        ).digest()
                        drop = int.from_bytes(h, "little") / 2.0**64 < self.exchange_dropout
                    if drop:
                        continue
                modar, n_fg = self._load_and_propagate_modar(
                    exch_token, lidar_id, propagate=use_prev and self.flow_propagation,
                    lidar_token=lidar_token,
                )
                if modar is None or modar.shape[0] == 0:
                    continue
                exchange_metadata[lidar_id][0] = float(n_fg)
                target_se3_lidar = target_se3_glob @ self.source.get_pose(lidar_token)
                modar[:, :7] = apply_se3(target_se3_lidar, boxes=modar[:, :7])

                modar_ = np.zeros((modar.shape[0], points_.shape[1]))
                modar_[:, :3] = modar[:, :3]
                modar_[:, 4] = 0.0
                modar_[:, 5:11] = modar[:, 3:]
                modar_[:, -2] = max_sweep_idx
                modar_[:, -1] = -1
                exchange_metadata[lidar_id][1] = modar_.shape[0]
                exchange_coord[lidar_id] = target_se3_lidar[:3, 3]
                points_ = np.concatenate([points_, modar_])

        input_dict = {
            "points": points_,
            "gt_boxes": np.asarray(gt_boxes, dtype=np.float64)[:, :7],
            "gt_names": np.asarray(gt_names),
            "frame_id": Path(info["lidar_path"]).stem,
            "metadata": {
                "lidar_token": info["lidar_token"],
                "num_sweeps_target": self.num_sweeps,
                "sample_token": sample_token,
                "lidar_id": EGO_LIDAR_ID,
                "num_original": num_original,
                "exchange": exchange_metadata,
                "exchange_coord": exchange_coord,
            },
        }
        return self.prepare_data(data_dict=input_dict)
