"""MPPNet temporal ROI head (flax).

Behavioral counterpart of
/root/reference/pcdet/models/roi_heads/mppnet_head.py: multi-frame proposal
trajectories (velocity-propagated + IoU-matched, :635-659), per-frame in-box
point cropping at fixed capacity (:470-549), proposal-aware geometry and
motion features in spherical coordinates around box corners (:551-606),
proxy-point grid pooling (:403-442), the grouped transformer with per-group
tokens, the sequence-box PointNet auxiliary branch (:608-633), and the
deep-supervised cls/reg losses (:801-959).

TPU re-design notes:
  * all shapes fixed: R rois per sample, T frames, L=num_lidar_points per
    frame, P=G^3 proxy points per frame; ragged crops become top-K gathers
    with validity masking (zero rows), matching the reference's zero-filled
    buffers;
  * the per-sample python loops (crop, trajectory match) are vmapped;
  * the ProposalTargetLayerMPPNet subsampling reuses the vectorized
    fixed-shape sampler from roi_head_template (the reference's
    aug_roi_by_noise_torch roi-jitter augmentation is not applied — a
    documented training-time deviation);
  * proxy-grid pooling runs the dense PointnetSAModuleMSG with the (ROI,
    frame) pair as the batch axis instead of spconv's stacked layout.

Inputs (from the dataset / first stage): ``roi_boxes`` (B, T, R, 9)
[x y z dx dy dz heading vx vy] per-frame proposals (frame 0 = current),
``roi_scores`` (B, T, R), ``roi_labels`` (B, R), and ``points`` (B, N, 5)
[x y z intensity time] where time = frame_idx * 0.1.
"""
import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...ops.rotated_iou import boxes_iou3d
from ..backbones_3d.pointnet2_modules import PointnetSAModuleMSG
from ..model_utils.mppnet_utils import (FFN, MLP, MPPTransformer, SeqBoxPointNet)
from .roi_head_template import (RoIHeadTemplate, sample_rois_for_rcnn,
                                rotate_points_along_z_jnp)


def get_corner_points(rois):
    """(..., 7+) rois -> (..., 8, 3) global corners (reference :392-401)."""
    idx = np.stack(np.meshgrid([0.0, 1.0], [0.0, 1.0], [0.0, 1.0], indexing="ij"),
                   axis=-1).reshape(8, 3).astype(np.float32)
    local = jnp.asarray(idx) * rois[..., None, 3:6] - rois[..., None, 3:6] / 2
    flat = local.reshape(-1, 8, 3)
    ry = jnp.broadcast_to(rois[..., 6], rois[..., 6].shape).reshape(-1)
    rotated = rotate_points_along_z_jnp(flat, ry).reshape(local.shape)
    return rotated + rois[..., None, 0:3]


def get_proxy_points(rois, grid_size):
    """(..., 7+) rois -> global (..., G^3, 3) grid points (reference :381-390)."""
    g = grid_size
    idx = np.stack(np.meshgrid(*[np.arange(g)] * 3, indexing="ij"),
                   axis=-1).reshape(-1, 3).astype(np.float32)
    local = (jnp.asarray(idx) + 0.5) / g * rois[..., None, 3:6] - rois[..., None, 3:6] / 2
    flat = local.reshape(-1, g ** 3, 3)
    ry = rois[..., 6].reshape(-1)
    rotated = rotate_points_along_z_jnp(flat, ry).reshape(local.shape)
    return rotated + rois[..., None, 0:3]


def spherical_coordinate(src, diag_dist):
    """(..., 27) corner offsets -> (dis, phi, the) x9 (reference :454-468)."""
    x = src[..., 0::3]
    y = src[..., 1::3]
    z = src[..., 2::3]
    dis = jnp.sqrt(x ** 2 + y ** 2 + z ** 2)
    phi = jnp.arctan(y / (x + 1e-5))
    the = jnp.arccos(jnp.clip(z / (dis + 1e-5), -1.0 + 1e-6, 1.0 - 1e-6))
    return jnp.concatenate([dis / (diag_dist + 1e-5), phi, the], axis=-1)


def generate_trajectory(proposals, num_frames):
    """Velocity-propagate + IoU-match proposals across frames (ref :635-659).

    proposals (B, T, R, 9). Returns (traj (B, T, R, 9), valid (B, T, R))."""

    def one_sample(props):
        traj0 = props[0]
        trajs = [traj0]
        valids = [jnp.ones(traj0.shape[0], bool)]
        prev = traj0
        for i in range(1, num_frames):
            pred = prev.at[:, 0:2].add(prev[:, 7:9])
            iou = boxes_iou3d(pred[:, :7], props[i][:, :7])
            best = jnp.argmax(iou, axis=1)
            ok = jnp.max(iou, axis=1) >= 0.5
            matched = jnp.where(ok[:, None], props[i][best], pred)
            trajs.append(matched)
            valids.append(ok)
            prev = matched
        return jnp.stack(trajs), jnp.stack(valids)

    return jax.vmap(one_sample)(proposals)


def crop_frame_points(points, traj, num_lidar_points):
    """Fixed-capacity cylinder crop per (frame, roi) (reference :470-549).

    points (B, N, 5) with time channel; traj (B, T, R, 9).
    Returns src (B, R, T*L, 5) with invalid rows zeroed."""
    num_frames = traj.shape[1]

    def one(points_b, traj_b):
        outs = []
        for t in range(num_frames):
            boxes = traj_b[t]  # (R, 9)
            radii = jnp.sqrt((boxes[:, 3] / 2) ** 2 + (boxes[:, 4] / 2) ** 2) * 1.1
            time_ok = jnp.abs(points_b[:, -1] - t * 0.1) < 1e-3
            dis = jnp.linalg.norm(
                points_b[None, :, :2] - boxes[:, None, :2], axis=-1)
            mask = (dis <= radii[:, None]) & time_ok[None, :]
            take = min(num_lidar_points, mask.shape[1])
            _, idx = jax.lax.top_k(mask.astype(jnp.float32), take)
            ok = jnp.take_along_axis(mask, idx, axis=1)
            got = points_b[idx] * ok[..., None]
            if take < num_lidar_points:
                pad = num_lidar_points - take
                got = jnp.pad(got, ((0, 0), (0, pad), (0, 0)))
            outs.append(got)
        return jnp.concatenate(outs, axis=1)  # (R, T*L, 5)

    return jax.vmap(one)(points, traj)


class MPPNetHead(RoIHeadTemplate):
    input_channels: int = 0  # unused; proposals come from the dataset

    @nn.compact
    def __call__(self, batch, train=False):
        out = dict(batch)
        cfg = self.model_cfg
        tr_cfg = cfg["Transformer"]
        num_frames = int(tr_cfg["num_frames"])
        num_groups = int(tr_cfg["num_groups"])
        num_lidar_points = int(tr_cfg["num_lidar_points"])
        grid_size = int(cfg["ROI_GRID_POOL"]["GRID_SIZE"])
        num_proxy = grid_size ** 3
        hidden = int(cfg["TRANS_INPUT"])
        assert num_groups == num_frames, "one group per frame (num_frames<=4 path)"

        proposals = out["roi_boxes"]  # (B, T, R, 9)
        b, t, r = proposals.shape[:3]
        roi_scores = out["roi_scores"][:, 0]  # current-frame scores (B, R)
        roi_labels = out.get("roi_labels")
        if roi_labels is None:
            roi_labels = jnp.ones((b, r), jnp.int32)
        elif roi_labels.ndim == 3:
            roi_labels = roi_labels[:, 0].astype(jnp.int32)

        traj, valid_length = generate_trajectory(proposals, num_frames)

        targets = None
        if train:
            key = (self.make_rng("sampling") if self.has_rng("sampling")
                   else jax.random.PRNGKey(0))
            sampler_cfg = cfg["TARGET_CONFIG"]
            keys = jax.random.split(key, b)
            targets = jax.vmap(
                lambda k, rois_, sc, lb, gt, tr_, vl: _sample_with_traj(
                    k, rois_, sc, lb, gt, tr_, vl, sampler_cfg)
            )(keys, traj[:, 0], roi_scores, roi_labels, out["gt_boxes"],
              traj, valid_length)
            targets = _finish_targets(targets, sampler_cfg)
            rois9 = targets["trajectory_rois"][:, 0]
            traj = targets["trajectory_rois"]
            valid_length = targets["valid_length"]
            roi_scores = targets["roi_scores"]
            roi_labels = targets["roi_labels"]
            r = rois9.shape[1]
        else:
            rois9 = traj[:, 0]

        rois = rois9[..., :7]
        # ---- point cropping over all frames
        src = crop_frame_points(out["points"][..., :5], traj, num_lidar_points)
        src = src * (valid_length.transpose(0, 2, 1)[..., None]
                     .repeat(num_lidar_points, axis=2)
                     .reshape(b, r, num_frames * num_lidar_points, 1))
        src = src.reshape(b * r, num_frames * num_lidar_points, -1)

        # ---- proposal-aware geometry feature (ref :551-575)
        geo_parts = []
        for i in range(num_frames):
            frame_rois = traj[:, i].reshape(b * r, -1)
            corners = get_corner_points(frame_rois[:, :7]).reshape(b * r, 24)
            anchor = jnp.concatenate([corners, frame_rois[:, :3]], axis=-1)  # 27
            pts = src[:, i * num_lidar_points:(i + 1) * num_lidar_points, :3]
            offsets = jnp.tile(pts, (1, 1, 9)) - anchor[:, None, :]
            lwh = frame_rois[:, 3:6]
            diag = jnp.linalg.norm(lwh, axis=-1)[:, None, None]
            geo_parts.append(spherical_coordinate(offsets, diag))
        geo = jnp.concatenate(geo_parts, axis=1)
        geo = jnp.concatenate([geo, src[..., 3:]], axis=-1)  # + intensity, time
        geo = MLP(64, hidden, 3, name="up_dimension_geometry")(geo)

        # ---- proxy-grid pooling (ref :403-442): SA per (roi, frame)
        proxy_global = get_proxy_points(
            traj.transpose(0, 2, 1, 3)[..., :7], grid_size)  # (B, R, T, P, 3)
        src_pts = src.reshape(b * r, num_frames, num_lidar_points, -1)
        sa_xyz = src_pts[..., :3].reshape(b * r * num_frames, num_lidar_points, 3)
        sa_feat = geo.reshape(b * r, num_frames, num_lidar_points, -1)
        sa_feat = sa_feat.reshape(b * r * num_frames, num_lidar_points, hidden)
        sa_mask = jnp.any(sa_xyz != 0, axis=-1)
        new_xyz = proxy_global.reshape(b * r * num_frames, num_proxy, 3)
        pool_cfg = cfg["ROI_GRID_POOL"]
        sa = PointnetSAModuleMSG(
            npoint=num_proxy,
            radii=[float(x) for x in pool_cfg["POOL_RADIUS"]],
            nsamples=[int(x) for x in pool_cfg["NSAMPLE"]],
            mlps=[list(m) for m in pool_cfg["MLPS"]],
            use_xyz=True, name="roi_grid_pool")
        _, proxy_feat, _ = sa(sa_xyz, sa_feat, mask=sa_mask, new_xyz=new_xyz,
                              train=train)
        proxy_feat = proxy_feat.reshape(b * r, num_frames * num_proxy, -1)
        proxy_xyz = new_xyz.reshape(b * r, num_frames * num_proxy, 3)

        # ---- proposal-aware motion feature around the current frame (ref :577-606)
        cur_rois = traj[:, 0].reshape(b * r, -1)
        corners0 = get_corner_points(cur_rois[:, :7]).reshape(b * r, 24)
        anchor0 = jnp.concatenate([corners0, cur_rois[:, :3]], axis=-1)
        offsets = jnp.tile(proxy_xyz, (1, 1, 9)) - anchor0[:, None, :]
        diag0 = jnp.linalg.norm(cur_rois[:, 3:6], axis=-1)[:, None, None]
        motion = spherical_coordinate(offsets, diag0)
        times = jnp.concatenate(
            [jnp.full((1, num_proxy), i * 0.1) for i in range(num_frames)], axis=1)
        time_pad = jnp.concatenate(
            [jnp.zeros((b * r, num_frames * num_proxy, 2)),
             jnp.broadcast_to(times[..., None], (b * r, num_frames * num_proxy, 1))],
            axis=-1)
        motion = jnp.concatenate([motion, time_pad], axis=-1)
        motion = MLP(64, hidden, 3, name="up_dimension_motion")(motion)

        feat = proxy_feat + motion

        # ---- sequence-box auxiliary branch (ref :608-633)
        time_stamp = jnp.broadcast_to(
            (jnp.arange(num_frames) * 0.1)[None, :, None, None], (b, num_frames, r, 1))
        box_seq = jnp.concatenate([traj[..., :7], time_stamp], axis=-1)
        box_seq = box_seq.at[..., 0:3].set(box_seq[..., 0:3] - box_seq[:, 0:1, :, 0:3])
        ry0 = box_seq[:, 0, :, 6] % (2 * np.pi)  # (B, R)
        flat_seq = box_seq.transpose(0, 2, 1, 3).reshape(b * r, num_frames, 8)
        rot_xyz = rotate_points_along_z_jnp(flat_seq[..., :3], -ry0.reshape(-1))
        flat_seq = jnp.concatenate([rot_xyz, flat_seq[..., 3:]], axis=-1)
        flat_seq = flat_seq.at[..., 6].set(0.0)
        box_reg, feat_box = SeqBoxPointNet(channels=hidden, name="seqboxembed")(
            flat_seq, train=train)

        if bool(cfg.get("USE_TRAJ_EMPTY_MASK", False)):
            empty = jnp.sum(jnp.abs(rois[..., :6]), axis=-1) == 0
            feat = feat * (~empty.reshape(-1))[:, None, None]

        # ---- grouped transformer
        hs, tokens = MPPTransformer(
            d_model=hidden, nhead=int(tr_cfg["nheads"]),
            num_layers=int(tr_cfg["enc_layers"]),
            dim_feedforward=int(tr_cfg["dim_feedforward"]),
            num_groups=num_groups, num_proxy_points=num_proxy,
            grid_size=int(tr_cfg.get("use_mlp_mixer", {}).get("grid_size", grid_size)),
            mixer_hidden=int(tr_cfg.get("use_mlp_mixer", {}).get("hidden_dim", 16)),
            name="transformer")(feat, deterministic=not train)

        num_enc = int(tr_cfg["enc_layers"])
        code_size = self.box_coder.code_size
        # deep supervision: per-layer group-0 token cls (shared head); one reg
        # head per group applied to every layer's token (reference :333-345)
        cls_embed = nn.Dense(1, name="class_embed")
        point_cls = jnp.concatenate(
            [cls_embed(tokens[i, 0]) for i in range(num_enc)], 0)
        point_reg_list = []
        for gi in range(num_groups):
            embed = MLP(hidden, code_size * self.num_class, 4, name=f"bbox_embed_{gi}")
            for li in range(num_enc):
                point_reg_list.append(embed(tokens[li, gi]))
        point_reg = jnp.concatenate(point_reg_list, 0)

        joint = jnp.concatenate(
            [hs.transpose(1, 0, 2).reshape(b * r, -1), feat_box], axis=-1)
        joint_reg = MLP(int(tr_cfg["hidden_dim"]), code_size * self.num_class, 4,
                        name="jointembed")(joint)

        rcnn_cls = point_cls
        rcnn_reg = joint_reg

        if train:
            fwd = {k: targets[k] for k in
                   ("rois", "gt_of_rois", "gt_of_rois_src", "reg_valid_mask",
                    "rcnn_cls_labels")}
            fwd["rcnn_cls"] = rcnn_cls
            fwd["rcnn_reg"] = rcnn_reg
            loss, tb = self._mppnet_loss(fwd, point_reg, box_reg, num_enc, num_groups)
            out["roi_head_loss"] = loss
            out["roi_head_tb"] = tb
        else:
            cls_last = rcnn_cls[-(b * r):]
            batch_cls, batch_box = self.generate_predicted_boxes(
                rois.reshape(b, r, -1), cls_last.reshape(b, r, -1),
                rcnn_reg.reshape(b, r, -1))
            if bool(cfg.get("AVG_STAGE1_SCORE", False)):
                batch_cls = jnp.sqrt(jax.nn.sigmoid(batch_cls)
                                     * jnp.clip(roi_scores[..., None], 0.0, 1.0))
                out["cls_preds_normalized"] = True
            out["batch_box_preds"] = batch_box
            out["batch_cls_preds"] = batch_cls
            out["batch_pred_valid"] = jnp.sum(jnp.abs(rois[..., :6]), axis=-1) > 0
            out["roi_labels"] = roi_labels
            out["has_class_labels"] = True
        return out

    def _mppnet_loss(self, fwd, point_reg, box_reg, num_enc, num_groups):
        """Deep-supervised cls (per encoder layer) + joint/point/seqbox reg
        (reference get_box_cls_layer_loss / get_box_reg_layer_loss)."""
        from ..loss_fnc.anchor_losses import weighted_smooth_l1
        from ..loss_fnc.corner_loss import get_corner_loss_lidar

        cfg = self.model_cfg["LOSS_CONFIG"]
        weights = cfg["LOSS_WEIGHTS"]
        coder = self.box_coder
        code_size = coder.code_size

        labels = fwd["rcnn_cls_labels"].reshape(-1)
        n = labels.shape[0]
        valid = (labels >= 0).astype(jnp.float32)
        cls_flat = fwd["rcnn_cls"].reshape(-1)
        groups = cls_flat.shape[0] // n
        cls_loss = 0.0
        for i in range(groups):
            p = jax.nn.sigmoid(cls_flat[i * n:(i + 1) * n])
            eps = 1e-7
            bce = -(labels * jnp.log(jnp.clip(p, eps, 1.0))
                    + (1 - labels) * jnp.log(jnp.clip(1 - p, eps, 1.0)))
            cls_loss = cls_loss + jnp.sum(bce * valid) / jnp.clip(jnp.sum(valid), 1.0)
        cls_loss = cls_loss / groups * float(weights["rcnn_cls_weight"])
        tb = {"rcnn_loss_cls": cls_loss}

        rois = fwd["rois"].reshape(-1, fwd["rois"].shape[-1])[:, :code_size]
        gt_ct = fwd["gt_of_rois"][..., :code_size].reshape(-1, code_size)
        gt_src = fwd["gt_of_rois_src"][..., :code_size].reshape(-1, code_size)
        fg = (fwd["reg_valid_mask"].reshape(-1) > 0).astype(jnp.float32)
        fg_sum = jnp.clip(jnp.sum(fg), 1.0)

        rois_anchor = jnp.concatenate(
            [jnp.zeros_like(rois[:, 0:3]), rois[:, 3:6], jnp.zeros_like(rois[:, 6:7])],
            axis=-1)
        reg_targets = coder.encode(gt_ct, rois_anchor)
        traj_w = [float(w) for w in weights.get("traj_reg_weight", [1.0, 1.0, 1.0])]

        def sl1(pred):
            l1 = weighted_smooth_l1(pred[None], reg_targets[None],
                                    code_weights=weights.get("code_weights"))[0]
            return jnp.sum(l1 * fg[:, None]) / fg_sum

        reg_loss = sl1(fwd["rcnn_reg"].reshape(-1, code_size)) \
            * float(weights["rcnn_reg_weight"]) * traj_w[0]
        tb["rcnn_loss_reg"] = reg_loss

        pr = point_reg.reshape(-1, code_size)
        n_rows = reg_targets.shape[0]
        p_groups = pr.shape[0] // n_rows
        point_loss = 0.0
        for i in range(p_groups):
            point_loss = point_loss + sl1(pr[i * n_rows:(i + 1) * n_rows])
        point_loss = point_loss / p_groups \
            * float(weights["rcnn_reg_weight"]) * traj_w[2]
        tb["point_loss_reg"] = point_loss

        seq_loss = sl1(box_reg.reshape(-1, code_size)) \
            * float(weights["rcnn_reg_weight"]) * traj_w[1]
        tb["seqbox_loss_reg"] = seq_loss
        reg_loss = reg_loss + point_loss + seq_loss

        if bool(cfg.get("CORNER_LOSS_REGULARIZATION", False)):
            decoded = coder.decode(fwd["rcnn_reg"].reshape(-1, code_size), rois_anchor)
            ry = rois[:, 6]
            xyz = rotate_points_along_z_jnp(decoded[:, None, 0:3], ry)[:, 0]
            boxes_global = jnp.concatenate(
                [xyz + rois[:, 0:3], decoded[:, 3:6], decoded[:, 6:7] + ry[:, None]],
                axis=-1)
            corner = get_corner_loss_lidar(boxes_global[:, :7], gt_src[:, :7])
            corner_loss = jnp.sum(corner * fg) / fg_sum \
                * float(weights["rcnn_corner_weight"])
            reg_loss = reg_loss + corner_loss
            tb["rcnn_loss_corner"] = corner_loss

        total = cls_loss + reg_loss
        tb["rcnn_loss"] = total
        return total, tb


def _sample_with_traj(key, rois9, roi_scores, roi_labels, gt_boxes, traj, valid,
                      sampler_cfg):
    """Single-sample ProposalTargetLayerMPPNet: the vectorized subsampler plus
    trajectory/valid_length gathering by the same slot indices (ref :74-177)."""
    t = sample_rois_for_rcnn(key, rois9, roi_scores, roi_labels, gt_boxes,
                             sampler_cfg)
    sel = t["roi_sel"]
    ok = t["roi_sample_valid"]
    t["trajectory_rois"] = jnp.where(
        ok[None, :, None], traj[:, sel], 0.0)  # (T, R', 9)
    t["valid_length"] = valid[:, sel] & ok[None, :]
    return t


def _finish_targets(t, sampler_cfg):
    """Batch-level label/canonical-frame finishing (shared with the generic
    assign_targets tail)."""
    from .roi_head_template import assign_targets as _  # noqa: F401 (doc link)
    import numpy as _np

    ious = t["roi_ious"]
    reg_fg = float(sampler_cfg["REG_FG_THRESH"])
    cls_fg = float(sampler_cfg["CLS_FG_THRESH"])
    cls_bg = float(sampler_cfg["CLS_BG_THRESH"])
    t["reg_valid_mask"] = ((ious > reg_fg) & t["roi_sample_valid"]).astype(jnp.int32)
    score_type = sampler_cfg.get("CLS_SCORE_TYPE", "roi_iou")
    if score_type == "cls":
        labels = (ious > cls_fg).astype(jnp.float32)
        ignore = (ious > cls_bg) & (ious < cls_fg)
        labels = jnp.where(ignore, -1.0, labels)
    else:  # roi_iou
        fgm = ious > cls_fg
        bgm = ious < cls_bg
        labels = fgm.astype(jnp.float32)
        labels = jnp.where((~fgm) & (~bgm),
                           (ious - cls_bg) / (cls_fg - cls_bg), labels)
    t["rcnn_cls_labels"] = jnp.where(t["roi_sample_valid"], labels, -1.0)

    gt = t["gt_of_rois"]
    t["gt_of_rois_src"] = gt
    rois = t["rois"]
    roi_center = rois[..., 0:3]
    roi_ry = rois[..., 6] % (2 * _np.pi)
    shift = jnp.concatenate(
        [gt[..., 0:3] - roi_center, gt[..., 3:6], gt[..., 6:7] - roi_ry[..., None]],
        axis=-1)
    b_, m_ = roi_ry.shape
    rotated = rotate_points_along_z_jnp(
        shift[..., 0:3].reshape(b_ * m_, 1, 3), -roi_ry.reshape(b_ * m_)
    ).reshape(b_, m_, 3)
    heading = shift[..., 6] % (2 * _np.pi)
    opposite = (heading > _np.pi * 0.5) & (heading < _np.pi * 1.5)
    heading = jnp.where(opposite, (heading + _np.pi) % (2 * _np.pi), heading)
    heading = jnp.where(heading > _np.pi, heading - 2 * _np.pi, heading)
    heading = jnp.clip(heading, -_np.pi / 2, _np.pi / 2)
    t["gt_of_rois"] = jnp.concatenate(
        [rotated, shift[..., 3:6], heading[..., None], gt[..., 7:]], axis=-1)
    return t
