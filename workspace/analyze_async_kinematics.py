"""Async-degradation decomposition: is the late-fusion collapse kinematic?

VERDICT r3 weak #2: the urban world's async deltas (late -18.9) are far off
the reference's (-2.7). This tool separates the hypotheses WITHOUT training:

  1. kinematics — distribution of object displacement over one keyframe
     (|v| * KEYFRAME_DT) vs the nuScenes matching thresholds (0.5/1/2/4 m):
     the fraction of moving objects whose STALE box cannot match at each
     threshold is an analytic floor on async late-fusion mAP loss;
  2. visibility structure — the fraction of merged-GT objects the ego cannot
     see itself (exchanged boxes are the ONLY chance to detect them; in
     V2X-Sim's overlapping-view intersections this fraction is small, in the
     urban world it is large — multiplying the kinematic penalty);
  3. flow-recovery ceiling — residual displacement after exact
     constant-velocity propagation (curved/turning trajectories), the error
     oracle flow cannot remove.

Usage: python workspace/analyze_async_kinematics.py [--full]  (default: the
synurb world config; prints a markdown summary for README/results).
"""
import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pcp_tpu.datasets.v2x_sim.source import KEYFRAME_DT, SyntheticV2XSource

THRESH = (0.5, 1.0, 2.0, 4.0)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--scenes", type=int, default=15)
    parser.add_argument("--keyframes", type=int, default=12)
    parser.add_argument("--cars", type=int, default=24)
    parser.add_argument("--peds", type=int, default=8)
    parser.add_argument("--parked", type=int, default=16)
    args = parser.parse_args()

    src = SyntheticV2XSource(
        num_scenes=args.scenes, keyframes_per_scene=args.keyframes,
        num_cars=args.cars, num_peds=args.peds, num_parked=args.parked,
        world="urban",
    )

    disp, resid, ego_only_miss, total_gt, ego_seen = [], [], 0, 0, 0
    for info_scene in range(args.scenes):
        if info_scene % 3 != 0:
            continue  # val split = town 3 (si % 3 == 0)
        for kf in range(1, args.keyframes):
            sample_token = f"scene{info_scene}_kf{kf}"
            sample = src.sample_record(sample_token)
            ego_lt = sample["data"].get("LIDAR_TOP_id_1")
            if ego_lt is None:
                continue
            # per-agent view at the CURRENT keyframe
            frames = {}
            for name, lt in sample["data"].items():
                if name.startswith("LIDAR_TOP_id_"):
                    frames[int(name.split("_")[-1])] = src.get_frame(
                        lt, classes_of_interest=("car",), threshold_boxes_by_points=1)
            if 1 not in frames:
                continue
            ego_iids = set(frames[1]["instance_ids"].tolist())
            all_iids = set()
            for f in frames.values():
                all_iids |= set(f["instance_ids"].tolist())
            total_gt += len(all_iids)
            ego_seen += len(all_iids & ego_iids)
            ego_only_miss += len(all_iids - ego_iids)

            # displacement of every box visible to a NON-ego agent at the
            # PREVIOUS keyframe (what late-async actually exchanges)
            prev = src.sample_record(sample["prev"])
            for name, lt in prev["data"].items():
                if not name.startswith("LIDAR_TOP_id_") or name.endswith("id_1"):
                    continue
                f = src.get_frame(lt, classes_of_interest=("car",),
                                  threshold_boxes_by_points=1)
                # boxes/prev_boxes are at (t-1) and (t-2): displacement per
                # keyframe; next-step displacement equals it under constant
                # velocity, residual = curvature
                d1 = f["boxes"][:, :2] - f["prev_boxes"][:, :2]
                disp.extend(np.linalg.norm(d1, axis=1).tolist())
                # residual after constant-velocity propagation: where is the
                # object at t vs (t-1 pos + d1)?
                nxt = src.get_frame(
                    src.sample_record(prev["next"])["data"][name],
                    classes_of_interest=("car",), threshold_boxes_by_points=None)
                iid_to_next = dict(zip(nxt["instance_ids"].tolist(),
                                       nxt["boxes"][:, :2]))
                # both frames are in the agent's lidar frame at their OWN
                # times; for a static RSU these coincide; for moving agents
                # this adds agent motion — skip non-RSU for the residual
                if not name.endswith("id_0"):
                    continue
                for iid, b, d in zip(f["instance_ids"].tolist(), f["boxes"][:, :2], d1):
                    if iid in iid_to_next:
                        resid.append(float(np.linalg.norm(iid_to_next[iid] - (b + d))))

    disp = np.asarray(disp)
    resid = np.asarray(resid)
    print("## Async kinematics decomposition (urban world, val split)\n")
    print(f"- exchanged boxes analysed: {len(disp)}; KEYFRAME_DT = {KEYFRAME_DT}s")
    print(f"- one-keyframe displacement: mean {disp.mean():.2f} m, "
          f"p50 {np.percentile(disp, 50):.2f}, p90 {np.percentile(disp, 90):.2f}, "
          f"max {disp.max():.2f}")
    moving = disp > 0.05
    print(f"- moving fraction: {moving.mean():.2f}")
    for t in THRESH:
        print(f"- stale box farther than {t} m (cannot match at that threshold): "
              f"{(disp > t).mean() * 100:.1f}% of exchanged boxes")
    if len(resid):
        print(f"- residual AFTER exact constant-velocity propagation "
              f"(trajectory curvature): mean {resid.mean():.2f} m, "
              f"p90 {np.percentile(resid, 90):.2f} m")
        for t in THRESH[:2]:
            print(f"  - residual > {t} m: {(resid > t).mean() * 100:.1f}%")
    print(f"\n- merged-GT objects/sample seen by ego itself: "
          f"{ego_seen / max(total_gt, 1) * 100:.1f}% "
          f"(the other {ego_only_miss / max(total_gt, 1) * 100:.1f}% are reachable "
          f"ONLY through the exchange — every staleness error on them is unrecoverable)")
    print("\nReference geometry differs: V2X-Sim agents share one intersection "
          "(overlapping views), so most GT is also ego-visible and async errors "
          "on exchanged boxes are masked by fresh ego detections; the reference's "
          "-2.7 late-fusion delta is consistent with its small exchanged-only share.")


if __name__ == "__main__":
    main()
