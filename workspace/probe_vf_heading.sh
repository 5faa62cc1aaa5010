#!/bin/bash
# Decisive probe for VERDICT r4 item 1 (lately-vs-early headline gap):
# the synurb matrix showed the gap is sender BOX QUALITY, specifically
# heading — the car sender's AOE is 1.596 rad (= pi/2, i.e. heading
# direction random) because the old world sampled all box faces uniformly,
# making a static car's cloud exactly 180-degree symmetric (ROUND4.md item 6).
#
# Visible-face weighting alone does NOT fix this: a plain cuboid's visible
# cloud is exactly flip-symmetric (measured in
# tests/test_occlusion.py::test_car_profile_breaks_heading_flip_symmetry).
# The fix is the sedan-profile carve (source.py car_profile, on by default
# under VISIBLE_FACES): a front/back-asymmetric shape, which is how real
# lidar disambiguates heading.
#
# This probe trains the SAME car detector on the VF+carve world at the
# synurb budget (EPOCHS=25, DS4, same world size/seed) and evals it. If AOE
# drops from 1.596 toward real-lidar scale, the mechanism is confirmed and
# the full synvf matrix (VF=1 workspace/synth_experiments.sh) is the payoff.
#
# Artifacts: results/synvf_probe/ (metrics.json + logs + summary.md).
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-output/jax_cache}
mkdir -p "$JAX_COMPILATION_CACHE_DIR"

SYN="{'NUM_SCENES': 15, 'KEYFRAMES_PER_SCENE': 12, 'NUM_CARS': 24, 'NUM_PEDS': 8, 'WORLD': 'urban', 'NUM_PARKED': 16, 'VISIBLE_FACES': True}"
NPTS=32768
TAG=synvf
EPOCHS=${EPOCHS:-25}  # synurb parity; EPOCHS=10 for a fast mechanism check
CFG=tools/cfgs/v2x_sim_models/v2x_pointpillar_basic_car.yaml
COMMON_SET=(DATA_CONFIG.USE_SYNTHETIC_DATA True
            DATA_CONFIG.MAX_POINTS_PER_SAMPLE "$NPTS"
            DATA_CONFIG.SYNTHETIC "$SYN"
            DATA_CONFIG.MINI_TRAINVAL_STRIDE 1
            OPTIMIZATION.LR 0.003)

CKPT=$(ls -d output/cfgs/v2x_sim_models/v2x_pointpillar_basic_car/$TAG/ckpt/checkpoint_epoch_* 2>/dev/null | sort -V | tail -1)
# only reuse a finished run at THIS probe's budget — a checkpoint from an
# interrupted run or a shorter EPOCHS fast check must not masquerade as the
# full probe result (train.py itself resumes mid-run checkpoints)
if [ -n "$CKPT" ] && [ "${CKPT##*_}" -lt "$EPOCHS" ]; then
  echo "found checkpoint_epoch_${CKPT##*_} < EPOCHS=$EPOCHS — resuming training"
  CKPT=""
fi
if [ -z "$CKPT" ]; then
  python tools/train.py --cfg_file $CFG --batch_size 4 --epochs $EPOCHS \
    --extra_tag $TAG --num_epochs_to_eval 0 \
    --set "${COMMON_SET[@]}" DATA_CONFIG.DATASET_DOWNSAMPLING_RATIO 4 || exit 1
  CKPT=$(ls -d output/cfgs/v2x_sim_models/v2x_pointpillar_basic_car/$TAG/ckpt/checkpoint_epoch_* | sort -V | tail -1)
fi

python tools/test.py --cfg_file $CFG --batch_size 4 --extra_tag $TAG \
  --eval_tag car --ckpt "$CKPT" \
  --set "${COMMON_SET[@]}" DATA_CONFIG.DATASET_DOWNSAMPLING_RATIO 1 || exit 1

DST=results/synvf_probe
mkdir -p "$DST"
SRC=output/cfgs/v2x_sim_models/v2x_pointpillar_basic_car/$TAG
cp "$SRC/eval/car/metrics.json" "$DST/metrics.json" 2>/dev/null \
  || cp $(find "$SRC/eval" -name metrics.json | tail -1) "$DST/metrics.json"
cp "$SRC"/log_train_*.txt "$DST/" 2>/dev/null
find "$SRC/eval" -name "log_eval_*.txt" -exec cp {} "$DST/" \;
python - <<'PY'
import json
vf = json.load(open("results/synvf_probe/metrics.json"))
ur = json.load(open("results/synurb/v2x_pointpillar_basic_car__synurb__car/metrics.json"))
rows = ["| metric | synurb (all-faces world) | synvf (visible-faces) |",
        "|---|---|---|"]
for k in ["car_AP", "car_ATE", "car_ASE", "car_AOE", "NDS"]:
    rows.append(f"| {k} | {ur[k]:.3f} | {vf[k]:.3f} |")
open("results/synvf_probe/summary.md", "w").write(
    "# VF+sedan-profile heading probe — car sender (synurb world otherwise identical)\n\n"
    + "\n".join(rows)
    + "\n\nDecision rule: AOE 1.596 (heading random under the 180-deg box-cloud\n"
      "symmetry) -> real-lidar scale (<0.3) confirms the visible-faces fix;\n"
      "the full `VF=1 workspace/synth_experiments.sh` matrix is the payoff.\n")
print(open("results/synvf_probe/summary.md").read())
PY
