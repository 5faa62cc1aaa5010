#!/bin/bash
# Full synthetic-world experiment pipeline: trains every agent model, builds
# the exchange database, trains the collaborative ego variants, and evaluates
# all five fusion modes — reproducing the reference README experiment matrix
# (/root/reference/README.md:44-54) on the procedural world.
#
#   SMOKE=1 workspace/synth_experiments.sh   # tiny world, 2 epochs, plumbing check
#   workspace/synth_experiments.sh           # full run (hours; background it)
#
# Stages write markers into $OUT so a re-run resumes after the last finished one.
set -e
cd "$(dirname "$0")/.."

if [ -n "$SMOKE" ]; then
  SYN="{'NUM_SCENES': 3, 'KEYFRAMES_PER_SCENE': 4, 'NUM_CARS': 12, 'NUM_PEDS': 4}"
  EPOCHS_CAR=2; EPOCHS_EGO=2; TAG=smoke; NPTS=16384
else
  SYN="{'NUM_SCENES': 15, 'KEYFRAMES_PER_SCENE': 12, 'NUM_CARS': 24, 'NUM_PEDS': 8}"
  EPOCHS_CAR=25; EPOCHS_EGO=30; TAG=${TAG_OVERRIDE:-synfull}; NPTS=32768
fi

COMMON_SET=(DATA_CONFIG.USE_SYNTHETIC_DATA True
            DATA_CONFIG.MAX_POINTS_PER_SAMPLE "$NPTS"
            DATA_CONFIG.SYNTHETIC "$SYN"
            DATA_CONFIG.MINI_TRAINVAL_STRIDE 1
            OPTIMIZATION.LR 0.003)
CFGS=tools/cfgs/v2x_sim_models
OUT=output/stamps_$TAG; mkdir -p "$OUT"
log() { echo "[$(date +%H:%M:%S)] $*"; }

run_stage() {  # run_stage <name> <cmd...>
  local name=$1; shift
  if [ -f "$OUT/$name.done" ]; then log "skip $name (done)"; return 0; fi
  log "=== $name ==="
  "$@" && touch "$OUT/$name.done"
}

ckpt_of() { ls -d output/cfgs/v2x_sim_models/$1/$TAG/ckpt/checkpoint_epoch_* 2>/dev/null | sort -V | tail -1; }

# ---- 1. per-agent detectors (car model also provides ego's own boxes) ------
run_stage train_car python tools/train.py --cfg_file $CFGS/v2x_pointpillar_basic_car.yaml \
  --batch_size 4 --epochs $EPOCHS_CAR --extra_tag $TAG --num_epochs_to_eval 0 \
  --set "${COMMON_SET[@]}" DATA_CONFIG.DATASET_DOWNSAMPLING_RATIO 4

run_stage train_rsu python tools/train.py --cfg_file $CFGS/v2x_pointpillar_basic_rsu.yaml \
  --batch_size 4 --epochs $EPOCHS_CAR --extra_tag $TAG --num_epochs_to_eval 0 \
  --set "${COMMON_SET[@]}" DATA_CONFIG.DATASET_DOWNSAMPLING_RATIO 1

# ---- 2. broadcast: exchange database over train+val --------------------------
run_stage gen_exchange_car python workspace/v2x_gen_exchange_database.py --agent car \
  --ckpt "$(ckpt_of v2x_pointpillar_basic_car)" --synthetic \
  --set MAX_POINTS_PER_SAMPLE "$NPTS" SYNTHETIC "$SYN" MINI_TRAINVAL_STRIDE 1
run_stage gen_exchange_rsu python workspace/v2x_gen_exchange_database.py --agent rsu \
  --ckpt "$(ckpt_of v2x_pointpillar_basic_rsu)" --synthetic \
  --set MAX_POINTS_PER_SAMPLE "$NPTS" SYNTHETIC "$SYN" MINI_TRAINVAL_STRIDE 1

# ---- 3. collaborative ego variants -----------------------------------------
run_stage train_ego python tools/train.py --cfg_file $CFGS/v2x_pointpillar_basic_ego.yaml \
  --batch_size 4 --epochs $EPOCHS_EGO --extra_tag $TAG --num_epochs_to_eval 0 \
  --set "${COMMON_SET[@]}" DATA_CONFIG.DATASET_DOWNSAMPLING_RATIO 1

run_stage train_early python tools/train.py --cfg_file $CFGS/v2x_pointpillar_basic_ego_early.yaml \
  --batch_size 4 --epochs $EPOCHS_EGO --extra_tag $TAG --num_epochs_to_eval 0 \
  --set "${COMMON_SET[@]}" DATA_CONFIG.DATASET_DOWNSAMPLING_RATIO 1

run_stage train_single python tools/train.py --cfg_file $CFGS/v2x_pointpillar_basic_ego.yaml \
  --batch_size 4 --epochs $EPOCHS_EGO --extra_tag ${TAG}_nocollab --num_epochs_to_eval 0 \
  --set "${COMMON_SET[@]}" DATA_CONFIG.DATASET_DOWNSAMPLING_RATIO 1 DATA_CONFIG.EXCHANGE_MODAR False

# ---- 4. evaluate everything --------------------------------------------------
ev() {  # ev <stagename> <cfg> <tag> <recal> [extra --set pairs...]
  local name=$1 cfgf=$2 tag=$3 recal=$4; shift 4
  local recal_args=()
  [ "$recal" != 0 ] && recal_args=(--bn_recal "$recal")
  run_stage "eval_$name" python tools/test.py --cfg_file $CFGS/$cfgf.yaml --batch_size 4 \
    --extra_tag "$tag" --ckpt "$(ls -d output/cfgs/v2x_sim_models/$cfgf/$tag/ckpt/checkpoint_epoch_* 2>/dev/null | sort -V | tail -1)" \
    "${recal_args[@]}" --set "${COMMON_SET[@]}" DATA_CONFIG.DATASET_DOWNSAMPLING_RATIO 1 "$@"
}

ev car v2x_pointpillar_basic_car "$TAG" 30
ev single v2x_pointpillar_basic_ego "${TAG}_nocollab" 30 DATA_CONFIG.EXCHANGE_MODAR False
ev early v2x_pointpillar_basic_ego_early "$TAG" 30
ev ego_norecal v2x_pointpillar_basic_ego "$TAG" 0
ev ego v2x_pointpillar_basic_ego "$TAG" 30

# late fusion (host model over the exchange DB; no checkpoint)
run_stage eval_late python tools/test.py --cfg_file $CFGS/v2x_late_fusion.yaml --batch_size 4 \
  --extra_tag $TAG --set "${COMMON_SET[@]}" DATA_CONFIG.DATASET_DOWNSAMPLING_RATIO 1

log "ALL DONE — grep mAP: grep -h 'mAP\|NDS' output/cfgs/v2x_sim_models/*/*/eval/log_eval_*.txt"
