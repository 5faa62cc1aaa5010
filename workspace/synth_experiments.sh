#!/bin/bash
# Full synthetic-world experiment pipeline reproducing the reference README
# matrix (/root/reference/README.md:44-54) — now on the *urban* world
# (Manhattan blocks + limited per-agent sensing range, source.py), where
# collaboration is necessary: the single-agent ego structurally cannot see
# parallel streets. Produces sync AND async columns for late/early/lately
# (+ mid fusion DiscoNet), plus the flow-propagation ablation for the async
# rows — the full shape of the reference results table.
#
#   SMOKE=1 workspace/synth_experiments.sh   # tiny world, 2 epochs, plumbing check
#   VF=1 workspace/synth_experiments.sh      # visible-faces world (tag synvf)
#   workspace/synth_experiments.sh           # full run (hours; background it)
#
# Stages write markers into $OUT so a re-run resumes after the last finished
# one. A failing stage logs FAILED and the pipeline continues (later stages
# that depend on it will fail too, but independent rows still get produced).
#
# Stage ORDER is priority order: the headline question (real-sender lately
# vs early, sync+async) is trained, evaluated, and exported FIRST, so a
# truncated session still banks the decisive rows; seed repeats (variance),
# ablations, disco, and the loose broadcast follow.
cd "$(dirname "$0")/.."

# persistent compilation cache: the same model/shape compiles repeat across
# the ~20 stage processes; caching them saves most of the compile wall-clock
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-output/jax_cache}
mkdir -p "$JAX_COMPILATION_CACHE_DIR"

if [ -n "$SMOKE" ]; then
  SYN="{'NUM_SCENES': 3, 'KEYFRAMES_PER_SCENE': 4, 'NUM_CARS': 12, 'NUM_PEDS': 4, 'WORLD': 'urban', 'NUM_PARKED': 8}"
  EPOCHS_CAR=2; EPOCHS_EGO=2; TAG=smokeurb; NPTS=16384
else
  SYN="{'NUM_SCENES': 15, 'KEYFRAMES_PER_SCENE': 12, 'NUM_CARS': 24, 'NUM_PEDS': 8, 'WORLD': 'urban', 'NUM_PARKED': 16}"
  EPOCHS_CAR=25; EPOCHS_EGO=30; TAG=${TAG_OVERRIDE:-synurb}; NPTS=32768
fi
# VF=1: visible-face lidar sampling (sensor-facing box faces only, sedan
# profile carve — heading direction learnable, like real lidar). Separate
# default tag so the two worlds' matrices stay distinct.
if [ -n "$VF" ]; then
  SYN="${SYN%\}}, 'VISIBLE_FACES': True}"
  [ -z "$SMOKE" ] && TAG=${TAG_OVERRIDE:-synvf}
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
  if "$@"; then
    touch "$OUT/$name.done"
  else
    log "FAILED $name (continuing)"
    echo "$name" >> "$OUT/failed.txt"
  fi
}

ckpt_of() { ls -d output/cfgs/v2x_sim_models/$1/$2/ckpt/checkpoint_epoch_* 2>/dev/null | sort -V | tail -1; }

ev() {  # ev <stagename> <cfg> <tag> [extra --set pairs...]
  local name=$1 cfgf=$2 tag=$3; shift 3
  run_stage "eval_$name" python tools/test.py --cfg_file $CFGS/$cfgf.yaml --batch_size 4 \
    --extra_tag "$tag" --eval_tag "$name" \
    --ckpt "$(ckpt_of $cfgf $tag)" \
    --set "${COMMON_SET[@]}" DATA_CONFIG.DATASET_DOWNSAMPLING_RATIO 1 "$@"
}

late() {  # late <stagename> [extra --set pairs...]  (host model; no checkpoint)
  local name=$1; shift
  run_stage "eval_$name" python tools/test.py --cfg_file $CFGS/v2x_late_fusion.yaml --batch_size 4 \
    --extra_tag $TAG --eval_tag "$name" --set "${COMMON_SET[@]}" DATA_CONFIG.DATASET_DOWNSAMPLING_RATIO 1 "$@"
}

# ===== PHASE 1 — the headline: real-sender lately vs early, both columns ====

# ---- 1a. per-agent detectors (car model also provides ego's own boxes) ------
run_stage train_car python tools/train.py --cfg_file $CFGS/v2x_pointpillar_basic_car.yaml \
  --batch_size 4 --epochs $EPOCHS_CAR --extra_tag $TAG --num_epochs_to_eval 0 \
  --set "${COMMON_SET[@]}" DATA_CONFIG.DATASET_DOWNSAMPLING_RATIO 4

run_stage train_rsu python tools/train.py --cfg_file $CFGS/v2x_pointpillar_basic_rsu.yaml \
  --batch_size 4 --epochs $EPOCHS_CAR --extra_tag $TAG --num_epochs_to_eval 0 \
  --set "${COMMON_SET[@]}" DATA_CONFIG.DATASET_DOWNSAMPLING_RATIO 1

# ---- 1b. broadcast: exchange database over train+val ------------------------
# exchange files are keyed by sample token, and token names overlap across
# world configs (scene0_kf0...) — stale DBs from another world silently
# poison the ego training, so clear them once per pipeline tag
run_stage clean_exchange rm -rf data/v2x-sim/v2.0-trainval/exchange_database_flow \
  data/v2x-sim/v2.0-trainval/exchange_database_loose
run_stage gen_exchange_car python workspace/v2x_gen_exchange_database.py --agent car \
  --ckpt "$(ckpt_of v2x_pointpillar_basic_car $TAG)" --synthetic \
  --set MAX_POINTS_PER_SAMPLE "$NPTS" SYNTHETIC "$SYN" MINI_TRAINVAL_STRIDE 1
run_stage gen_exchange_rsu python workspace/v2x_gen_exchange_database.py --agent rsu \
  --ckpt "$(ckpt_of v2x_pointpillar_basic_rsu $TAG)" --synthetic \
  --set MAX_POINTS_PER_SAMPLE "$NPTS" SYNTHETIC "$SYN" MINI_TRAINVAL_STRIDE 1

# ---- 1c. headline models ----------------------------------------------------
# lately (MoDAR): trained in the async setting (exchange = previous keyframe
# + flow propagation), the reference's main configuration
run_stage train_ego python tools/train.py --cfg_file $CFGS/v2x_pointpillar_basic_ego.yaml \
  --batch_size 4 --epochs $EPOCHS_EGO --extra_tag $TAG --num_epochs_to_eval 0 \
  --set "${COMMON_SET[@]}" DATA_CONFIG.DATASET_DOWNSAMPLING_RATIO 1

# early fusion: matched train/eval settings for each latency column
run_stage train_early_sync python tools/train.py --cfg_file $CFGS/v2x_pointpillar_basic_ego_early.yaml \
  --batch_size 4 --epochs $EPOCHS_EGO --extra_tag ${TAG}_sync --num_epochs_to_eval 0 \
  --set "${COMMON_SET[@]}" DATA_CONFIG.DATASET_DOWNSAMPLING_RATIO 1 DATA_CONFIG.EXCHANGE_PREVIOUS False

run_stage train_early_async python tools/train.py --cfg_file $CFGS/v2x_pointpillar_basic_ego_early.yaml \
  --batch_size 4 --epochs $EPOCHS_EGO --extra_tag ${TAG}_async --num_epochs_to_eval 0 \
  --set "${COMMON_SET[@]}" DATA_CONFIG.DATASET_DOWNSAMPLING_RATIO 1 DATA_CONFIG.EXCHANGE_PREVIOUS True

# ---- 1d. headline evals (+ the cheap late-fusion rows, no training) ---------
ev lately_sync v2x_pointpillar_basic_ego "$TAG" DATA_CONFIG.EXCHANGE_NOW True
ev lately_async v2x_pointpillar_basic_ego "$TAG"
ev lately_async_noflow v2x_pointpillar_basic_ego "$TAG" DATA_CONFIG.EXCHANGE_FLOW_PROPAGATION False
ev early_sync v2x_pointpillar_basic_ego_early "${TAG}_sync" DATA_CONFIG.EXCHANGE_PREVIOUS False
ev early_async v2x_pointpillar_basic_ego_early "${TAG}_async" DATA_CONFIG.EXCHANGE_PREVIOUS True
# per-agent car detector (own-view GT — NOT comparable to the merged-GT rows)
ev car v2x_pointpillar_basic_car "$TAG"

late late_sync DATA_CONFIG.EXCHANGE_SETTING now
late late_async DATA_CONFIG.EXCHANGE_SETTING prev
late late_async_noflow DATA_CONFIG.EXCHANGE_SETTING prev DATA_CONFIG.EXCHANGE_FLOW_PROPAGATION False
late late_sync_wnms DATA_CONFIG.EXCHANGE_SETTING now MODEL.BOX_FUSION_METHOD weighted_nms
late late_async_wnms DATA_CONFIG.EXCHANGE_SETTING prev MODEL.BOX_FUSION_METHOD weighted_nms
# async with ORACLE flow (predicted boxes, GT velocities): isolates
# flow-prediction error from box/matching error in the async collapse
late late_async_oracleflow DATA_CONFIG.EXCHANGE_SETTING prev DATA_CONFIG.EXCHANGE_ORACLE_FLOW True

# bandwidth column artifact (host-only; needs the exchange DB, nothing else)
run_stage measure_bandwidth python workspace/measure_exchange_size.py --synthetic \
  --json "results/$TAG/bandwidth.json" \
  --set MAX_POINTS_PER_SAMPLE "$NPTS" SYNTHETIC "$SYN" MINI_TRAINVAL_STRIDE 1

# ---- 1e. cheap decisive evals (no extra training) ---------------------------
# oracle-senders EVAL-ONLY swap on the real-sender-trained ego: isolates the
# input-side sender-quality effect from ego retraining noise (VERDICT r4 #6)
ev lately_oracleswap_sync v2x_pointpillar_basic_ego "$TAG" \
  DATA_CONFIG.EXCHANGE_ORACLE True DATA_CONFIG.EXCHANGE_NOW True
ev lately_oracleswap_async v2x_pointpillar_basic_ego "$TAG" DATA_CONFIG.EXCHANGE_ORACLE True

# lossy-broadcast robustness (VERDICT r4 #7): eval-time EXCHANGE_DROPOUT
# simulates agents whose messages never arrive (deterministic per sample)
ev lately_drop02_sync v2x_pointpillar_basic_ego "$TAG" \
  DATA_CONFIG.EXCHANGE_NOW True DATA_CONFIG.EXCHANGE_DROPOUT 0.2
ev lately_drop02_async v2x_pointpillar_basic_ego "$TAG" DATA_CONFIG.EXCHANGE_DROPOUT 0.2
ev lately_drop05_sync v2x_pointpillar_basic_ego "$TAG" \
  DATA_CONFIG.EXCHANGE_NOW True DATA_CONFIG.EXCHANGE_DROPOUT 0.5
ev lately_drop05_async v2x_pointpillar_basic_ego "$TAG" DATA_CONFIG.EXCHANGE_DROPOUT 0.5

# bank the headline immediately (re-exported with more rows at the end)
python workspace/collect_results.py "$TAG" --export || true

# ===== PHASE 2 — variance: seed repeats of the pivotal pair =================
# Run-to-run retrain swing reached 6 mAP between rounds; the lately-vs-early
# conclusion needs n>=3 (lately) / n>=3 (early sync). Seeds vary ONLY training
# stochasticity (init/shuffle/augment); the world is hash-seeded separately.
for SEED in 101 202; do
  run_stage train_ego_s$SEED python tools/train.py --cfg_file $CFGS/v2x_pointpillar_basic_ego.yaml \
    --batch_size 4 --epochs $EPOCHS_EGO --extra_tag ${TAG}_s$SEED --seed $SEED --num_epochs_to_eval 0 \
    --set "${COMMON_SET[@]}" DATA_CONFIG.DATASET_DOWNSAMPLING_RATIO 1
  ev lately_sync_s$SEED v2x_pointpillar_basic_ego "${TAG}_s$SEED" DATA_CONFIG.EXCHANGE_NOW True
  ev lately_async_s$SEED v2x_pointpillar_basic_ego "${TAG}_s$SEED"

  run_stage train_early_sync_s$SEED python tools/train.py --cfg_file $CFGS/v2x_pointpillar_basic_ego_early.yaml \
    --batch_size 4 --epochs $EPOCHS_EGO --extra_tag ${TAG}_sync_s$SEED --seed $SEED --num_epochs_to_eval 0 \
    --set "${COMMON_SET[@]}" DATA_CONFIG.DATASET_DOWNSAMPLING_RATIO 1 DATA_CONFIG.EXCHANGE_PREVIOUS False
  ev early_sync_s$SEED v2x_pointpillar_basic_ego_early "${TAG}_sync_s$SEED" DATA_CONFIG.EXCHANGE_PREVIOUS False

  python workspace/collect_results.py "$TAG" --export || true
done

# ===== PHASE 3 — floors, oracle decomposition, robustness ===================
# single-agent floor: same ego val samples + merged GT, exchange off
run_stage train_single python tools/train.py --cfg_file $CFGS/v2x_pointpillar_basic_ego.yaml \
  --batch_size 4 --epochs $EPOCHS_EGO --extra_tag ${TAG}_nocollab --num_epochs_to_eval 0 \
  --set "${COMMON_SET[@]}" DATA_CONFIG.DATASET_DOWNSAMPLING_RATIO 1 DATA_CONFIG.EXCHANGE_MODAR False
ev single v2x_pointpillar_basic_ego "${TAG}_nocollab" DATA_CONFIG.EXCHANGE_MODAR False

# lately with ORACLE senders (GT boxes + exact constant-velocity flow),
# matched training: upper-bounds lately fusion given perfect sender detectors
run_stage train_ego_oracle python tools/train.py --cfg_file $CFGS/v2x_pointpillar_basic_ego.yaml \
  --batch_size 4 --epochs $EPOCHS_EGO --extra_tag ${TAG}_oracle --num_epochs_to_eval 0 \
  --set "${COMMON_SET[@]}" DATA_CONFIG.DATASET_DOWNSAMPLING_RATIO 1 DATA_CONFIG.EXCHANGE_ORACLE True
ev lately_oracle_sync v2x_pointpillar_basic_ego "${TAG}_oracle" \
  DATA_CONFIG.EXCHANGE_ORACLE True DATA_CONFIG.EXCHANGE_NOW True
ev lately_oracle_async v2x_pointpillar_basic_ego "${TAG}_oracle" DATA_CONFIG.EXCHANGE_ORACLE True

python workspace/collect_results.py "$TAG" --export || true

# ===== PHASE 4 — mid fusion (DiscoNet) =======================================
# frozen BEVMakers from the trained car/rsu/early models. Matched-training per
# latency column (same treatment as early fusion): an async-trained net learns
# to lead moving targets by ~v*dt and misplaces them when evaluated on fresh
# exchange (round-4 mechanism, results/synurb cross cells)
disco_common=("${COMMON_SET[@]}" DATA_CONFIG.DATASET_DOWNSAMPLING_RATIO 1)
disco_makers=(MODEL.BEV_MAKER_RSU.CKPT "$(ckpt_of v2x_pointpillar_basic_rsu $TAG)"
  MODEL.BEV_MAKER_CAR.CKPT "$(ckpt_of v2x_pointpillar_basic_car $TAG)"
  MODEL.BEV_MAKER_EARLY.CKPT "$(ckpt_of v2x_pointpillar_basic_ego_early ${TAG}_sync)")
run_stage train_disco python tools/train.py --cfg_file $CFGS/v2x_pointpillar_disco.yaml \
  --batch_size 4 --epochs $EPOCHS_EGO --extra_tag $TAG --num_epochs_to_eval 0 \
  --set "${disco_common[@]}" DATA_CONFIG.EXCHANGE_PREVIOUS True "${disco_makers[@]}"
run_stage train_disco_sync python tools/train.py --cfg_file $CFGS/v2x_pointpillar_disco.yaml \
  --batch_size 4 --epochs $EPOCHS_EGO --extra_tag ${TAG}_dsync --num_epochs_to_eval 0 \
  --set "${disco_common[@]}" DATA_CONFIG.EXCHANGE_PREVIOUS False "${disco_makers[@]}"

# matched train/eval per column + the cross cells (async-trained@sync,
# sync-trained@async) that expose the lead-compensation mechanism
ev disco_sync v2x_pointpillar_disco "${TAG}_dsync" DATA_CONFIG.EXCHANGE_PREVIOUS False
ev disco_async v2x_pointpillar_disco "$TAG" DATA_CONFIG.EXCHANGE_PREVIOUS True
ev disco_xsync v2x_pointpillar_disco "$TAG" DATA_CONFIG.EXCHANGE_PREVIOUS False
ev disco_xasync v2x_pointpillar_disco "${TAG}_dsync" DATA_CONFIG.EXCHANGE_PREVIOUS True

python workspace/collect_results.py "$TAG" --export || true

# ===== PHASE 5 — loose broadcast (lowest priority: round-4 null) ============
# sender score threshold 0.03, up to 200 boxes/frame: the practical
# sender-recall lever — the ego sees the score channel and learns to discount
# low-confidence MoDAR
run_stage gen_exchange_loose_car python workspace/v2x_gen_exchange_database.py --agent car \
  --ckpt "$(ckpt_of v2x_pointpillar_basic_car $TAG)" --synthetic \
  --out_dir data/v2x-sim/v2.0-trainval/exchange_database_loose \
  --broadcast_score_thresh 0.03 --broadcast_post_max 200 \
  --set MAX_POINTS_PER_SAMPLE "$NPTS" SYNTHETIC "$SYN" MINI_TRAINVAL_STRIDE 1
run_stage gen_exchange_loose_rsu python workspace/v2x_gen_exchange_database.py --agent rsu \
  --ckpt "$(ckpt_of v2x_pointpillar_basic_rsu $TAG)" --synthetic \
  --out_dir data/v2x-sim/v2.0-trainval/exchange_database_loose \
  --broadcast_score_thresh 0.03 --broadcast_post_max 200 \
  --set MAX_POINTS_PER_SAMPLE "$NPTS" SYNTHETIC "$SYN" MINI_TRAINVAL_STRIDE 1
run_stage train_ego_loose python tools/train.py --cfg_file $CFGS/v2x_pointpillar_basic_ego.yaml \
  --batch_size 4 --epochs $EPOCHS_EGO --extra_tag ${TAG}_loose --num_epochs_to_eval 0 \
  --set "${COMMON_SET[@]}" DATA_CONFIG.DATASET_DOWNSAMPLING_RATIO 1 \
  DATA_CONFIG.EXCHANGE_DATABASE_DIRECTORY exchange_database_loose
ev lately_loose_sync v2x_pointpillar_basic_ego "${TAG}_loose" DATA_CONFIG.EXCHANGE_NOW True \
  DATA_CONFIG.EXCHANGE_DATABASE_DIRECTORY exchange_database_loose
ev lately_loose_async v2x_pointpillar_basic_ego "${TAG}_loose" \
  DATA_CONFIG.EXCHANGE_DATABASE_DIRECTORY exchange_database_loose

# ===== PHASE 6 — committed artifacts =========================================
run_stage export_results python workspace/collect_results.py "$TAG" --export
run_stage export_bench_ckpt python tools/export_bench_ckpt.py \
  --ckpt "$(ckpt_of v2x_pointpillar_basic_ego $TAG)" --out results/bench_ckpt

log "ALL DONE — table: python workspace/collect_results.py $TAG"
