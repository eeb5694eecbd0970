#!/bin/bash
# Parallel Bench2Drive closed-loop evaluation.
#
# Counterpart of `bench2drive/leaderboard/scripts/run_evaluation_multi_hipad.sh`
# (16 CARLA sims x route shards over 8 GPUs): same sharded-routes / resume
# scheme, but each worker pairs one CARLA server with one TPU agent process.
# Requires CARLA 0.9.15 + the Bench2Drive leaderboard checkout (external
# dependencies we interface with, not rebuild — SURVEY §2.10).
#
# Usage: TASK_NUM=8 CARLA_ROOT=/path LEADERBOARD_ROOT=/path \
#        ROUTES_DIR=splits/ CKPT=work_dirs/hipad_tpu ./tools/run_closed_loop.sh out/

set -euo pipefail
OUT=${1:-eval_out}
TASK_NUM=${TASK_NUM:-8}
BASE_PORT=${BASE_PORT:-20082}
BASE_TM_PORT=${BASE_TM_PORT:-50000}
CKPT=${CKPT:-work_dirs/hipad_tpu}
# CARLA takes ~30 s to open its RPC port after launch; the mock-harness
# orchestration test (tests/test_closed_loop.py) shrinks this to 1 s.
CARLA_BOOT_WAIT=${CARLA_BOOT_WAIT:-30}
REPO_ROOT="$(cd "$(dirname "$0")/.." && pwd)"
mkdir -p "$OUT"

for ((i = 0; i < TASK_NUM; i++)); do
  PORT=$((BASE_PORT + i * 150))
  TM_PORT=$((BASE_TM_PORT + i * 150))
  ROUTES="${ROUTES_DIR}/split_${i}.xml"
  (
    "${CARLA_ROOT}/CarlaUE4.sh" -RenderOffScreen -nosound \
        -carla-rpc-port=$PORT >"$OUT/carla_$i.log" 2>&1 &
    CARLA_PID=$!
    sleep "$CARLA_BOOT_WAIT"
    PYTHONPATH="${LEADERBOARD_ROOT}:${LEADERBOARD_ROOT}/leaderboard:${REPO_ROOT}" \
    SAVE_PATH="$OUT/agent_$i" \
    python "${LEADERBOARD_ROOT}/leaderboard/leaderboard_evaluator.py" \
        --routes="$ROUTES" \
        --repetitions=1 \
        --track=SENSORS \
        --checkpoint="$OUT/route_$i.json" \
        --agent="${REPO_ROOT}/hipad_tpu/agent/carla_adapter.py" \
        --agent-config="${CKPT}+hipad_tpu_$i" \
        --port=$PORT --traffic-manager-port=$TM_PORT \
        --resume=True >"$OUT/eval_$i.log" 2>&1
    kill $CARLA_PID 2>/dev/null || true
  ) &
done
wait
python "${REPO_ROOT}/tools/route_stats.py" --route-dir "$OUT" --out "$OUT/merged.json"
