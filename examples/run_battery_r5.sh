#!/bin/bash
# Round-5 evidence battery: runs immediately (both flagship runs are done).
# Sequential TPU+host steps; logs under <model>/run/eval_r5/.
set -u
cd "$(dirname "$0")"
REPO="$(cd .. && pwd)"
export PYTHONPATH="$REPO${PYTHONPATH:+:$PYTHONPATH}"

run_step () {
  local logdir="$1" name="$2"; shift 2
  local tmo="${STEP_TIMEOUT:-3000}"
  echo "[battery] === $name start $(date '+%H:%M:%S') ==="
  timeout "$tmo" "$@" > "${logdir}/${name}.log" 2>&1
  echo "[battery] === $name rc=$? end $(date '+%H:%M:%S') ==="
}

latest_ckpt () {
  local n
  n=$(ls -d "$1"/state_* 2>/dev/null | sed 's/.*state_//; s/_not_best//' | sort -n | tail -1)
  ls -d "$1/state_${n}" "$1/state_${n}_not_best" 2>/dev/null | head -1
}

# ---- FPN flagship battery ----
cd "$REPO/examples/flagship_training"
CKPT_DIR=$(latest_ckpt run)
echo "[battery] FPN checkpoint: $CKPT_DIR"
mkdir -p run/eval_r5
run_step run/eval_r5 eval_f32 python -m adascale.tools.eval_checkpoint \
  --run run --model-config model.json --steps steps.json --num-pages 20
run_step run/eval_r5 eval_bf16 python -m adascale.tools.eval_checkpoint \
  --run run --model-config model.json --steps steps.json --num-pages 20 \
  --compute-dtype bfloat16
run_step run/eval_r5 eval_shift python -m adascale.tools.eval_checkpoint \
  --run run --model-config model.json --steps steps.json --num-pages 20 --shift
run_step run/eval_r5 tiled_recall python -m adascale.tools.tiled_recall \
  --checkpoint "$CKPT_DIR" --model-config model.json
run_step run/eval_r5 export_params python -m adascale.tools.export_params \
  --checkpoint "$CKPT_DIR" --out flagship_fpn_params.f16.npz

# ---- UPerNeXt flagship battery ----
cd "$REPO/examples/flagship_upernext"
CKPT_DIR=$(latest_ckpt run)
echo "[battery] UPerNeXt checkpoint: $CKPT_DIR"
mkdir -p run/eval_r5
run_step run/eval_r5 eval_f32 python -m adascale.tools.eval_checkpoint \
  --run run --model-config model.json --steps steps.json --num-pages 20
run_step run/eval_r5 eval_bf16 python -m adascale.tools.eval_checkpoint \
  --run run --model-config model.json --steps steps.json --num-pages 20 \
  --compute-dtype bfloat16
run_step run/eval_r5 eval_shift python -m adascale.tools.eval_checkpoint \
  --run run --model-config model.json --steps steps.json --num-pages 20 --shift
run_step run/eval_r5 export_params python -m adascale.tools.export_params \
  --checkpoint "$CKPT_DIR" --out flagship_upernext_params.f16.npz

# ---- full test suite ----
cd "$REPO"
run_step /tmp pytest_r5 python -m pytest tests/ -q

touch /tmp/r5_battery_done
echo "[battery] all done at $(date '+%H:%M:%S')"
