#!/bin/bash
# Round-4 recovery battery. The first post_train_watch.sh ran its eval
# steps without the repo root on PYTHONPATH, so all six logs under
# flagship_training/run/eval_r4/ are ModuleNotFoundError one-liners.
# This v2 waits for the (already chained) UPerNeXt flagship supervisor
# to exit, then runs BOTH models' evidence batteries sequentially —
# each step is TPU + 1-core-host work, strictly one at a time.
#
# Usage: nohup bash post_train_watch_r4b.sh <upernext_supervisor_pid> \
#            > watch_r4b.log 2>&1 &
set -u
cd "$(dirname "$0")"
REPO="$(cd .. && pwd)"
export PYTHONPATH="$REPO${PYTHONPATH:+:$PYTHONPATH}"
SUP_PID="${1:?usage: post_train_watch_r4b.sh <supervisor_pid>}"

echo "[watch] waiting for upernext supervisor pid=$SUP_PID ..."
while kill -0 "$SUP_PID" 2>/dev/null; do
  sleep 60
done
echo "[watch] supervisor exited at $(date '+%H:%M:%S')"
sleep 10

run_step () {
  # run_step <logdir> <name> <cmd...>
  local logdir="$1" name="$2"; shift 2
  local tmo="${STEP_TIMEOUT:-3000}"
  echo "[watch] === $name start $(date '+%H:%M:%S') ==="
  timeout "$tmo" "$@" > "${logdir}/${name}.log" 2>&1
  echo "[watch] === $name rc=$? end $(date '+%H:%M:%S') ==="
}

latest_ckpt () {
  # latest_ckpt <run_dir> -> echoes the newest state dir
  local n
  n=$(ls -d "$1"/state_* 2>/dev/null | sed 's/.*state_//; s/_not_best//' | sort -n | tail -1)
  ls -d "$1/state_${n}" "$1/state_${n}_not_best" 2>/dev/null | head -1
}

# ---- FPN flagship battery (rerun of the failed r4 battery) ----
cd "$REPO/examples/flagship_training"
CKPT_DIR=$(latest_ckpt run)
echo "[watch] FPN checkpoint: $CKPT_DIR"
mkdir -p run/eval_r4
run_step run/eval_r4 eval_f32 python -m adascale.tools.eval_checkpoint \
  --run run --model-config model.json --steps steps.json --num-pages 20
run_step run/eval_r4 eval_bf16 python -m adascale.tools.eval_checkpoint \
  --run run --model-config model.json --steps steps.json --num-pages 20 \
  --compute-dtype bfloat16
run_step run/eval_r4 eval_shift python -m adascale.tools.eval_checkpoint \
  --run run --model-config model.json --steps steps.json --num-pages 20 --shift
run_step run/eval_r4 tiled_recall python -m adascale.tools.tiled_recall \
  --checkpoint "$CKPT_DIR" --model-config model.json
run_step run/eval_r4 export_params python -m adascale.tools.export_params \
  --checkpoint "$CKPT_DIR" --out flagship_fpn_params.f16.npz

# ---- UPerNeXt flagship battery ----
cd "$REPO/examples/flagship_upernext"
CKPT_DIR=$(latest_ckpt run)
echo "[watch] UPerNeXt checkpoint: $CKPT_DIR"
mkdir -p run/eval_r4
run_step run/eval_r4 eval_f32 python -m adascale.tools.eval_checkpoint \
  --run run --model-config model.json --steps steps.json --num-pages 20
run_step run/eval_r4 eval_bf16 python -m adascale.tools.eval_checkpoint \
  --run run --model-config model.json --steps steps.json --num-pages 20 \
  --compute-dtype bfloat16
run_step run/eval_r4 eval_shift python -m adascale.tools.eval_checkpoint \
  --run run --model-config model.json --steps steps.json --num-pages 20 --shift
run_step run/eval_r4 export_params python -m adascale.tools.export_params \
  --checkpoint "$CKPT_DIR" --out flagship_upernext_params.f16.npz

# ---- kernel sweep (model-independent; wider budget: each config is a
# fresh tunnel compile, 100-700 s) ----
cd "$REPO/examples/flagship_training"
STEP_TIMEOUT=5400 run_step run/eval_r4 kernel_sweep python -m adascale.tools.kernel_sweep \
  --batch 16 --hw 1280 --dtype bf16 --tile-hs 8

# ---- full test suite (host is finally free) ----
cd "$REPO"
run_step /tmp pytest_r4b python -m pytest tests/ -q

touch /tmp/r4b_battery_done
echo "[watch] all done at $(date '+%H:%M:%S')"
