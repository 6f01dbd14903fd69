#!/bin/bash
# Unattended post-training pipeline for the flagship FPN run.
#
# Waits for the training supervisor (PID in $1) to exit, then runs the
# full round-4 evidence battery sequentially (each is TPU+1-core-host
# work, so strictly one at a time), exports the serving weights, and
# chains the UPerNeXt flagship run so the chip never idles. Every step
# logs under run/eval_r4/ so a dropped builder session can pick up the
# numbers later.
#
# Usage: nohup bash post_train_watch.sh <supervisor_pid> > watch.log 2>&1 &
set -u
cd "$(dirname "$0")"
# adascale is not pip-installed; every tool invocation needs the repo root
# on PYTHONPATH (launch.py does its own sys.path.insert, the -m calls don't).
export PYTHONPATH="$(cd ../.. && pwd)${PYTHONPATH:+:$PYTHONPATH}"
SUP_PID="${1:?usage: post_train_watch.sh <supervisor_pid>}"

echo "[watch] waiting for supervisor pid=$SUP_PID ..."
while kill -0 "$SUP_PID" 2>/dev/null; do
  sleep 60
done
echo "[watch] supervisor exited at $(date '+%H:%M:%S')"
sleep 10

CKPT=$(ls -d run/state_* 2>/dev/null | sed 's/.*state_//; s/_not_best//' | sort -n | tail -1)
CKPT_DIR=$(ls -d run/state_${CKPT} run/state_${CKPT}_not_best 2>/dev/null | head -1)
echo "[watch] latest checkpoint: $CKPT_DIR"
mkdir -p run/eval_r4

run_step () {
  local name="$1"; shift
  local tmo="${STEP_TIMEOUT:-3000}"
  echo "[watch] === $name start $(date '+%H:%M:%S') ==="
  timeout "$tmo" "$@" > "run/eval_r4/${name}.log" 2>&1
  echo "[watch] === $name rc=$? end $(date '+%H:%M:%S') ==="
}

run_step eval_f32 python -m adascale.tools.eval_checkpoint \
  --run run --model-config model.json --steps steps.json --num-pages 20
run_step eval_bf16 python -m adascale.tools.eval_checkpoint \
  --run run --model-config model.json --steps steps.json --num-pages 20 \
  --compute-dtype bfloat16
run_step eval_shift python -m adascale.tools.eval_checkpoint \
  --run run --model-config model.json --steps steps.json --num-pages 20 --shift
run_step tiled_recall python -m adascale.tools.tiled_recall \
  --checkpoint "$CKPT_DIR" --model-config model.json
run_step export_params python -m adascale.tools.export_params \
  --checkpoint "$CKPT_DIR" --out flagship_fpn_params.f16.npz
# tile-hs 8 only: each sweep config is a fresh tunnel compile (100-700 s),
# so the matrix is trimmed to the default tile — 10 programs total — and
# the step gets a wider 90-min budget than the eval steps.
STEP_TIMEOUT=5400 run_step kernel_sweep python -m adascale.tools.kernel_sweep \
  --batch 16 --hw 1280 --dtype bf16 --tile-hs 8

echo "[watch] battery done; launching UPerNeXt flagship run"
cd ../flagship_upernext
nohup python launch.py > supervisor.log 2>&1 &
echo "[watch] upernext supervisor pid=$! at $(date '+%H:%M:%S')"
