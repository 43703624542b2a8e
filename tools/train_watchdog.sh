#!/bin/bash
# Restart-on-stall wrapper for tools/train_shipped_ckpt.py.
#
# Remote-attached TPU links (the axon tunnel) occasionally wedge a
# long-running client: every thread blocks on an RPC that never
# completes, with no error raised.  The trainer checkpoints its full
# state periodically (--ckpt-dir) and resumes exactly (--resume), and
# the persistent compile cache makes a restart cost ~40 s — so the
# robust way to run long training on such a link is to relaunch
# whenever the step log stops advancing.
#
# Usage: STEPS=150000 STALL=900 tools/train_watchdog.sh [extra trainer args]
# Exits 0 when the trainer completes its full --steps run, 1 after
# MAX_ATTEMPTS launches without completing.
#
# STALL defaults to 900 s: a cold (uncached) compile of the 96 px train
# step takes ~10 min of log silence on a slow tunnel day, and the step
# log only prints every 100 steps — a 300 s trigger would SIGKILL
# mid-compile forever (nothing lands in the compile cache until a
# compile finishes).

set -u
cd "$(dirname "$0")/.."

STEPS=${STEPS:-150000}
STALL=${STALL:-900}          # seconds of log silence before a restart
MAX_ATTEMPTS=${MAX_ATTEMPTS:-50}
RUN_DIR=${RUN_DIR:-_ckpt_run}
LOG="$RUN_DIR/watchdog_train.log"
mkdir -p "$RUN_DIR"

attempt=0
while [ "$attempt" -lt "$MAX_ATTEMPTS" ]; do
  attempt=$((attempt + 1))
  echo "== watchdog: launch attempt $attempt ($(date -u +%H:%M:%S))" >> "$LOG"
  start=$(date +%s)
  python tools/train_shipped_ckpt.py \
      --steps "$STEPS" --batch 8 --patch 96 --seq 6 --domains 8 --days 6 \
      --save-every 2000 --ckpt-dir "$RUN_DIR/orbax" \
      --out "$RUN_DIR/generator-candidate.npz" --resume "$@" \
      >> "$LOG" 2>&1 &
  pid=$!
  echo "$pid" > "$RUN_DIR/trainer.pid"
  while kill -0 "$pid" 2>/dev/null; do
    sleep 60
    age=$(( $(date +%s) - $(stat -c %Y "$LOG") ))
    if [ "$age" -gt "$STALL" ]; then
      echo "== watchdog: no log progress for ${age}s, restarting" >> "$LOG"
      kill "$pid" 2>/dev/null
      sleep 5
      kill -9 "$pid" 2>/dev/null
      break
    fi
  done
  if wait "$pid"; then
    echo "== watchdog: trainer completed" >> "$LOG"
    exit 0
  fi
  # A launch that died in under a minute is a deterministic failure
  # (bad flag, import error, OOM) — don't hot-loop on it.
  if [ $(( $(date +%s) - start )) -lt 60 ]; then
    echo "== watchdog: trainer exited immediately, backing off 60s" >> "$LOG"
    sleep 60
  fi
done
echo "== watchdog: giving up after $MAX_ATTEMPTS attempts" >> "$LOG"
exit 1
