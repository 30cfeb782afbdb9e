#!/bin/bash
# Hang-tolerant TPU runner: the axon remote-compile helper sometimes
# wedges (SIGSEGV mid-request -> client recv blocks forever).  Progress
# ratchets through the persistent XLA compile cache, so killing and
# retrying converges.  Usage: retry_run.sh <per-try-timeout-s> <tries> cmd...
T=$1; N=$2; shift 2
for i in $(seq 1 "$N"); do
  timeout --signal=KILL "$T" "$@"
  rc=$?
  if [ $rc -ne 137 ] && [ $rc -ne 124 ]; then
    echo "[retry_run] attempt $i exited rc=$rc"
    exit $rc
  fi
  echo "[retry_run] attempt $i timed out (rc=$rc); retrying"
done
exit 124
