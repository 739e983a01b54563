#!/usr/bin/env bash
# Flakiness harness — twin of the reference's test-mr-many.sh
# (/root/reference/src/main/test-mr-many.sh:15-23): run the full
# ScalaTest suite N times, fail fast on the first failing trial, with
# a per-trial timeout. Backs the "flake-free across repeated runs"
# claim with something runnable:
#
#     scripts/test-many.sh 3
set -u

if [ $# -ne 1 ]; then
    echo "Usage: $0 numTrials"
    exit 1
fi

cd "$(dirname "$0")/.."

# plain $pid, not -$pid: a background child of a non-interactive
# script shares this script's process group, so a group kill never
# reaches it when the signal came via `kill` rather than Ctrl-C
trap 'kill -INT "$pid" 2>/dev/null; exit 1' INT

runs=$1
for i in $(seq 1 "$runs"); do
    echo "=== trial $i/$runs ==="
    timeout -k 10s 1800s sbt -batch test &
    pid=$!
    if ! wait $pid; then
        echo '***' FAILED TESTS IN TRIAL "$i"
        exit 1
    fi
done
echo '***' PASSED ALL "$i" TESTING TRIALS
