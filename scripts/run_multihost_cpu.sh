#!/usr/bin/env bash
# Two-process multi-host validation on ONE machine (CPU backend):
# exercises jax.distributed.initialize + the global ('map','kf') mesh +
# the Z-sharded mapping program across process boundaries.
# Real TPU pods: run scripts/multihost_demo.py (or run_slam.py
# --process-id I with parallel.n_processes set) once per host instead —
# docs/MULTIHOST.md.
set -euo pipefail
cd "$(dirname "$0")/.."

PORT="${PORT:-9876}"
N="${N:-2}"

pids=()
for ((i=1; i<N; i++)); do
  python scripts/multihost_demo.py \
    --num-processes "$N" --process-id "$i" --coordinator "localhost:$PORT" &
  pids+=($!)
done
python scripts/multihost_demo.py \
  --num-processes "$N" --process-id 0 --coordinator "localhost:$PORT"
for p in "${pids[@]}"; do wait "$p"; done
echo "multihost cpu validation: OK ($N processes)" >&2
