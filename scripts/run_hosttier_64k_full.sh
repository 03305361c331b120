#!/bin/bash
# Full 64k[1]-n32k-512 round trip on the real TPU chip via the
# host-streamed tier (scripts/hosttier_64k.py --full). Waits out a
# wedged tunnel first (fresh-process probes, same pattern as
# scripts/bench_backlog.py), then runs with resumable state under
# /root/state64k. Expected ~4 h end to end (tunnel-bandwidth bound):
# prepare ~80 min, 147 columns ~75 min, finish+RMSE ~90 min.
set -u
cd "$(dirname "$0")/.."

probe() {
  timeout 360 python -c "import jax, jax.numpy as jnp; x = jnp.ones((256, 256), jnp.bfloat16); print('ALIVE', float((x @ x).sum()))" 2>/dev/null | grep -q ALIVE
}

for i in $(seq 1 120); do
  if probe; then
    echo "[$(date +%T)] chip alive; launching full 64k run"
    break
  fi
  echo "[$(date +%T)] chip not responding (attempt $i); sleeping 300s"
  sleep 300
done

# state lives INSIDE the repo (gitignored): /root/state64k was a
# different path from where round 4 actually left its state, and the
# mismatch silently restarted the multi-hour prepare from facet 0.
# Loop on resumable exits: 3 = voluntary RSS-guard exit, 137 = the OOM
# killer got there first — both resume from the per-facet/column
# markers in the state dir.
for attempt in $(seq 1 12); do
  python scripts/hosttier_64k.py --platform tpu --full \
    --state_dir state64k --ckpt_every 30 \
    --out validation/hosttier_64k_full.json
  rc=$?
  if [ $rc -eq 0 ]; then
    exit 0
  fi
  if [ $rc -ne 3 ] && [ $rc -ne 137 ]; then
    echo "[$(date +%T)] non-resumable exit rc=$rc; stopping"
    exit $rc
  fi
  echo "[$(date +%T)] resumable exit rc=$rc (attempt $attempt); restarting"
  sleep 30
done
