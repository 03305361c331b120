#!/bin/bash
# COMPLETE 128k round trip on the real TPU chip: sparse facet cover
# (4 facets over a 29184-pixel FoV — the reference's demo_sparse_facet
# workload) at 128k[1]-n16k-1k through the host-streamed tier. Full
# covers at 128k need 155-310 GiB of host state (every catalogue
# entry; beyond this box) — the sparse cover is 2 x 7.1 GiB and makes
# N=131072 executable end to end. Resumable state under state128k/;
# loops on exit 3 (RSS guard) / 137 (OOM) like the 64k wrapper.
set -u
cd "$(dirname "$0")/.."

probe() {
  timeout 360 python -c "import jax, jax.numpy as jnp; x = jnp.ones((256, 256), jnp.bfloat16); print('ALIVE', float((x @ x).sum()))" 2>/dev/null | grep -q ALIVE
}

for i in $(seq 1 60); do
  if probe; then
    echo "[$(date +%T)] chip alive; launching 128k sparse full run"
    break
  fi
  echo "[$(date +%T)] chip not responding (attempt $i); sleeping 300s"
  sleep 300
done

for attempt in $(seq 1 12); do
  python scripts/hosttier_64k.py --platform tpu --full \
    --swift_config "128k[1]-n16k-1k" --sparse_fov_pixel 29184 \
    --state_dir state128k --ckpt_every 64 \
    --out validation/hosttier_128k_sparse_full.json
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
