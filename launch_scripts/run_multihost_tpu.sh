#!/usr/bin/env bash
# Launch the multi-host streaming demo on a Cloud TPU pod slice.
#
# The analogue of the reference's slurm launchers
# (slurm_scripts/run_distr_single_csd3.slurm: 1 dask-scheduler + N
# dask-workers, then the demo). On TPU there is no scheduler: the same
# SPMD program starts on every pod worker and jax.distributed wires them.
#
# Usage:
#   TPU_NAME=my-pod ZONE=us-central2-b ./run_multihost_tpu.sh \
#       --swift_config 64k[1]-n32k-512 --engine_mode matmul
set -euo pipefail

TPU_NAME="${TPU_NAME:?set TPU_NAME to the TPU VM/pod name}"
ZONE="${ZONE:?set ZONE}"
REPO_DIR="${REPO_DIR:-\$HOME/ska-sdp-distributed-fourier-transform-tpu}"

gcloud compute tpus tpu-vm ssh "${TPU_NAME}" --zone "${ZONE}" \
  --worker=all \
  --command="cd ${REPO_DIR} && python launch_scripts/demo_multihost.py $*"
