# Runtime image for the TPU-native SwiFTly framework.
# The analogue of the reference's Dockerfile (python:3.10-slim + poetry
# requirements + jupyterlab); here: CPU JAX by default — install the TPU
# wheel (`pip install jax[tpu]`) when building for Cloud TPU hosts.
FROM python:3.12-slim

RUN apt-get update && apt-get install -y --no-install-recommends g++ \
    && rm -rf /var/lib/apt/lists/*

WORKDIR /app
COPY pyproject.toml README.md ./
COPY ska_sdp_distributed_fourier_transform_tpu ./ska_sdp_distributed_fourier_transform_tpu
COPY csrc ./csrc
COPY scripts ./scripts
COPY launch_scripts ./launch_scripts
COPY bench.py ./

RUN pip install --no-cache-dir .[checkpoint,test] h5py

# Pre-build the native backend so first use is instant
RUN python -c "from ska_sdp_distributed_fourier_transform_tpu.ops.native import load_library; load_library()"

CMD ["python", "scripts/demo_api.py", "--swift_config", "1k[1]-n512-256"]
