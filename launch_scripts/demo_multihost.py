"""Multi-host entry point: the sharded streaming demo on a TPU pod slice.

The analogue of the reference's slurm launchers
(`/root/reference/slurm_scripts/run_distr_single_csd3.slurm`: stand up a
dask scheduler + workers, then run the demo). On TPU there is no
scheduler process — every host runs this same SPMD program;
``jax.distributed.initialize()`` wires the pod, the engine's mesh spans
all global devices, and XLA routes the psum_scatter/all_to_all over ICI.

Run on every worker of a pod slice (see run_multihost_tpu.sh):

    python launch_scripts/demo_multihost.py --swift_config 16k[1]-n8k-512
"""

import logging
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

logging.basicConfig(level=logging.INFO, format="%(message)s")
log = logging.getLogger("fourier-logger")


def main():
    import argparse

    ap = argparse.ArgumentParser(fromfile_prefix_chars="@")
    ap.add_argument("--swift_config", default="16k[1]-n8k-512")
    ap.add_argument("--source_number", type=int, default=8)
    ap.add_argument("--engine_mode", default="pallas",
                    choices=["matmul", "pallas", "fft"])
    ap.add_argument("--fft_impl", default="mxu", choices=["mxu", "xla"])
    ap.add_argument("--checkpoint", default=None,
                    help="stream-state checkpoint path (resume-safe)")
    ap.add_argument("--checkpoint_every", type=int, default=8)
    ap.add_argument("--coordinator", default=None,
                    help="coordinator address for jax.distributed "
                    "(auto-detected on Cloud TPU)")
    args = ap.parse_args()

    import jax

    # On Cloud TPU pods initialize() autodetects coordinator/process_id.
    # Must run before ANY backend query (even jax.process_count()), so
    # gate purely on environment/flags.
    multi_worker = "," in os.environ.get("TPU_WORKER_HOSTNAMES", "")
    if args.coordinator or multi_worker:
        jax.distributed.initialize(coordinator_address=args.coordinator)

    import jax.numpy as jnp
    import numpy as np

    from ska_sdp_distributed_fourier_transform_tpu import (
        SWIFT_CONFIGS,
        SwiftlyConfig,
        make_facet,
        make_full_facet_cover,
        make_full_subgrid_cover,
    )
    from ska_sdp_distributed_fourier_transform_tpu.parallel import (
        ShardedSwiftly,
        make_tile_mesh,
    )
    from ska_sdp_distributed_fourier_transform_tpu.utils import (
        StreamCheckpointer,
        device_rmse,
    )

    pid, nproc = jax.process_index(), jax.process_count()
    log.info("process %d/%d, %d global devices", pid, nproc,
             len(jax.devices()))

    params = dict(SWIFT_CONFIGS[args.swift_config])
    N = params["N"]
    rng = np.random.default_rng(123456789)  # same seed on every host
    sources = [
        (1.0, int(rng.integers(-N // 2, N // 2)),
         int(rng.integers(-N // 2, N // 2)))
        for _ in range(args.source_number)
    ]

    config = SwiftlyConfig(dtype=jnp.complex64, **params)
    facet_cfgs = make_full_facet_cover(config)
    sg_cfgs = make_full_subgrid_cover(config)
    engine = ShardedSwiftly(
        config._core, facet_cfgs, sg_cfgs, make_tile_mesh(),
        engine_mode=args.engine_mode, fft_impl=args.fft_impl,
    )

    facets = [make_facet(N, cfg, sources) for cfg in facet_cfgs]
    packed = engine.pack_facets(facets)

    t0 = time.perf_counter()
    n_subgrids = sum(len(c) for c in engine.plan.configs)
    if args.checkpoint:
        # resumable: per-column programs, checkpointed accumulator
        BF_F = engine.prepare_facets(packed)
        ckpt = StreamCheckpointer(engine, args.checkpoint,
                                  every=args.checkpoint_every)
        accum, start = ckpt.resume()
        if pid == 0 and start:
            log.info("resuming at column %d", start)
        for ci in range(start, engine.plan.n_columns):
            sg = engine.forward_column(BF_F, ci)
            accum = engine.backward_column(sg, ci, accum)
            accum = ckpt.step(accum, ci)
        facets_out = engine.finish_facets(accum)
    else:
        # fastest path: the whole stream as one compiled program
        facets_out, _ = engine.roundtrip(packed)
    jax.block_until_ready(facets_out)
    elapsed = time.perf_counter() - t0

    rmse = float(device_rmse(facets_out, packed))
    if pid == 0:
        log.info(
            "%s: %d subgrids in %.2fs = %.2f subgrids/s on %d chips; "
            "round-trip RMSE %.3e",
            args.swift_config, n_subgrids, elapsed,
            n_subgrids / elapsed, len(jax.devices()), rmse,
        )


if __name__ == "__main__":
    main()
