"""Production-shaped multi-chip validation on a virtual CPU mesh.

Runs a full streaming round trip of a real catalogue config on an
n-device mesh (CPU virtual devices — the same program, shardings and
collectives as real chips), asserts the round-trip RMSE, and checks the
engine's declared collective bytes against the analytic model.

The reference's demonstrated cluster workload is ``32k[1]-n16k-1k`` on
9 CSD3 nodes (reference slurm_scripts/run_distr_single_csd3.slurm,
submit_multi_queue_csd3.sh:4-8); this script validates the same config
end-to-end on a 9-device mesh (1 facet per device — the production
layout), within the per-device memory modeled by
:mod:`..utils.memory_plan`.

Examples::

    python scripts/multichip_validate.py --swift_config 8k[1]-n4k-512 \
        --devices 8 --rmse_bound 1e-5
    python scripts/multichip_validate.py --swift_config 32k[1]-n16k-1k \
        --devices 9 --engine_mode fft   # ~1 h on one CPU core
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def log(*args):
    print(*args, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--swift_config", default="8k[1]-n4k-512")
    ap.add_argument("--devices", type=int, default=8)
    ap.add_argument("--engine_mode", default="matmul",
                    choices=["matmul", "pallas", "fft"])
    ap.add_argument("--fused", action="store_true",
                    help="run the single-dispatch fused stream instead of "
                    "per-column driving (more RAM on a virtual mesh)")
    ap.add_argument("--rmse_bound", type=float, default=1e-5)
    ap.add_argument("--checkpoint", default=None,
                    help="checkpoint file for the per-column loop; an "
                    "existing matching checkpoint resumes mid-stream "
                    "(the 32k validation takes tens of hours on a "
                    "1-core host — this lets it span sessions)")
    ap.add_argument("--checkpoint_every", type=int, default=2)
    ap.add_argument("--stop_after_columns", type=int, default=None,
                    help="checkpoint and exit (code 3) after this many "
                    "columns this invocation — bounds one session's "
                    "work on a multi-session validation run")
    ap.add_argument("--source_number", type=int, default=3)
    ap.add_argument("--dtype", default="complex64",
                    choices=["complex64", "complex128"])
    args = ap.parse_args()

    # Force the CPU platform with N virtual devices before jax init.
    # The collective rendezvous timeouts must be raised: on a single
    # host the virtual devices execute serially, so at production
    # per-column compute the last participant reaches an all_to_all
    # minutes after the first (XLA's default 40 s terminates the run).
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        flags += f" --xla_force_host_platform_device_count={args.devices}"
    if "xla_cpu_collective_timeout" not in flags:
        flags += (" --xla_cpu_collective_timeout_seconds=7200"
                  " --xla_cpu_collective_call_terminate_timeout_seconds"
                  "=7200")
    os.environ["XLA_FLAGS"] = flags.strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    if args.dtype == "complex128":
        jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    import numpy as np

    from ska_sdp_distributed_fourier_transform_tpu import (
        SwiftlyConfig,
        make_facet,
        make_full_facet_cover,
        make_full_subgrid_cover,
    )
    from ska_sdp_distributed_fourier_transform_tpu.parallel import (
        ShardedSwiftly,
        make_tile_mesh,
    )
    from ska_sdp_distributed_fourier_transform_tpu.swift_configs import (
        SWIFT_CONFIGS,
    )
    from ska_sdp_distributed_fourier_transform_tpu.utils import (
        engine_collective_bytes,
        plan_config,
    )
    from ska_sdp_distributed_fourier_transform_tpu.utils.transfer import (
        put_complex,
    )

    params = dict(SWIFT_CONFIGS[args.swift_config])
    N = params["N"]

    plan = plan_config(params, args.devices, name=args.swift_config)
    log(plan.summary())
    if not plan.fits_device:
        log("WARNING: config is modeled host-tier at this mesh size")

    config = SwiftlyConfig(dtype=jnp.dtype(args.dtype), **params)
    fc = make_full_facet_cover(config)
    sc = make_full_subgrid_cover(config)
    mesh = make_tile_mesh(args.devices)
    engine = ShardedSwiftly(config._core, fc, sc, mesh,
                            engine_mode=args.engine_mode)

    rng = np.random.default_rng(1)
    sources = [
        (float(rng.normal()), int(rng.integers(-N // 2, N // 2)),
         int(rng.integers(-N // 2, N // 2)))
        for _ in range(args.source_number)
    ]

    # Build facets one at a time (a dense [F_pad, yB, yB] host staging
    # array would dominate RAM at 32k scale), then RMSE against per-facet
    # rebuilt oracles — no second device copy.
    log("building facets...")
    yB = engine.yB_size
    import numpy as _np

    packed_host = None  # built incrementally on device instead
    parts = []
    for i, cfg in enumerate(fc):
        parts.append(_np.asarray(make_facet(N, cfg, sources)))
    zeros = _np.zeros((yB, yB), dtype=parts[0].dtype)
    stacked = _np.stack(parts + [zeros] * (engine.F_pad - len(fc)))
    del parts
    packed = put_complex(stacked, engine._shard, dtype=engine.core.dtype)
    del stacked, packed_host

    # Collective accounting (declared in the compiled HLO).
    log("collective accounting...")
    coll = engine_collective_bytes(engine)
    for name, info in coll.items():
        log(f"  {name}: " + ", ".join(
            f"{k}={v}" for k, v in sorted(info.items())))

    log("round trip...")
    t0 = time.perf_counter()
    if args.fused:
        out, n_sg = engine.roundtrip(packed, fused=True)
    else:
        # per-column driving with progress logging (hours-long on a
        # single-core virtual mesh — the log is the progress record)
        BF_F = engine.prepare_facets(packed)
        log(f"prepared in {time.perf_counter() - t0:.0f}s")
        if args.checkpoint:
            from ska_sdp_distributed_fourier_transform_tpu.utils import (
                StreamCheckpointer,
            )

            ckpt = StreamCheckpointer(
                engine, args.checkpoint, every=args.checkpoint_every,
                extra={
                    "config": args.swift_config,
                    "engine_mode": args.engine_mode,
                    "dtype": args.dtype,
                    "sources": sources,
                },
            )
            accum, start = ckpt.resume()
            if start:
                log(f"resumed from checkpoint at column {start}")
        else:
            ckpt, start = None, 0
            accum = engine.zero_accumulator()
        n_sg = sum(
            len(engine.plan.configs[ci]) for ci in range(start)
        )
        for ci in range(start, engine.plan.n_columns):
            sg = engine.forward_column(BF_F, ci)
            accum = engine.backward_column(sg, ci, accum)
            accum.block_until_ready()
            if ckpt is not None:
                accum = ckpt.step(accum, ci)
            n_sg += len(engine.plan.configs[ci])
            log(f"column {ci + 1}/{engine.plan.n_columns} done "
                f"({time.perf_counter() - t0:.0f}s)")
            if (args.stop_after_columns is not None
                    and ci + 1 - start >= args.stop_after_columns
                    and ci + 1 < engine.plan.n_columns):
                if ckpt is not None and (ci + 1) % ckpt.every:
                    ckpt.every = 1  # force the due-check
                    accum = ckpt.step(accum, ci)
                log(f"stopping after {ci + 1 - start} columns "
                    "(--stop_after_columns); resume with the same "
                    "--checkpoint")
                sys.exit(3)
        del BF_F
        out = engine.finish_facets(accum)
    out.block_until_ready()
    elapsed = time.perf_counter() - t0

    # RMSE per facet against rebuilt oracles.
    worst = 0.0
    for i, cfg in enumerate(fc):
        oracle = _np.asarray(make_facet(N, cfg, sources))
        got = _np.asarray(jnp.real(out[i])) + 1j * _np.asarray(
            jnp.imag(out[i])
        )
        worst = max(worst, float(
            _np.sqrt(_np.mean(_np.abs(got - oracle) ** 2))
        ))
    ok = worst < args.rmse_bound
    result = {
        "config": args.swift_config,
        "devices": args.devices,
        "engine_mode": args.engine_mode,
        "dtype": args.dtype,
        "n_subgrids": n_sg,
        "elapsed_s": round(elapsed, 1),
        "rmse": worst,
        "rmse_bound": args.rmse_bound,
        "ok": bool(ok),
        "modeled_peak_gib": round(plan.peak / 1024**3, 2),
        "collective_bytes": {
            k: v.get("total", 0) for k, v in coll.items()
        },
    }
    print(json.dumps(result))
    if not ok:
        sys.exit(1)


if __name__ == "__main__":
    main()
