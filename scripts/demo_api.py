"""End-to-end streaming demo: full-cover facet -> subgrid -> facet.

The reference's `scripts/demo_api.py` on the TPU-native runtime. Two
execution paths:

* default: the tile-streaming API (`SwiftlyForward`/`SwiftlyBackward`,
  per-tile async dispatch, LRU column caches, bounded queue) — drop-in
  for the reference's loop (demo_api.py:33-100);
* ``--sharded``: the dense multi-device engine (shard_map over the mesh,
  column-batched collectives);
* ``--host_tier``: the host-streamed tier for beyond-HBM configs
  (facet state in host RAM; ``--mesh_devices`` shards the per-column
  device working set).

Instrumentation mirrors the reference's (performance report, memory
sampling, transfer accounting — demo_api.py:125-148), emitted with the
TPU-native tooling: jax profiler traces, per-device HBM stats, exact
collective bytes from compiled HLO.
"""

import contextlib
import logging
import time

import numpy

from utils import (
    cli_parser,
    engine_collective_bytes,
    get_and_write_transfer,
    human_readable_size,
    setup_platform,
)

from ska_sdp_distributed_fourier_transform_tpu import (
    SWIFT_CONFIGS,
    SwiftlyBackward,
    SwiftlyConfig,
    SwiftlyForward,
    check_facet,
    make_facet,
    make_full_facet_cover,
    make_full_subgrid_cover,
)
from ska_sdp_distributed_fourier_transform_tpu.utils.observability import (
    MemorySampler,
    performance_report,
)

logging.basicConfig(level=logging.INFO, format="%(message)s")
log = logging.getLogger("fourier-logger")
log.setLevel(logging.INFO)


def demo_api(queue_size, fundamental_params, lru_forward, lru_backward,
             sources, backend="jax"):
    """Stream every subgrid out of the facets and back (the reference's
    demo loop, demo_api.py:33-100), returning per-facet errors."""

    def process_subgrid(subgrid_config, subgrid_task):
        """Pass-through hook marking where gridding/degridding plugs in."""
        return subgrid_task

    swiftlyconfig = SwiftlyConfig(backend=backend, **fundamental_params)

    subgrid_config_list = make_full_subgrid_cover(swiftlyconfig)
    facets_config_list = make_full_facet_cover(swiftlyconfig)

    facet_tasks = [
        (cfg, make_facet(swiftlyconfig.image_size, cfg, sources))
        for cfg in facets_config_list
    ]

    fwd = SwiftlyForward(swiftlyconfig, facet_tasks, lru_forward,
                         queue_size)
    bwd = SwiftlyBackward(swiftlyconfig, facets_config_list, lru_backward,
                          queue_size)

    for subgrid_config in subgrid_config_list:
        subgrid_task = fwd.get_subgrid_task(subgrid_config)
        new_subgrid_task = process_subgrid(subgrid_config, subgrid_task)
        bwd.add_new_subgrid_task(subgrid_config, new_subgrid_task)
        log.info(
            "process subgrid off0: %d, off1: %d",
            subgrid_config.off0,
            subgrid_config.off1,
        )

    new_facet_tasks = bwd.finish()

    errors = [
        check_facet(swiftlyconfig.image_size, cfg, new_facet, sources)
        for new_facet, cfg in zip(new_facet_tasks, facets_config_list)
    ]
    for cfg, error in zip(facets_config_list, errors):
        log.info("error facet, off0/off1:%d/%d: %e", cfg.off0, cfg.off1,
                 error)
    return len(subgrid_config_list), errors


def demo_sharded(fundamental_params, sources, engine_mode, transfer_info,
                 config_key, fft_impl="mxu", checkpoint=None,
                 checkpoint_every=8):
    """Same round trip on the dense sharded engine."""
    import jax

    from ska_sdp_distributed_fourier_transform_tpu.parallel import (
        ShardedSwiftly,
        make_tile_mesh,
    )
    from ska_sdp_distributed_fourier_transform_tpu.utils import (
        device_rmse,
    )

    swiftlyconfig = SwiftlyConfig(
        dtype=(None if jax.devices()[0].platform == "cpu"
               else jax.numpy.complex64),
        **fundamental_params,
    )
    facet_cfgs = make_full_facet_cover(swiftlyconfig)
    sg_cfgs = make_full_subgrid_cover(swiftlyconfig)
    engine = ShardedSwiftly(
        swiftlyconfig._core, facet_cfgs, sg_cfgs, make_tile_mesh(),
        engine_mode=engine_mode, fft_impl=fft_impl,
    )
    facets = [
        make_facet(swiftlyconfig.image_size, cfg, sources)
        for cfg in facet_cfgs
    ]
    packed = engine.pack_facets(facets)
    if checkpoint:
        from ska_sdp_distributed_fourier_transform_tpu.utils import (
            StreamCheckpointer,
        )

        ck = StreamCheckpointer(engine, checkpoint,
                                every=checkpoint_every)
        facets_out, n_subgrids = engine.roundtrip_checkpointed(
            packed, ck, segment=checkpoint_every
        )
    else:
        facets_out, n_subgrids = engine.roundtrip(packed)
    rmse = float(device_rmse(facets_out, packed))
    log.info("sharded round-trip RMSE (vs input facets): %e", rmse)

    if transfer_info:
        info = engine_collective_bytes(engine)
        per_stream = (
            info["prepare"]["total"]
            + engine.plan.n_columns
            * (info["fwd_column"]["total"] + info["bwd_column"]["total"])
            + info["finish"]["total"]
        )
        get_and_write_transfer(
            engine.lowered()["fwd_column"], transfer_info,
            key=f"{config_key}-fwd_column", executions=engine.plan.n_columns,
        )
        get_and_write_transfer(
            engine.lowered()["bwd_column"], transfer_info,
            key=f"{config_key}-bwd_column", executions=engine.plan.n_columns,
        )
        log.info(
            "collective bytes per stream (per device): %s",
            human_readable_size(per_stream),
        )
    return n_subgrids, [rmse]


def demo_host_tier(fundamental_params, sources, mesh_devices=None,
                   checkpoint=None, checkpoint_every=8):
    """Same round trip on the host-streamed tier (StreamedSwiftly):
    facet state in host RAM, one column's working set on device —
    optionally sharded over a mesh (--mesh_devices)."""
    import jax

    from ska_sdp_distributed_fourier_transform_tpu.parallel import (
        StreamedSwiftly,
        make_tile_mesh,
    )
    from ska_sdp_distributed_fourier_transform_tpu.utils import (
        plan_config,
    )

    swiftlyconfig = SwiftlyConfig(
        dtype=(None if jax.devices()[0].platform == "cpu"
               else jax.numpy.complex64),
        **fundamental_params,
    )
    n_dev = mesh_devices or 1
    plan = plan_config(fundamental_params, n_dev)
    log.info("%s", plan.summary())
    facet_cfgs = make_full_facet_cover(swiftlyconfig)
    sg_cfgs = make_full_subgrid_cover(swiftlyconfig)
    mesh = make_tile_mesh(mesh_devices) if mesh_devices else None
    engine = StreamedSwiftly(
        swiftlyconfig._core, facet_cfgs, sg_cfgs, mesh=mesh
    )
    facets = [
        make_facet(swiftlyconfig.image_size, cfg, sources)
        for cfg in facet_cfgs
    ]
    out, n_subgrids = engine.roundtrip(
        facets, checkpoint=checkpoint, checkpoint_every=checkpoint_every
    )
    errors = [
        check_facet(swiftlyconfig.image_size, cfg, numpy.asarray(f),
                    sources)
        for f, cfg in zip(out, facet_cfgs)
    ]
    for cfg, error in zip(facet_cfgs, errors):
        log.info("error facet, off0/off1:%d/%d: %e", cfg.off0, cfg.off1,
                 error)
    return n_subgrids, errors


def main(args):
    """Run the demo for each requested configuration."""
    setup_platform(args)
    numpy.random.seed(123456789)

    swift_config_keys = args.swift_config.split(",")
    for key in swift_config_keys:
        if key not in SWIFT_CONFIGS:
            raise KeyError(
                f"Unknown configuration {key!r}; available: "
                f"{', '.join(sorted(SWIFT_CONFIGS))}"
            )

    for key in swift_config_keys:
        params = SWIFT_CONFIGS[key]
        N = params["N"]
        rng = numpy.random.default_rng(123456789)
        sources = [
            (
                1.0,
                int(rng.integers(-N // 2, N // 2)),
                int(rng.integers(-N // 2, N // 2)),
            )
            for _ in range(args.source_number)
        ]

        mem = MemorySampler()
        profile = (
            performance_report(args.profile_dir)
            if args.profile_dir
            else contextlib.nullcontext()
        )
        t0 = time.perf_counter()
        with profile, mem.sample(key):
            if args.host_tier:
                n_subgrids, errors = demo_host_tier(
                    params, sources, args.mesh_devices,
                    args.checkpoint, args.checkpoint_every,
                )
            elif args.sharded:
                n_subgrids, errors = demo_sharded(
                    params, sources, args.engine_mode, args.transfer_info,
                    key, args.fft_impl, args.checkpoint,
                    args.checkpoint_every,
                )
            else:
                n_subgrids, errors = demo_api(
                    args.queue_size, params, args.lru_forward,
                    args.lru_backward, sources, args.backend,
                )
        elapsed = time.perf_counter() - t0

        log.info(
            "%s: %d subgrids in %.2fs = %.2f subgrids/s; max facet "
            "error %e; peak device memory %s",
            key, n_subgrids, elapsed, n_subgrids / elapsed,
            max(errors), human_readable_size(mem.peak())
            if mem.peak() == mem.peak() else "n/a",
        )
        if args.memory_csv:
            mem.to_csv(args.memory_csv)


if __name__ == "__main__":
    main(cli_parser().parse_args())
