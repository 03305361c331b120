"""Sparse-facet streaming demo: facets cover only a circular FoV.

The reference's `scripts/demo_sparse_facet.py` on the TPU-native runtime:
the facet list comes from
:func:`ska_sdp_distributed_fourier_transform_tpu.sparse.make_sparse_facet_cover`
(FoV diameter 2.12x the facet size, the reference's choice,
demo_sparse_facet.py:209), subgrids still cover the full image, and
``--check_subgrid`` verifies every produced subgrid against the direct-DFT
oracle on the fly.
"""

import logging
import time

import numpy

from utils import cli_parser, setup_platform

from ska_sdp_distributed_fourier_transform_tpu import (
    SWIFT_CONFIGS,
    SwiftlyBackward,
    SwiftlyConfig,
    SwiftlyForward,
    check_facet,
    check_subgrid,
    make_facet,
    make_full_subgrid_cover,
)
from ska_sdp_distributed_fourier_transform_tpu.sparse import (
    make_sparse_facet_cover,
)

logging.basicConfig(level=logging.INFO, format="%(message)s")
log = logging.getLogger("fourier-logger")
log.setLevel(logging.INFO)


def demo_api(queue_size, fundamental_params, lru_forward, lru_backward,
             check_subgrids, source_count, backend="jax"):
    """Sparse-facet forward+backward stream
    (reference demo_sparse_facet.py:184-290)."""

    def process_subgrid(subgrid_config, subgrid_task):
        """Pass-through hook for gridding/degridding."""
        return subgrid_task

    swiftlyconfig = SwiftlyConfig(backend=backend, **fundamental_params)
    sources = [(1, i + 1, i) for i in range(source_count)]

    subgrid_config_list = make_full_subgrid_cover(swiftlyconfig)

    # Sparse facet cover over a circular FoV (reference: 2.12 * yB)
    fov_pixel = int(2.12 * swiftlyconfig.max_facet_size)
    facets_config_list = make_sparse_facet_cover(swiftlyconfig, fov_pixel)
    log.info(
        "sparse cover: %d facets (full cover would need %d)",
        len(facets_config_list),
        (swiftlyconfig.image_size // swiftlyconfig.max_facet_size + 1) ** 2,
    )

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

        sg_err_str = ""
        if check_subgrids:
            sg_err = check_subgrid(
                swiftlyconfig.image_size, subgrid_config, new_subgrid_task,
                sources,
            )
            sg_err_str = f", err: {sg_err}"
        log.info(
            "process subgrid off0: %d, off1: %d%s",
            subgrid_config.off0, subgrid_config.off1, sg_err_str,
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


def demo_sharded(fundamental_params, source_count, engine_mode="matmul"):
    """Sparse facet cover through the dense sharded engine: masks and
    per-facet offsets make sparse a special case of the dense layout."""
    import jax

    from ska_sdp_distributed_fourier_transform_tpu.parallel import (
        ShardedSwiftly,
        make_tile_mesh,
    )

    swiftlyconfig = SwiftlyConfig(
        dtype=(None if jax.devices()[0].platform == "cpu"
               else jax.numpy.complex64),
        **fundamental_params,
    )
    sources = [(1, i + 1, i) for i in range(source_count)]
    subgrid_config_list = make_full_subgrid_cover(swiftlyconfig)
    fov_pixel = int(2.12 * swiftlyconfig.max_facet_size)
    facets_config_list = make_sparse_facet_cover(swiftlyconfig, fov_pixel)
    log.info("sparse cover: %d facets", len(facets_config_list))

    engine = ShardedSwiftly(
        swiftlyconfig._core, facets_config_list, subgrid_config_list,
        make_tile_mesh(), engine_mode=engine_mode,
    )
    facets = [
        make_facet(swiftlyconfig.image_size, cfg, sources)
        for cfg in facets_config_list
    ]
    packed = engine.pack_facets(facets)
    facets_out, n_subgrids = engine.roundtrip(packed)

    from ska_sdp_distributed_fourier_transform_tpu.utils import (
        get_complex,
    )

    errors = []
    for i, cfg in enumerate(facets_config_list):
        err = check_facet(
            swiftlyconfig.image_size, cfg, get_complex(facets_out[i]),
            sources,
        )
        errors.append(err)
        log.info("error facet, off0/off1:%d/%d: %e", cfg.off0, cfg.off1,
                 err)
    return n_subgrids, errors


def main(args):
    """Run the sparse demo for each requested configuration."""
    setup_platform(args)
    numpy.random.seed(123456789)

    for key in args.swift_config.split(","):
        if key not in SWIFT_CONFIGS:
            raise KeyError(
                f"Unknown configuration {key!r}; available: "
                f"{', '.join(sorted(SWIFT_CONFIGS))}"
            )
        t0 = time.perf_counter()
        if getattr(args, "sharded", False):
            n_subgrids, errors = demo_sharded(
                SWIFT_CONFIGS[key],
                args.source_number,
                args.engine_mode,
            )
        else:
            n_subgrids, errors = demo_api(
                args.queue_size,
                SWIFT_CONFIGS[key],
                args.lru_forward,
                args.lru_backward,
                args.check_subgrid,
                args.source_number,
                args.backend,
            )
        elapsed = time.perf_counter() - t0
        log.info(
            "%s: %d subgrids in %.2fs = %.2f subgrids/s; max facet "
            "error %e",
            key, n_subgrids, elapsed, n_subgrids / elapsed, max(errors),
        )


if __name__ == "__main__":
    parser = cli_parser()
    parser.add_argument(
        "--check_subgrid",
        action="store_true",
        help="Check every produced subgrid against the DFT oracle",
    )
    main(parser.parse_args())
