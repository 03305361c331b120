"""Error-map generation: spatial distribution of the scheme's error.

The reference notebook's methodology (facet-subgrid-impl.ipynb cells
23-29): run the full facet->subgrid->facet round trip for a source set
and image the per-pixel deviation from the oracle, per facet — showing
the characteristic structure (error growth toward facet edges where the
grid correction Fb amplifies window leakage, aliasing floors elsewhere).

Outputs one ``error_map_f<i>.npy`` per facet (|approx - oracle|, float64)
plus a summary line per facet; optionally a subgrid-side map per subgrid
with ``--subgrid_maps``.
"""

import logging
import os

import numpy

from utils import cli_parser, setup_platform

from ska_sdp_distributed_fourier_transform_tpu import (
    SWIFT_CONFIGS,
    SwiftlyBackward,
    SwiftlyConfig,
    SwiftlyForward,
    make_facet,
    make_full_facet_cover,
    make_full_subgrid_cover,
    make_subgrid,
)
from ska_sdp_distributed_fourier_transform_tpu.api_helper import (
    make_facet as oracle_facet,
)

logging.basicConfig(level=logging.INFO, format="%(message)s")
log = logging.getLogger("fourier-logger")


def main(args):
    """Generate the error maps for one configuration."""
    setup_platform(args)
    params = SWIFT_CONFIGS[args.swift_config]
    config = SwiftlyConfig(backend=args.backend, **params)
    N = config.image_size

    rng = numpy.random.default_rng(123456789)
    sources = [
        (1.0, int(rng.integers(-N // 4, N // 4)),
         int(rng.integers(-N // 4, N // 4)))
        for _ in range(args.source_number)
    ]

    facet_configs = make_full_facet_cover(config)
    subgrid_configs = make_full_subgrid_cover(config)
    facet_tasks = [
        (cfg, make_facet(N, cfg, sources)) for cfg in facet_configs
    ]
    fwd = SwiftlyForward(config, facet_tasks, args.lru_forward,
                         args.queue_size)
    bwd = SwiftlyBackward(config, facet_configs, args.lru_backward,
                          args.queue_size)

    os.makedirs(args.out_dir, exist_ok=True)
    for sg_cfg in subgrid_configs:
        sg = fwd.get_subgrid_task(sg_cfg)
        if args.subgrid_maps:
            oracle = make_subgrid(N, sg_cfg, sources)
            emap = numpy.abs(numpy.asarray(sg) - oracle)
            numpy.save(
                os.path.join(
                    args.out_dir,
                    f"error_map_sg{sg_cfg.off0}_{sg_cfg.off1}.npy",
                ),
                emap,
            )
        bwd.add_new_subgrid_task(sg_cfg, sg)
    approx_facets = bwd.finish()

    for i, (cfg, approx) in enumerate(zip(facet_configs, approx_facets)):
        oracle = oracle_facet(N, cfg, sources)
        emap = numpy.abs(numpy.asarray(approx) - oracle)
        numpy.save(
            os.path.join(args.out_dir, f"error_map_f{i}.npy"), emap
        )
        # edge vs centre structure (the notebook's headline observation)
        q = cfg.size // 4
        centre = emap[q : -q, q : -q]
        log.info(
            "facet %d (off0=%d, off1=%d): max %.3e  rms %.3e  "
            "centre-rms %.3e  edge-amplification %.1fx",
            i, cfg.off0, cfg.off1, emap.max(),
            numpy.sqrt((emap**2).mean()),
            numpy.sqrt((centre**2).mean()),
            emap.max() / max(numpy.sqrt((centre**2).mean()), 1e-300),
        )
    log.info("maps written to %s", args.out_dir)


if __name__ == "__main__":
    parser = cli_parser()
    parser.add_argument("--out_dir", default="error_maps",
                        help="directory for the .npy maps")
    parser.add_argument("--subgrid_maps", action="store_true",
                        help="also write per-subgrid error maps")
    main(parser.parse_args())
