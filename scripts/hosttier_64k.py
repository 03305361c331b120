"""Bounded host-tier session at a 64k-class catalogue entry.

Executes REAL 64k columns through ``StreamedSwiftly`` (facet state in
host RAM, bounded per-column device working set) and records measured
memory against ``utils.memory_plan``'s prediction — converting the
64k/128k capability claim from modeled to demonstrated (the reference
only runs these configs on 512 GiB cluster nodes,
reference slurm_scripts/run_distr_single_csd3.slurm +
swift_configs.py:30-40).

On this 125 GiB box the run needs ``accum_dtype=complex64`` (the
default complex128 accumulator alone would be 106 GiB at
64k[1]-n32k-512) and builds oracle facets lazily (one at a time, c64).

Run (CPU, ~2-4 h for 2 columns on one core):
    python scripts/hosttier_64k.py --columns 2
"""

from __future__ import annotations

import argparse
import json
import os
import resource
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def log(*args):
    print(f"[{time.strftime('%H:%M:%S')}]", *args, file=sys.stderr,
          flush=True)


def rss_gib():
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024**2


class LazyFacets:
    """Sequence that builds each oracle facet on first access and keeps
    only the most recent one (prepare_facets reads them in order)."""

    def __init__(self, N, facet_configs, sources, dtype):
        self.N = N
        self.configs = facet_configs
        self.sources = sources
        self.dtype = dtype
        self._cache = (None, None)

    def __len__(self):
        return len(self.configs)

    def __getitem__(self, fi):
        import numpy as np

        from ska_sdp_distributed_fourier_transform_tpu.api_helper import (
            make_facet,
        )

        if self._cache[0] == fi:
            return self._cache[1]
        t0 = time.time()
        arr = np.asarray(
            make_facet(self.N, self.configs[fi], self.sources),
            dtype=self.dtype,
        )
        log(f"built facet {fi} in {time.time() - t0:.0f}s "
            f"(rss {rss_gib():.1f} GiB)")
        self._cache = (fi, arr)
        return arr


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--swift_config", default="64k[1]-n32k-512")
    ap.add_argument("--columns", type=int, default=2)
    ap.add_argument("--batch_chunk", type=int, default=48,
                    help="subgrids per device dispatch (bounds the "
                    "column working set)")
    ap.add_argument("--platform", default="cpu", choices=["cpu", "tpu"])
    ap.add_argument("--accum_dtype", default="complex64",
                    choices=["complex64", "complex128"])
    ap.add_argument("--out", default="validation/hosttier_64k_cpu.json")
    args = ap.parse_args()

    import jax

    if args.platform == "cpu":
        # the axon TPU plugin ignores JAX_PLATFORMS; only the config
        # knob works, and it must run before any backend query
        jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from ska_sdp_distributed_fourier_transform_tpu import (
        SwiftlyConfig,
        make_full_facet_cover,
        make_full_subgrid_cover,
    )
    from ska_sdp_distributed_fourier_transform_tpu.parallel import (
        StreamedSwiftly,
    )
    from ska_sdp_distributed_fourier_transform_tpu.swift_configs import (
        SWIFT_CONFIGS,
    )
    from ska_sdp_distributed_fourier_transform_tpu.utils.memory_plan import (
        plan_config,
    )

    params = dict(SWIFT_CONFIGS[args.swift_config])
    accum_bytes = 8 if args.accum_dtype == "complex64" else 16
    plan = plan_config(params, 1, name=args.swift_config,
                       host_accum_bytes=accum_bytes)
    log(plan.summary())
    log(f"modeled host bytes: {plan.host_bytes / 1024**3:.1f} GiB; "
        f"modeled host-tier device peak: "
        f"{plan.host_peak_device / 1024**3:.2f} GiB")

    config = SwiftlyConfig(dtype=np.complex64, **params)
    fcs = make_full_facet_cover(config)
    sgs = make_full_subgrid_cover(config)
    N = config.image_size
    sources = [(1.0, N // 8, -N // 8), (0.5, -N // 3, N // 5)]

    engine = StreamedSwiftly(
        config._core, fcs, sgs, batch_chunk=args.batch_chunk,
        accum_dtype=args.accum_dtype,
    )

    facets = LazyFacets(N, fcs, sources, np.complex64)
    t0 = time.time()
    engine.prepare_facets(facets)
    t_prep = time.time() - t0
    facets._cache = (None, None)  # free the last oracle facet
    bf_gib = engine._BF_F.nbytes / 1024**3
    log(f"prepared {len(fcs)} facets in {t_prep:.0f}s; BF_F "
        f"{bf_gib:.1f} GiB host (rss {rss_gib():.1f} GiB)")

    engine.zero_accumulator()
    acc_gib = engine._accum.nbytes / 1024**3
    log(f"accumulator {acc_gib:.1f} GiB host "
        f"(rss {rss_gib():.1f} GiB)")

    C = min(args.columns, engine.plan.n_columns)
    col_times = []
    n_sg = 0
    for ci in range(C):
        t0 = time.time()
        engine.process_column(ci)
        col_times.append(round(time.time() - t0, 1))
        n_sg += len(engine.plan.configs[ci])
        log(f"column {ci + 1}/{engine.plan.n_columns} "
            f"({col_times[-1]:.0f}s, {n_sg} subgrids, "
            f"rss {rss_gib():.1f} GiB)")

    # accumulator must be non-trivially populated by the executed
    # columns (the backward fold actually landed)
    touched = float(np.abs(engine._accum).max())
    assert touched > 0.0, "backward fold wrote nothing"

    result = {
        "config": args.swift_config,
        "tier": "host-streamed",
        "platform": args.platform,
        "accum_dtype": args.accum_dtype,
        "batch_chunk": args.batch_chunk,
        "columns_executed": C,
        "n_columns_total": engine.plan.n_columns,
        "subgrids_executed": n_sg,
        "prepare_s": round(t_prep, 1),
        "column_s": col_times,
        "accum_abs_max": touched,
        "measured": {
            "BF_F_gib": round(bf_gib, 2),
            "accum_gib": round(acc_gib, 2),
            "peak_rss_gib": round(rss_gib(), 2),
        },
        "modeled": {
            "host_gib": round(plan.host_bytes / 1024**3, 2),
            "device_peak_gib": round(
                plan.host_peak_device / 1024**3, 2
            ),
        },
    }
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))
    log(f"wrote {args.out}")


if __name__ == "__main__":
    main()
