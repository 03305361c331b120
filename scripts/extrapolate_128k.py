"""Measured bound for the 128k[1]-n32k-512 catalogue head entry.

The reference configures 128k-class problems for 320-512 GiB cluster
nodes (reference swift_configs.py:30-40 + slurm_scripts/
run_distr_single_csd3.slurm); this box has 125 GiB RAM and ~110 GiB
free disk. ``128k[1]-n16k-1k`` FITS (2 x 17.2 GiB host state) and is
executed for real by ``hosttier_64k.py --swift_config 128k[1]-n16k-1k``
— see validation/hosttier_128k_bounded.json. The head entry
``128k[1]-n32k-512`` does NOT fit: its facet state alone is ~212 GiB.
This script converts the MEASURED 64k[1]-n32k-512 full-run numbers
(validation/hosttier_64k_full.json) into a defensible time/resource
bound for the head entry — scaling prepare/finish by transferred bytes
per facet (the tunnel is the measured bottleneck at ~10-25 MB/s
effective) and the column phase by per-column window bytes — and names
the binding resource explicitly, per the round-4 verdict's option (b).
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

GIB = 1024 ** 3


def cfg_numbers(params):
    N, yN, yB = params["N"], params["yN_size"], params["yB_size"]
    xA, xM = params["xA_size"], params["xM_size"]
    F_axis = -(-N // yB)
    F = F_axis ** 2  # nfacet^2 (full cover)
    C = -(-N // xA)  # columns
    c = xM * yN // N  # contribution size per axis
    return dict(N=N, yN=yN, yB=yB, xA=xA, xM=xM, c=c,
                nfacet_axis=F_axis, nfacet=F, columns=C)


def facet_bytes(n):
    """Host<->device traffic per facet for prepare (or finish): the
    yB^2 facet goes down in yB-column chunks, the yN x yB BF_F rows
    come back — the tunnel-bound cost the 64k run measures."""
    return (n["yB"] * n["yB"] + n["yN"] * n["yB"]) * 8


def column_bytes(n):
    """Per-column window traffic: [nfacet, c, yN] down (forward windows)
    and the same back (backward fold rows), complex64."""
    return 2 * n["nfacet"] * n["c"] * n["yN"] * 8


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--measured",
                    default="validation/hosttier_64k_full.json")
    ap.add_argument("--target", default="128k[1]-n32k-512")
    ap.add_argument("--out",
                    default="validation/hosttier_128k_n32k512_bound.json")
    ap.add_argument("--prep_facets", type=int, default=None,
                    help="facets the measured prepare_s actually "
                    "covered (a resumed run times fewer than nfacet)")
    ap.add_argument("--prepare_s_per_facet", type=float, default=None,
                    help="override: measured prepare seconds per facet "
                    "(for multi-session runs whose final artifact only "
                    "records the last session's phases)")
    ap.add_argument("--column_s", type=float, default=None,
                    help="override: measured steady-state seconds per "
                    "column")
    ap.add_argument("--finish_s_per_facet", type=float, default=None,
                    help="override: measured finish seconds per facet")
    args = ap.parse_args()

    from ska_sdp_distributed_fourier_transform_tpu.swift_configs import (
        SWIFT_CONFIGS,
    )

    with open(args.measured) as f:
        m = json.load(f)
    src = cfg_numbers(SWIFT_CONFIGS[m["config"]])
    tgt = cfg_numbers(SWIFT_CONFIGS[args.target])

    # measured 64k phase times (CLI overrides for multi-session runs)
    n_prep_facets = args.prep_facets or m.get(
        "prepare_facets_measured", src["nfacet"]
    )
    prep_per_facet = (
        args.prepare_s_per_facet
        if args.prepare_s_per_facet is not None
        else m["prepare_s"] / max(1, n_prep_facets)
    )
    col_s = (
        args.column_s
        if args.column_s is not None
        else m["columns_s_total"] / max(1, m["columns_executed"])
    )
    fin_per_facet = (
        args.finish_s_per_facet
        if args.finish_s_per_facet is not None
        else m.get("finish_s", 0.0) / src["nfacet"]
    )

    # scale by bytes (tunnel-bound phases)
    f_scale = facet_bytes(tgt) / facet_bytes(src)
    c_scale = column_bytes(tgt) / column_bytes(src)
    est_prepare = prep_per_facet * f_scale * tgt["nfacet"]
    est_columns = col_s * c_scale * tgt["columns"]
    est_finish = fin_per_facet * f_scale * tgt["nfacet"]

    state_bytes = 2 * tgt["nfacet"] * tgt["yN"] * tgt["yB"] * 8
    ram = os.sysconf("SC_PAGE_SIZE") * os.sysconf("SC_PHYS_PAGES")
    disk_free = shutil.disk_usage("/").free

    result = {
        "target": args.target,
        "kind": "measured-extrapolation",
        "measured_source": {
            "artifact": args.measured,
            "config": m["config"],
            "prepare_s_per_facet": round(prep_per_facet, 1),
            "column_s": round(col_s, 1),
            "finish_s_per_facet": round(fin_per_facet, 1),
        },
        "scale_factors": {
            "facet_bytes": round(f_scale, 3),
            "column_bytes": round(c_scale, 3),
            "columns": tgt["columns"],
            "nfacet": tgt["nfacet"],
        },
        "estimated_runtime_s": {
            "prepare": round(est_prepare),
            "columns": round(est_columns),
            "finish": round(est_finish),
            "total": round(est_prepare + est_columns + est_finish),
            "total_h": round(
                (est_prepare + est_columns + est_finish) / 3600, 1
            ),
        },
        "state": {
            "bf_f_gib": round(state_bytes / 2 / GIB, 1),
            "accum_gib": round(state_bytes / 2 / GIB, 1),
            "total_gib": round(state_bytes / GIB, 1),
            "box_ram_gib": round(ram / GIB, 1),
            "box_disk_free_gib": round(disk_free / GIB, 1),
        },
        "binding_resource": (
            "host state: BF_F + accumulator = "
            f"{state_bytes / GIB:.0f} GiB complex64 exceeds this box's "
            f"{ram / GIB:.0f} GiB RAM and {disk_free / GIB:.0f} GiB "
            "free disk COMBINED; second binder is tunnel time "
            "(the byte-scaled estimate above assumes the measured "
            "~64k effective tunnel bandwidth). The reference runs this "
            "family on 320-512 GiB cluster nodes "
            "(run_distr_single_csd3.slurm)."
        ),
        "executed_128k_evidence": next(
            (p for p in (
                "validation/hosttier_128k_sparse_full.json",
                "validation/hosttier_128k_bounded.json",
            ) if os.path.exists(p)), None
        ),
    }
    with open(args.out, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result, indent=1))


if __name__ == "__main__":
    main()
