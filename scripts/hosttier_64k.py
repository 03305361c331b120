"""Host-tier session at a 64k-class catalogue entry — bounded or FULL.

Executes REAL 64k columns through ``StreamedSwiftly`` (facet state in
host RAM / on disk, bounded per-column device working set) and records
measured memory against ``utils.memory_plan``'s prediction. With
``--full`` it runs the complete 147-column round trip and verifies the
finished facets against freshly built oracles, one facet at a time —
the 64k/128k capability claim demonstrated, not modeled (the reference
only runs these configs on 320-512 GiB cluster nodes,
reference slurm_scripts/run_distr_single_csd3.slurm +
swift_configs.py:30-40).

On this 125 GiB box the run needs ``accum_dtype=complex64`` (the
default complex128 accumulator alone would be 106 GiB at
64k[1]-n32k-512). ``--state_dir`` makes the multi-hour run resumable:

* ``BF_F`` is computed into a disk memmap (49.5 GiB) and reattached on
  restart, skipping the ~80 min facet-build + prepare phase;
* the accumulator (host RAM) is checkpointed to disk every
  ``--ckpt_every`` columns (~100 s per save at the measured 519 MB/s)
  together with a progress marker, so a tunnel death mid-stream loses
  at most that many columns. The save is deliberately NOT double
  buffered (two 49.5 GiB copies don't fit next to BF_F on the 120 GiB
  disk): the progress marker is invalidated before the write and
  re-armed after, so a crash mid-save falls back to column 0 with the
  BF_F cache intact.

Run (TPU, full round trip ~4 h, tunnel-bandwidth bound):
    python scripts/hosttier_64k.py --platform tpu --full \
        --state_dir /root/state64k --out validation/hosttier_64k_full.json
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


def write_json_atomic(path, obj):
    """These markers exist to survive kills — a kill mid-write must
    not leave truncated JSON, so write-to-temp + rename."""
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(obj, f)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)


def read_json_or_none(path):
    """Tolerate a corrupt/empty marker (crash mid-write before the
    atomic-write fix, or disk-full): fall back to a fresh start
    instead of crashing the resume path."""
    try:
        with open(path) as f:
            return json.load(f)
    except (json.JSONDecodeError, OSError) as e:
        log(f"ignoring unreadable marker {path}: {e}")
        return None


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
    ap.add_argument("--full", action="store_true",
                    help="run ALL columns + finish + per-facet RMSE")
    ap.add_argument("--batch_chunk", type=int, default=48,
                    help="subgrids per device dispatch (bounds the "
                    "column working set)")
    ap.add_argument("--platform", default="cpu", choices=["cpu", "tpu"])
    ap.add_argument("--accum_dtype", default="complex64",
                    choices=["complex64", "complex128"])
    ap.add_argument("--sparse_fov_pixel", type=int, default=None,
                    help="cover only a circular FoV of this diameter "
                    "with facets (library sparse cover, the reference's "
                    "demo_sparse_facet workload) instead of the full "
                    "image — the ONLY way a 128k-class facet state fits "
                    "this box (full 128k covers are 25-100 facets, "
                    "155-310 GiB host state); sources are placed inside "
                    "the FoV")
    ap.add_argument("--state_dir", default=None,
                    help="resumable state: BF_F memmap + accumulator "
                    "checkpoints")
    ap.add_argument("--ckpt_every", type=int, default=30)
    ap.add_argument("--rss_exit_gib", type=float, default=100.0,
                    help="finish phase: exit 3 (resumable) when current "
                    "RSS exceeds this, before the OOM killer does it "
                    "non-gracefully")
    ap.add_argument("--rmse_bound", type=float, default=1e-5)
    ap.add_argument("--out", default="validation/hosttier_64k_cpu.json")
    args = ap.parse_args()

    import jax

    if args.platform == "cpu":
        # the axon TPU plugin ignores JAX_PLATFORMS; only the config
        # knob works, and it must run before any backend query
        jax.config.update("jax_platforms", "cpu")
    else:
        # multi-hour chip holder: serialise against benches; park
        # checks below yield the chip at phase boundaries
        from ska_sdp_distributed_fourier_transform_tpu.utils.chiplock \
            import acquire_chip_lock

        acquire_chip_lock(f"hosttier_64k {args.swift_config}")

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
    N = config.image_size
    if args.sparse_fov_pixel:
        from ska_sdp_distributed_fourier_transform_tpu.sparse import (
            make_sparse_facet_cover,
        )

        fov = args.sparse_fov_pixel
        fcs = make_sparse_facet_cover(config, fov)
        log(f"sparse cover: {len(fcs)} facets over a {fov}-pixel FoV "
            f"(full cover would be "
            f"{(-(-N // config.max_facet_size)) ** 2})")
        # sources inside the circular FoV (radius fov/2 around centre)
        sources = [(1.0, fov // 4, -fov // 8), (0.5, -fov // 6, fov // 5)]
    else:
        fcs = make_full_facet_cover(config)
        sources = [(1.0, N // 8, -N // 8), (0.5, -N // 3, N // 5)]
    sgs = make_full_subgrid_cover(config)

    sd = args.state_dir
    fingerprint = {
        "config": args.swift_config,
        "platform": args.platform,
        "accum_dtype": args.accum_dtype,
        "sources": [list(map(float, s)) for s in sources],
    }
    if args.sparse_fov_pixel:
        # only when active: full-cover fingerprints must keep matching
        # state written before this key existed
        fingerprint["sparse_fov_pixel"] = args.sparse_fov_pixel

    engine = StreamedSwiftly(
        config._core, fcs, sgs, batch_chunk=args.batch_chunk,
        accum_dtype=args.accum_dtype,
        host_store_dir=sd,
    )

    # --- BF_F: reattach from a previous session or prepare fresh -----
    bf_path = sd and os.path.join(sd, "bf_f.npy")
    meta_path = sd and os.path.join(sd, "meta.json")
    t_prep = 0.0
    reused_bf = False
    facets_done = 0
    if sd and os.path.exists(bf_path) and os.path.exists(meta_path):
        meta = read_json_or_none(meta_path) or {}
        if meta.get("fingerprint") == fingerprint:
            if meta.get("bf_f_ok"):
                engine.attach_host_state(
                    bf_f=np.load(bf_path, mmap_mode="r")
                )
                reused_bf = True
                log(f"reattached BF_F memmap from {bf_path}")
            else:
                facets_done = int(meta.get("bf_f_facets_done", 0))
                if facets_done:
                    log(f"resuming BF_F prepare from facet "
                        f"{facets_done}")
    if not reused_bf:
        facets = LazyFacets(N, fcs, sources, np.complex64)

        def _mark(k):
            if sd:
                write_json_atomic(meta_path,
                                  {"fingerprint": fingerprint,
                                   "bf_f_facets_done": k + 1})
                log(f"prepared facet {k} (rss {rss_gib():.1f} GiB)")
            from ska_sdp_distributed_fourier_transform_tpu.utils \
                .chiplock import chip_parked

            if chip_parked():
                log("park file present; stopping after facet "
                    f"{k} (resume with the same --state_dir)")
                sys.exit(3)

        t0 = time.time()
        engine.prepare_facets(facets, start_facet=facets_done,
                              on_facet_done=_mark)
        t_prep = time.time() - t0
        facets._cache = (None, None)  # free the last oracle facet
        if sd:
            engine._BF_F.flush()
            write_json_atomic(meta_path, {"fingerprint": fingerprint,
                                          "bf_f_ok": True})
    bf_gib = engine._BF_F.nbytes / 1024**3
    log(f"BF_F ready ({'reused' if reused_bf else f'{t_prep:.0f}s'}); "
        f"{bf_gib:.1f} GiB (rss {rss_gib():.1f} GiB)")

    # --- accumulator: RAM (disk memmap would make every column's
    # scatter-add a read-modify-write to disk); resumable via explicit
    # checkpoint saves ------------------------------------------------
    engine.host_store_dir = None
    acc_path = sd and os.path.join(sd, "accum_ckpt.npy")
    prog_path = sd and os.path.join(sd, "progress.json")
    start = 0
    if sd and os.path.exists(acc_path) and os.path.exists(prog_path):
        prog = read_json_or_none(prog_path) or {}
        if (prog.get("fingerprint") == fingerprint
                and prog.get("valid") and prog.get("next_column")):
            log(f"resuming accumulator from column "
                f"{prog['next_column']} ({acc_path})")
            engine.attach_host_state(
                accum=np.load(acc_path).astype(args.accum_dtype,
                                               copy=False)
            )
            start = int(prog["next_column"])
    if start == 0:
        engine.zero_accumulator()
    acc_gib = engine._accum.nbytes / 1024**3
    log(f"accumulator {acc_gib:.1f} GiB host "
        f"(rss {rss_gib():.1f} GiB)")

    def save_ckpt(done):
        # invalidate -> overwrite in place -> re-arm (see module doc)
        t0 = time.time()
        write_json_atomic(prog_path, {"valid": False})
        np.save(acc_path, engine._accum)
        write_json_atomic(prog_path,
                          {"fingerprint": fingerprint, "valid": True,
                           "next_column": done})
        log(f"checkpointed accumulator at column {done} "
            f"({time.time() - t0:.0f}s)")

    n_cols_total = engine.plan.n_columns
    C = n_cols_total if args.full else min(args.columns, n_cols_total)
    col_times = []
    n_sg = sum(
        len(engine.plan.configs[ci]) for ci in range(start)
    )
    t_cols0 = time.time()
    for ci in range(start, C):
        t0 = time.time()
        engine.process_column(ci)
        col_times.append(round(time.time() - t0, 1))
        n_sg += len(engine.plan.configs[ci])
        log(f"column {ci + 1}/{n_cols_total} "
            f"({col_times[-1]:.0f}s, {n_sg} subgrids, "
            f"rss {rss_gib():.1f} GiB)")
        if sd and ((ci + 1) % args.ckpt_every == 0 or ci + 1 == C):
            save_ckpt(ci + 1)
        if ci + 1 < C:
            from ska_sdp_distributed_fourier_transform_tpu.utils \
                .chiplock import chip_parked

            if chip_parked():
                if sd:
                    save_ckpt(ci + 1)
                log(f"park file present; stopping after column "
                    f"{ci + 1} (resume with the same --state_dir)")
                sys.exit(3)
    t_cols = time.time() - t_cols0

    # accumulator must be non-trivially populated by the executed
    # columns (the backward fold actually landed)
    touched = float(np.abs(engine._accum[:, :: max(1, engine._accum.shape[1] // 64)]).max())
    assert touched > 0.0, "backward fold wrote nothing"

    result = {
        "config": args.swift_config,
        "tier": "host-streamed",
        "platform": args.platform,
        "accum_dtype": args.accum_dtype,
        "sparse_fov_pixel": args.sparse_fov_pixel,
        "n_facets": len(fcs),
        "batch_chunk": args.batch_chunk,
        "columns_executed": C,
        "n_columns_total": n_cols_total,
        "subgrids_executed": n_sg,
        "prepare_s": round(t_prep, 1),
        "prepare_facets_measured": (
            0 if reused_bf else len(fcs) - facets_done
        ),
        "bf_f_reused": reused_bf,
        "columns_s_total": round(t_cols, 1),
        "column_s": col_times if len(col_times) <= 8 else {
            "first": col_times[0],
            "median": sorted(col_times)[len(col_times) // 2],
            "last": col_times[-1],
            "count": len(col_times),
        },
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

    # --- full-run finish + per-facet RMSE, one facet at a time -------
    if C == n_cols_total:
        import ctypes
        import gc

        from ska_sdp_distributed_fourier_transform_tpu.api_helper import (
            make_facet,
        )

        def cur_rss_gib():
            with open("/proc/self/status") as f:
                for line in f:
                    if line.startswith("VmRSS:"):
                        return int(line.split()[1]) / 1024**2
            return 0.0

        try:
            _libc = ctypes.CDLL("libc.so.6")
        except OSError:
            _libc = None

        engine._BF_F = None  # release the memmap before finish
        # Per-facet resumable finish: at 64k each facet's finish cycles
        # ~12-17 GiB of host temporaries (uploaded accum rows + the c128
        # oracle + the finished facet); run 1's anon RSS grew ~5.5 GiB
        # per facet on top of the 49.5 GiB accumulator until the OOM
        # killer took the process at facet 6 of 9. Only the RMSE list
        # is carried between facets, so it checkpoints trivially and a
        # supervisor can restart a killed process where it left off
        # (run_hosttier_64k_full.sh loops on exit code 137/3).
        fin_path = sd and os.path.join(sd, "finish_progress.json")
        facet_rmse = []
        t_fin_prev = 0.0
        if sd and os.path.exists(fin_path):
            finp = read_json_or_none(fin_path) or {}
            if finp.get("fingerprint") == fingerprint:
                facet_rmse = list(finp.get("facet_rmse", []))
                t_fin_prev = float(finp.get("finish_s_prev", 0.0))
                if facet_rmse:
                    log(f"resuming finish from facet {len(facet_rmse)}")
        t_fin0 = time.time()
        for fi in range(len(facet_rmse), len(fcs)):
            t0 = time.time()
            approx = engine.finish_facet(fi)
            oracle = np.asarray(
                make_facet(N, fcs[fi], sources), dtype=np.complex64
            )
            # chunked error accumulation (no second yB^2 temp)
            err2 = 0.0
            rows = approx.shape[0]
            step = max(1, rows // 16)
            for lo in range(0, rows, step):
                hi = min(lo + step, rows)
                d = approx[lo:hi] - oracle[lo:hi]
                err2 += float(np.vdot(d, d).real)
            rmse = float(np.sqrt(err2 / approx.size))
            facet_rmse.append(rmse)
            del approx, oracle
            gc.collect()
            if _libc is not None:
                _libc.malloc_trim(0)  # return freed arenas to the OS
            if sd:
                write_json_atomic(fin_path, {
                    "fingerprint": fingerprint,
                    "facet_rmse": facet_rmse,
                    "finish_s_prev": t_fin_prev + time.time() - t_fin0,
                })
            log(f"facet {fi}: RMSE {rmse:.3e} "
                f"({time.time() - t0:.0f}s, rss cur "
                f"{cur_rss_gib():.1f} / peak {rss_gib():.1f} GiB)")
            if (cur_rss_gib() > args.rss_exit_gib
                    and fi + 1 < len(fcs)):
                log(f"current RSS above {args.rss_exit_gib} GiB — "
                    "exiting 3 for a fresh-process resume")
                sys.exit(3)
        t_fin = t_fin_prev + time.time() - t_fin0
        worst = max(facet_rmse)
        result.update({
            "complete_roundtrip": True,
            "finish_s": round(t_fin, 1),
            "facet_rmse": [float(f"{r:.6e}") for r in facet_rmse],
            "roundtrip_rmse_c64": worst,
            "rmse_bound": args.rmse_bound,
            "result": "PASS" if worst < args.rmse_bound else "FAIL",
        })
        log(f"complete round trip: worst facet RMSE {worst:.3e} "
            f"(bound {args.rmse_bound:g}) -> {result['result']}")

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))
    log(f"wrote {args.out}")


if __name__ == "__main__":
    main()
