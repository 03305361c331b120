"""Single-chip TPU benchmark: streaming facet->subgrid->facet round trip.

Runs the sharded engine on the real TPU (complex64) over a full subgrid
cover of an SKA-scale configuration, measures subgrids/s for the complete
forward+backward stream, validates the round-trip RMSE on device, and
compares against a CPU baseline of the same tile-streaming pipeline
(the reference's per-tile task structure, here jit-compiled for CPU — a
*generous* stand-in for the reference's per-worker numpy throughput).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "subgrids/s", "vs_baseline": N}
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

import numpy as np


def log(*args):
    print(*args, file=sys.stderr, flush=True)


def build_device_facets(engine, facet_cfgs, sources, N):
    """Construct masked point-source facets directly on device (scatter),
    avoiding large host->device transfers over slow attachments."""
    import jax
    import jax.numpy as jnp

    yB = engine.yB_size
    fs, i0s, i1s, vals = [], [], [], []
    for fi, cfg in enumerate(facet_cfgs):
        for intensity, x0, x1 in sources:
            r0 = (x0 - (cfg.off0 - yB // 2)) % N
            r1 = (x1 - (cfg.off1 - yB // 2)) % N
            if 0 <= r0 < yB and 0 <= r1 < yB:
                fs.append(fi)
                i0s.append(r0)
                i1s.append(r1)
                vals.append(intensity)
    fs = np.asarray(fs, np.int32)
    i0s = np.asarray(i0s, np.int32)
    i1s = np.asarray(i1s, np.int32)
    vals = np.asarray(vals, np.float32)
    m0 = np.asarray(engine._fmask0, np.float32)
    m1 = np.asarray(engine._fmask1, np.float32)

    # out_shardings places the result directly: an after-the-fact
    # device_put re-shards through the attachment (~0.7 s at 16k scale)
    @functools.partial(jax.jit, out_shardings=engine._shard)
    def build(fs, i0s, i1s, vals, m0, m1):
        f = jnp.zeros((engine.F_pad, yB, yB), jnp.float32)
        f = f.at[fs, i0s, i1s].add(vals)
        f = f * m0[:, :, jnp.newaxis] * m1[:, jnp.newaxis, :]
        return f.astype(engine.core.dtype)

    return build(fs, i0s, i1s, vals, m0, m1)


def split_roundtrip(params, sources, kernel=None):
    """Timed round trip on the split-precision (double-f32, exact
    chunked MXU) tier — f64-class accuracy from bf16/f32 hardware."""
    import functools

    import jax
    import jax.numpy as jnp

    from ska_sdp_distributed_fourier_transform_tpu import (
        SwiftlyConfig,
        make_full_facet_cover,
        make_full_subgrid_cover,
    )
    from ska_sdp_distributed_fourier_transform_tpu.parallel import (
        SplitSwiftly,
    )

    config = SwiftlyConfig(dtype=jnp.complex64, **params)
    fc = make_full_facet_cover(config)
    sg = make_full_subgrid_cover(config)
    eng = SplitSwiftly(config._core, fc, sg, kernel=kernel)
    N = config.image_size
    yB = eng.yB_size

    # Source scatter on device into the hi planes (exact: integer-ish
    # intensities in f32); seed scales intensities so repeat runs are
    # distinct dispatches (the tunnel skips duplicate dispatches).
    fs, i0s, i1s, vals = [], [], [], []
    for fi, cfg in enumerate(fc):
        for intensity, x0, x1 in sources:
            r0 = (x0 - (cfg.off0 - yB // 2)) % N
            r1 = (x1 - (cfg.off1 - yB // 2)) % N
            if 0 <= r0 < yB and 0 <= r1 < yB:
                fs.append(fi)
                i0s.append(r0)
                i1s.append(r1)
                vals.append(intensity)
    fs = np.asarray(fs, np.int32)
    i0s = np.asarray(i0s, np.int32)
    i1s = np.asarray(i1s, np.int32)
    vals = np.asarray(vals, np.float32)
    m0 = np.asarray(eng._fmask0, np.float32)
    m1 = np.asarray(eng._fmask1, np.float32)

    @jax.jit
    def build(seed, fs, i0s, i1s, vals, m0, m1):
        hi = jnp.zeros((eng.F, yB, yB), jnp.float32)
        hi = hi.at[fs, i0s, i1s].add(vals * seed)
        hi = hi * m0[:, :, jnp.newaxis] * m1[:, jnp.newaxis, :]
        z = jnp.zeros_like(hi)
        return (hi, z, z, z)

    plan = eng.plan
    cols = tuple(
        jnp.asarray(a)
        for a in (
            np.asarray(plan.off0, np.int32),
            np.asarray(plan.sg_off1, np.int32),
            np.asarray(plan.valid, np.float32),
            np.asarray(plan.mask0, np.float32),
            np.asarray(plan.mask1, np.float32),
            eng._fold_targets(),
        )
    )
    n_subgrids = sum(len(c) for c in plan.configs)

    Cf = eng._fsh()

    def run(seed):
        facets_cdf = build(jnp.float32(seed), fs, i0s, i1s, vals, m0, m1)
        out = eng._stream_fn(facets_cdf, cols, Cf)
        jax.block_until_ready(out)
        return facets_cdf, out

    run(2.0)  # compile
    log("compiled (split tier)")
    t0 = time.perf_counter()
    facets_cdf, out = run(1.0)  # different seed: forces re-execution
    elapsed = time.perf_counter() - t0

    # RMSE on device against the input planes (hi plane only is exact
    # input; lo plane is zero)
    @jax.jit
    def rmse(out, facets_cdf):
        # difference the hi planes first (exact for nearby values), then
        # add the lo planes — keeps sub-f32 residuals visible
        dre = (out[0] - facets_cdf[0]) + (out[1] - facets_cdf[1])
        dim = (out[2] - facets_cdf[2]) + (out[3] - facets_cdf[3])
        return jnp.sqrt(jnp.mean(dre**2 + dim**2))

    r = float(rmse(out, facets_cdf))
    return n_subgrids / elapsed, elapsed, n_subgrids, r


def tpu_roundtrip(params, sources, n_columns=None, engine_mode="matmul",
                  precision="high", direction="roundtrip",
                  fft_impl="mxu"):
    """Timed full round trip on the default (TPU) backend in complex64."""
    import jax
    import jax.numpy as jnp

    from ska_sdp_distributed_fourier_transform_tpu import (
        SwiftlyConfig,
        make_full_facet_cover,
        make_full_subgrid_cover,
    )
    from ska_sdp_distributed_fourier_transform_tpu.parallel import (
        ShardedSwiftly,
        make_tile_mesh,
    )

    config = SwiftlyConfig(dtype=jnp.complex64, **params)
    facet_cfgs = make_full_facet_cover(config)
    sg_cfgs = make_full_subgrid_cover(config)
    mesh = make_tile_mesh()
    engine = ShardedSwiftly(config._core, facet_cfgs, sg_cfgs, mesh,
                            engine_mode=engine_mode, precision=precision,
                            fft_impl=fft_impl)
    N = config.image_size

    C = engine.plan.n_columns if n_columns is None else min(
        n_columns, engine.plan.n_columns
    )

    full_cover = C == engine.plan.n_columns

    if direction in ("forward", "backward") and full_cover:
        n_subgrids = sum(len(c) for c in engine.plan.configs)

        packed_in = build_device_facets(engine, facet_cfgs, sources, N)
        jax.block_until_ready(packed_in)

        def run_fwd():
            sgs = engine.forward_stream(packed_in)
            jax.block_until_ready(sgs)
            return sgs

        if direction == "forward":
            run = run_fwd
        else:
            sgs_in = run_fwd()

            def run():
                out = engine.backward_stream(sgs_in)
                jax.block_until_ready(out)
                return out

        out = run()  # compile
        del out
        log(f"compiled ({direction}-only)")
        t0 = time.perf_counter()
        out = run()
        elapsed = time.perf_counter() - t0
        del out
        return n_subgrids / elapsed, elapsed, n_subgrids, None, {}

    # Built once: nothing in the stream donates or mutates it.
    packed_in = build_device_facets(engine, facet_cfgs, sources, N)
    jax.block_until_ready(packed_in)

    def stream():
        packed = packed_in
        if full_cover:
            # Whole stream (prepare -> scan over fused fwd+bwd columns
            # -> finish) as ONE compiled program: no per-column dispatch.
            facets_out = engine._run_stream(packed)
            n_subgrids = sum(len(c) for c in engine.plan.configs)
            jax.block_until_ready(facets_out)
            return facets_out, n_subgrids
        # Column-limited run drives the per-column programs. Facet array
        # is freed right after prepare, BF_F before finish — keeps peak
        # HBM well inside a single v5e for the 16k configs.
        BF_F = engine.prepare_facets(packed)
        accum = engine.zero_accumulator()
        n_subgrids = 0
        for ci in range(C):
            sg = engine.forward_column(BF_F, ci)
            accum = engine.backward_column(sg, ci, accum)
            n_subgrids += len(engine.plan.configs[ci])
        del BF_F, sg
        facets_out = engine.finish_facets(accum)
        jax.block_until_ready(facets_out)
        return facets_out, n_subgrids

    # Warm-up: compile every program (column programs are offset-traced,
    # so one compilation covers all columns).
    facets_out, _ = stream()
    del facets_out
    log(f"compiled; {C} columns x {engine.plan.batch} batch")

    # Timed full stream.
    t0 = time.perf_counter()
    facets_out, n_subgrids = stream()
    elapsed = time.perf_counter() - t0

    # Round-trip accuracy (only meaningful over the full cover).
    rmse = None
    extra = {}
    if C == engine.plan.n_columns:
        from ska_sdp_distributed_fourier_transform_tpu.utils import (
            device_rmse,
        )

        rmse = float(device_rmse(facets_out, packed_in))
        # MFU / %-of-peak from the compiler's own cost analysis of the
        # fused stream (per-chip peaks: v5e ~197 TF/s bf16 MXU,
        # ~819 GB/s HBM). Both numbers at once show which roof binds.
        try:
            cost = engine.stream_cost()
            extra["stream_tflop"] = round(cost["flops"] / 1e12, 4)
            extra["mfu_pct"] = round(
                100 * cost["flops"] / elapsed / 197e12, 2
            )
            extra["hbm_pct"] = round(
                100 * cost["bytes"] / elapsed / 819e9, 2
            )
        except Exception as e:  # cost analysis is best-effort
            log(f"stream_cost unavailable: {e}")
    return n_subgrids / elapsed, elapsed, n_subgrids, rmse, extra


def host_tier_roundtrip(params, sources, n_columns=None):
    """Timed host-streamed-tier round trip on the default (TPU) backend:
    BF_F/accumulator live in host RAM; each column moves only its
    ``[F, c, yB]`` window rows over the host<->device link
    (parallel/streamed.py). Over the axon tunnel that link is orders of
    magnitude slower than production PCIe/DMA, so the sg/s is a lower
    bound dominated by tunnel bandwidth — reported with per-phase times
    so the compute share is visible."""
    import jax
    import jax.numpy as jnp

    from ska_sdp_distributed_fourier_transform_tpu import (
        SwiftlyConfig,
        make_full_facet_cover,
        make_full_subgrid_cover,
    )
    from ska_sdp_distributed_fourier_transform_tpu.api_helper import (
        make_facet,
    )
    from ska_sdp_distributed_fourier_transform_tpu.parallel import (
        StreamedSwiftly,
    )

    config = SwiftlyConfig(dtype=jnp.complex64, **params)
    facet_cfgs = make_full_facet_cover(config)
    sg_cfgs = make_full_subgrid_cover(config)
    engine = StreamedSwiftly(config._core, facet_cfgs, sg_cfgs)
    N = config.image_size

    facets = [np.asarray(make_facet(N, cfg, sources))
              for cfg in facet_cfgs]

    t0 = time.perf_counter()
    engine.prepare_facets(facets)
    t_prep = time.perf_counter() - t0
    log(f"host tier: prepared {len(facets)} facets in {t_prep:.1f}s")

    engine.zero_accumulator()
    C = engine.plan.n_columns if n_columns is None else min(
        n_columns, engine.plan.n_columns
    )
    n_subgrids = 0
    t0 = time.perf_counter()
    for ci in range(C):
        engine.process_column(ci)
        n_subgrids += len(engine.plan.configs[ci])
    t_cols = time.perf_counter() - t0
    log(f"host tier: {C} columns in {t_cols:.1f}s")

    rmse = None
    t_fin = 0.0
    if C == engine.plan.n_columns:
        engine._BF_F = None
        t0 = time.perf_counter()
        out = engine.finish_facets()
        t_fin = time.perf_counter() - t0
        errs = [
            float(np.sqrt(np.mean(np.abs(
                np.asarray(o) - np.asarray(f)) ** 2)))
            for o, f in zip(out, facets)
        ]
        rmse = max(errs)
    elapsed = t_prep + t_cols + t_fin
    extra = {"prepare_s": round(t_prep, 2),
             "columns_s": round(t_cols, 2),
             "finish_s": round(t_fin, 2),
             "tier": "host-streamed (tunnel-bandwidth bound)"}
    return n_subgrids / elapsed, elapsed, n_subgrids, rmse, extra


def cpu_baseline(params, sources, n_sample=3):
    """Per-subgrid cost of the tile-streaming pipeline on CPU (complex64),
    extrapolated from one column: BF prepare (amortised over all columns),
    column prep (amortised over the column batch), plus per-subgrid
    forward+backward work."""
    import jax
    import jax.numpy as jnp

    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        from ska_sdp_distributed_fourier_transform_tpu import (
            SwiftlyConfig,
            make_full_facet_cover,
            make_full_subgrid_cover,
        )
        from ska_sdp_distributed_fourier_transform_tpu.api_helper import (
            accumulate_column,
            extract_column,
            make_facet,
            prepare_and_split_subgrid,
            sum_and_finish_subgrid,
        )

        config = SwiftlyConfig(dtype=jnp.complex64, **params)
        core = config._core
        facet_cfgs = make_full_facet_cover(config)
        sg_cfgs = make_full_subgrid_cover(config)
        N = config.image_size

        F = len(facet_cfgs)
        cols = sorted({cfg.off0 for cfg in sg_cfgs})
        n_cols = len(cols)
        col0 = [cfg for cfg in sg_cfgs if cfg.off0 == cols[0]]
        B = len(col0)

        # Cost one representative facet / subgrid and scale: F facets
        # amortised over C*B subgrids (BF prepare) and B subgrids (column
        # prep), plus the per-subgrid forward+backward work.
        facet0 = jnp.asarray(
            make_facet(N, facet_cfgs[0], sources), jnp.complex64
        )

        def timed(fn, reps=1):
            jax.block_until_ready(fn())  # compile
            t0 = time.perf_counter()
            for _ in range(reps):
                jax.block_until_ready(fn())
            return (time.perf_counter() - t0) / reps

        t_bf1 = timed(
            lambda: core.prepare_facet(facet0, facet_cfgs[0].off0, axis=0)
        )
        BF_F0 = core.prepare_facet(facet0, facet_cfgs[0].off0, axis=0)
        t_col1 = timed(
            lambda: extract_column(
                core, BF_F0, cols[0], facet_cfgs[0].off1
            )
        )
        NMBF_BF0 = extract_column(core, BF_F0, cols[0], facet_cfgs[0].off1)

        def one_subgrid(sg_cfg):
            NMBF_NMBFs = [
                core.extract_from_facet(NMBF_BF0, sg_cfg.off1, axis=1)
                for _ in facet_cfgs
            ]
            subgrid = sum_and_finish_subgrid(
                core, NMBF_NMBFs, facet_cfgs, sg_cfg
            )
            NAF_NAFs = prepare_and_split_subgrid(
                core, subgrid, [sg_cfg.off0, sg_cfg.off1], facet_cfgs
            )
            return [
                accumulate_column(core, naf, None, sg_cfg.off1)
                for naf in NAF_NAFs
            ]

        jax.block_until_ready(one_subgrid(col0[0]))  # compile
        t0 = time.perf_counter()
        for sg_cfg in col0[1 : 1 + n_sample]:
            jax.block_until_ready(one_subgrid(sg_cfg))
        t_sg = (time.perf_counter() - t0) / n_sample

        per_sg = F * t_bf1 / (n_cols * B) + F * t_col1 / B + t_sg
        return 1.0 / per_sg


def _require_tunnel_alive(wait_s=600):
    """Fail fast (with a clear message) when the axon TPU tunnel relay
    is down, instead of blocking forever in backend init.

    The tunnelled TPU plugin (JAX_PLATFORMS=axon) retries refused
    connects to the local relay ports indefinitely at ~0% CPU, so a
    dead relay turns any bench invocation into a silent infinite hang.
    Probe the first relay port directly: connection-refused means the
    relay process is gone (a condition only the outer harness can
    repair). Waits up to ``wait_s`` for it to come back before giving
    up. Set SWIFTLY_BENCH_NO_PROBE=1 to skip (e.g. non-axon setups).
    """
    import socket
    import time as _time

    if os.environ.get("JAX_PLATFORMS") != "axon":
        return
    if os.environ.get("SWIFTLY_BENCH_NO_PROBE") == "1":
        return
    deadline = _time.time() + wait_s
    while True:
        try:
            with socket.create_connection(("127.0.0.1", 8082), timeout=5):
                return
        except OSError as e:
            if _time.time() > deadline:
                print(
                    json.dumps({
                        "metric": "bench_error",
                        "value": 0,
                        "unit": "none",
                        "vs_baseline": None,
                        "extra": {
                            "error": "axon TPU tunnel relay down "
                            f"(port 8082: {e}); cannot reach the chip",
                        },
                    })
                )
                sys.exit(2)
            log(f"TPU tunnel relay not reachable ({e}); waiting...")
            _time.sleep(15)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--swift_config", default="16k[1]-n8k-512")
    ap.add_argument("--columns", type=int, default=None,
                    help="limit the number of subgrid columns (full cover "
                    "by default)")
    ap.add_argument("--source_number", type=int, default=8)
    ap.add_argument("--engine_mode", default="pallas",
                    choices=["matmul", "pallas", "fft"],
                    help="matmul: contribution ops as MXU operator "
                    "contractions; fft: gather+FFT formulation")
    ap.add_argument("--fft_impl", default="mxu", choices=["mxu", "xla"],
                    help="yN-scale facet transforms: four-step MXU "
                    "factor matmuls or the XLA FFT")
    ap.add_argument("--direction", default="roundtrip",
                    choices=["roundtrip", "forward", "backward"],
                    help="roundtrip: facets->subgrids->facets; forward: "
                    "degrid only; backward: grid only")
    ap.add_argument("--precision", default="high",
                    choices=["default", "high", "highest", "split"],
                    help="MXU precision for the operator contractions; "
                    "'split' runs the double-f32 exact-chunked tier "
                    "(f64-class accuracy, single chip)")
    ap.add_argument("--split_kernel", default=None,
                    choices=["pallas", "xla"],
                    help="contraction backend for --precision split "
                    "(default: pallas on TPU, xla elsewhere)")
    ap.add_argument("--platform", default=None,
                    choices=["cpu", "tpu"],
                    help="force a JAX platform (the axon TPU plugin "
                    "ignores JAX_PLATFORMS; only the jax_platforms "
                    "config knob works — needed to smoke-test on CPU "
                    "while the tunnel is down)")
    ap.add_argument("--host_tier", action="store_true",
                    help="bench the host-streamed tier (StreamedSwiftly:"
                    " host-resident BF_F/accumulator, per-column window"
                    " transfers) instead of the device-resident engine")
    ap.add_argument("--skip_baseline", action="store_true")
    args = ap.parse_args()

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    chip_lock = None
    if args.platform != "cpu":
        _require_tunnel_alive()
        # Serialise chip users (round-4 lost its driver bench number to
        # a chip collision). Released automatically if we die.
        from ska_sdp_distributed_fourier_transform_tpu.utils.chiplock \
            import acquire_chip_lock

        chip_lock = acquire_chip_lock(
            "bench.py " + " ".join(sys.argv[1:])
        )

    from ska_sdp_distributed_fourier_transform_tpu.swift_configs import (
        SWIFT_CONFIGS,
    )

    params = dict(SWIFT_CONFIGS[args.swift_config])
    N = params["N"]
    rng = np.random.default_rng(1)
    sources = [
        (
            float(rng.normal()),
            int(rng.integers(-N // 2, N // 2)),
            int(rng.integers(-N // 2, N // 2)),
        )
        for _ in range(args.source_number)
    ]

    bench_extra = {}
    try:
        if args.host_tier:
            sgps, elapsed, n_subgrids, rmse, bench_extra = (
                host_tier_roundtrip(params, sources, args.columns)
            )
        elif args.precision == "split":
            sgps, elapsed, n_subgrids, rmse = split_roundtrip(
                params, sources, kernel=args.split_kernel
            )
        else:
            sgps, elapsed, n_subgrids, rmse, bench_extra = (
                tpu_roundtrip(
                    params, sources, args.columns, args.engine_mode,
                    args.precision, args.direction, args.fft_impl,
                )
            )
    except Exception as e:
        # Tunnelled TPU attachments fail transiently and can wedge the
        # in-process backend afterwards — retry once in a fresh process.
        if os.environ.get("SWIFTLY_BENCH_RETRY") == "1":
            raise
        log(f"first attempt failed ({e}); retrying in a fresh process")
        if chip_lock is not None:
            # We acquired the chip lock ourselves: drop it (and its
            # held-marker env var) so the fresh process re-acquires
            # instead of skipping acquisition while holding nothing.
            from ska_sdp_distributed_fourier_transform_tpu.utils \
                .chiplock import release_chip_lock

            release_chip_lock(chip_lock)
        env = dict(os.environ, SWIFTLY_BENCH_RETRY="1")
        os.execve(sys.executable, [sys.executable] + sys.argv, env)
    log(
        f"TPU: {n_subgrids} subgrids in {elapsed:.2f}s = {sgps:.2f} sg/s; "
        f"round-trip RMSE {rmse}"
    )

    vs_baseline = None
    if not args.skip_baseline:
        base = cpu_baseline(params, sources)
        vs_baseline = sgps / base
        log(f"CPU baseline: {base:.3f} sg/s -> speedup {vs_baseline:.1f}x")

    print(
        json.dumps(
            {
                "metric": (
                    ("host_" if args.host_tier else "")
                    + f"{args.direction}_subgrids_per_s"
                    f"[{args.swift_config}]"
                ),
                "value": round(sgps, 3),
                "unit": "subgrids/s",
                "vs_baseline": (
                    round(vs_baseline, 3) if vs_baseline else None
                ),
                "extra": {
                    "n_subgrids": n_subgrids,
                    "elapsed_s": round(elapsed, 3),
                    "roundtrip_rmse_c64": rmse,
                    "chip": ("CPU (forced)" if args.platform == "cpu"
                             else "TPU v5e (1 chip)"),
                    **bench_extra,
                },
            }
        )
    )


if __name__ == "__main__":
    main()
