"""Stage-bisection profiler for the streaming engine on the real chip.

The tunnelled TPU's profiling RPCs are unreliable, and repeated identical
dispatches are not re-executed (see BENCH_SWEEP.md), so this measures the
column pipeline by *cumulative-stage scans*: for k = 1..K build a
``lax.scan`` over all columns whose body computes only the first k
pipeline stages and folds a cheap reduction of the last stage's output
into the carry (dependency-chaining every iteration), then report the
marginal time of each stage as the difference between consecutive k.

Usage: python scripts/profile_stages.py --swift_config 16k[1]-n8k-512
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--swift_config", default="16k[1]-n8k-512")
    ap.add_argument("--engine_mode", default="pallas",
                    choices=["pallas", "matmul"])
    ap.add_argument("--fft_impl", default="mxu", choices=["mxu", "xla"])
    ap.add_argument("--pipeline", default="r3", choices=["r2", "r3"],
                    help="r2: round-2 default engine stages (unfused "
                    "prepare, materialised per-subgrid extraction); "
                    "r3: round-3 defaults (fused_prepare_rows + "
                    "gather-fused contraction + fused finish rows)")
    ap.add_argument("--reps", type=int, default=2)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from ska_sdp_distributed_fourier_transform_tpu.utils.chiplock \
        import acquire_chip_lock

    acquire_chip_lock("profile_stages")

    from ska_sdp_distributed_fourier_transform_tpu import (
        SwiftlyConfig,
        make_full_facet_cover,
        make_full_subgrid_cover,
    )
    from ska_sdp_distributed_fourier_transform_tpu.ops.core import (
        extract_from_facet_fn,
        prepare_facet_mxu,
        prepare_facet_op,
    )
    from ska_sdp_distributed_fourier_transform_tpu.parallel import (
        ShardedSwiftly,
        make_tile_mesh,
    )
    from ska_sdp_distributed_fourier_transform_tpu.swift_configs import (
        SWIFT_CONFIGS,
    )

    params = dict(SWIFT_CONFIGS[args.swift_config])
    config = SwiftlyConfig(dtype=jnp.complex64, **params)
    core = config._core
    fc = make_full_facet_cover(config)
    sc = make_full_subgrid_cover(config)
    engine = ShardedSwiftly(core, fc, sc, make_tile_mesh(),
                            engine_mode=args.engine_mode,
                            fft_impl=args.fft_impl)

    N, yN, xM, c = core.N, core.yN_size, core.xM_size, core.xM_yN_size
    yB, xA = engine.yB_size, engine.xA_size
    Fb = core._Fb
    prec = engine.precision
    use_pallas = args.engine_mode == "pallas"
    prep_facet = (prepare_facet_mxu if args.fft_impl == "mxu"
                  and yN != 2048 else prepare_facet_op)

    # Device inputs at production shapes (random; values don't matter).
    from ska_sdp_distributed_fourier_transform_tpu.utils.transfer import (
        put_complex,
    )

    del put_complex, np
    F_pad = engine.F_pad

    # Built ON DEVICE: a host->device transfer of the 3+ GB BF_F array
    # takes minutes over the tunnelled attachment.
    @jax.jit
    def _make_bf():
        i = jnp.arange(F_pad * yN, dtype=core.real_dtype)[:, None]
        j = jnp.arange(yB, dtype=core.real_dtype)[None, :]
        v = jnp.sin(i * 0.37 + j * 0.11) * 0.01
        w = jnp.cos(i * 0.13 - j * 0.29) * 0.01
        return (v + 1j * w).astype(core.dtype).reshape(F_pad, yN, yB)

    BF_F = _make_bf()
    A0 = engine._dev_c("A0", engine._A0)
    A1 = engine._dev_c("A1", engine._A1)
    Fi = engine._dev_c("Fi", engine._Fi_xM)
    Fm = engine._dev_c("F", engine._F_xM)
    E0 = engine._dev_c("E0", engine._E0)
    E1 = engine._dev_c("E1", engine._E1)
    foff1 = jnp.asarray(engine._foff1, jnp.int32)
    fmask1 = jnp.asarray(engine._fmask1)
    cols = engine._all_col_args()

    def stage_body(k, env):
        """Stages 1..k of the fused forward+backward column pipeline."""
        BF_F = env["BF_F"]
        A0, A1, Fi, Fm = env["A0"], env["A1"], env["Fi"], env["Fm"]
        E0, E1 = env["E0"], env["E1"]
        foff1, fmask1 = env["foff1"], env["fmask1"]

        def body(carry, col):
            off0, sg_off1, valid, mask0, mask1 = col[:5]
            out = None

            # S1: column prepare (extract rows + axis-1 facet transform)
            def col_one(bf, o1):
                nm = extract_from_facet_fn(bf, off0, 0, N, yN, c)
                return prep_facet(nm, o1, 1, Fb, yN)

            NMBF_BF = jax.vmap(col_one)(BF_F, foff1)
            out = NMBF_BF
            if k >= 2:
                # S2: per-subgrid extraction [B, F, c, c]
                def per_sg(o1b):
                    return jax.vmap(
                        lambda nb: extract_from_facet_fn(
                            nb, o1b, 1, N, yN, c
                        )
                    )(NMBF_BF)

                X = jax.vmap(per_sg)(sg_off1)
                out = X
            if k >= 3:
                # S3: contribution sandwich (facet-summed)
                if use_pallas:
                    from ska_sdp_distributed_fourier_transform_tpu.ops \
                        .pallas_kernels import fused_sandwich

                    partial = fused_sandwich(A0, X, A1).astype(core.dtype)
                else:
                    partial = jnp.einsum(
                        "fqk,bfkl,frl->bqr", A0, X, A1, precision=prec
                    )
                out = partial
            if k >= 4:
                # S4: finish sandwich -> subgrids
                base = (xM // 2 - xA // 2
                        + jnp.arange(xA, dtype=jnp.int32))
                G0 = jnp.take(Fi, (base + off0) % xM, axis=0)
                G1 = jax.vmap(
                    lambda o: jnp.take(Fi, (base + o) % xM, axis=0)
                )(sg_off1)
                if use_pallas:
                    from ska_sdp_distributed_fourier_transform_tpu.ops \
                        .pallas_kernels import fused_lr_sandwich

                    sg = fused_lr_sandwich(G0, partial, G1).astype(
                        core.dtype
                    )
                else:
                    sg = jnp.einsum("qk,bkl,brl->bqr", G0, partial, G1,
                                    precision=prec)
                sg = sg * mask0[jnp.newaxis, :, jnp.newaxis]
                sg = sg * mask1[:, jnp.newaxis, :]
                out = sg
            if k >= 5:
                # S5: backward prepare sandwich -> FS
                P0 = jnp.take(Fm, (base + off0) % xM, axis=1)
                P1 = jax.vmap(
                    lambda o: jnp.take(Fm, (base + o) % xM, axis=1)
                )(sg_off1)
                if use_pallas:
                    FS = fused_lr_sandwich(P0, sg, P1).astype(core.dtype)
                else:
                    FS = jnp.einsum("iq,bqr,bjr->bij", P0, sg, P1,
                                    precision=prec)
                out = FS
            if k >= 6:
                # S6: backward extraction sandwich [B, F, c, c]
                if use_pallas:
                    from ska_sdp_distributed_fourier_transform_tpu.ops \
                        .pallas_kernels import fused_double_sandwich

                    NAF = fused_double_sandwich(E0, FS, E1).astype(
                        core.dtype
                    )
                else:
                    NAF = jnp.einsum("fki,bij,flj->bfkl", E0, FS, E1,
                                     precision=prec)
                out = NAF
            if k >= 7:
                # S7: column fold scatter + axis-1 finish rows
                s = jnp.floor_divide(sg_off1.astype(jnp.int32), N // yN)
                kk = jnp.arange(c, dtype=jnp.int32)
                idx = (
                    yN // 2 - c // 2
                    + jnp.mod(kk[jnp.newaxis, :] - s[:, jnp.newaxis], c)
                    + s[:, jnp.newaxis]
                ) % yN
                B = NAF.shape[0]
                xr = NAF.transpose(1, 2, 0, 3).reshape(-1, c, B * c)
                NAF_MNAF = jnp.zeros((F_pad, c, yN), dtype=core.dtype)
                NAF_MNAF = NAF_MNAF.at[:, :, idx.reshape(-1)].add(xr)
                from ska_sdp_distributed_fourier_transform_tpu.ops.core \
                    import finish_facet_fn, finish_facet_mxu

                fin = (finish_facet_mxu if args.fft_impl == "mxu"
                       and yN != 2048 else finish_facet_fn)
                rows = jax.vmap(
                    lambda a, o1: fin(a, o1, yB, 1, Fb)
                )(NAF_MNAF, foff1)
                rows = rows * fmask1[:, jnp.newaxis, :]
                out = rows

            if k >= 8:
                # S8: the padded-DUS accumulator fold on a real carried
                # accumulator pair (the full backward, matching the
                # production stream's carry)
                u = jnp.stack(
                    [jnp.real(rows), jnp.imag(rows)]
                ).astype(jnp.float32)
                s0 = jnp.floor_divide(off0.astype(jnp.int32), N // yN)
                u = jnp.roll(u, -s0, axis=2)
                start = (yN // 2 - c // 2 + s0) % yN
                zero = jnp.zeros((), jnp.int32)
                acc = carry[1]
                blk = jax.lax.dynamic_slice(
                    acc, (zero, zero, start, zero),
                    (2, acc.shape[1], c, acc.shape[3]),
                )
                acc = jax.lax.dynamic_update_slice(
                    acc, blk + u, (zero, zero, start, zero)
                )
                red = jnp.sum(jnp.abs(jnp.real(out))) + carry[0]
                return (red, acc), None

            if isinstance(carry, tuple):
                red = jnp.sum(jnp.abs(jnp.real(out))) + carry[0]
                return (red, carry[1]), None
            red = jnp.sum(jnp.abs(jnp.real(out))) + carry
            return red, None

        return body

    # Round-3 default pipeline: fused_prepare_rows (window+pad+four-step
    # +phase in one kernel), gather-fused contraction (per-subgrid
    # window extraction streamed inside the sandwich), fused finish rows
    # on the backward side — mirrors fwd_column_local_mm/_bwd_nafb_mm in
    # parallel/distributed.py under the wave-4 defaults.
    from ska_sdp_distributed_fourier_transform_tpu.ops.core import (
        _scale_off,
    )
    from ska_sdp_distributed_fourier_transform_tpu.ops.pallas_fft import (
        fused_finish_rows,
        fused_prepare_rows,
    )
    from ska_sdp_distributed_fourier_transform_tpu.ops.pallas_kernels \
        import (
            fused_double_sandwich,
            fused_gather_sandwich,
            fused_lr_sandwich,
        )

    import numpy as _np

    fb_yB = _np.asarray(core._Fb, dtype=_np.float64)[
        (yN - 1) // 2 - yB // 2:
    ][:yB].astype(_np.float32)
    ph1 = engine._dev_c("ph1", engine._ph1)

    def stage_body_r3(k, env):
        BF_F = env["BF_F"]
        A0, A1, Fi, Fm = env["A0"], env["A1"], env["Fi"], env["Fm"]
        E0, E1 = env["E0"], env["E1"]
        foff1, fmask1 = env["foff1"], env["fmask1"]
        ph1 = env["ph1"]

        def body(carry, col):
            off0, sg_off1, valid, mask0, mask1 = col[:5]
            out = None

            # S1: column prepare — extract rows + fused transform kernel
            rows = jax.vmap(
                lambda bf: extract_from_facet_fn(bf, off0, 0, N, yN, c)
            )(BF_F)  # [F, c, yB]
            NMBF_BF = fused_prepare_rows(rows, fb_yB, ph1, yN).astype(
                core.dtype
            )
            out = NMBF_BF
            if k >= 2:
                # S2: gather-fused contribution sandwich (extraction +
                # facet-summed contraction in one kernel)
                partial = fused_gather_sandwich(
                    A0, NMBF_BF, _scale_off(sg_off1, N // yN), A1
                ).astype(core.dtype)  # [B, xM, xM]
                out = partial
            if k >= 3:
                # S3: finish sandwich + masks -> subgrids
                base = (xM // 2 - xA // 2
                        + jnp.arange(xA, dtype=jnp.int32))
                G0 = jnp.take(Fi, (base + off0) % xM, axis=0)
                G1 = jax.vmap(
                    lambda o: jnp.take(Fi, (base + o) % xM, axis=0)
                )(sg_off1)
                sg = fused_lr_sandwich(G0, partial, G1).astype(
                    core.dtype
                )
                sg = sg * mask0[jnp.newaxis, :, jnp.newaxis]
                sg = sg * mask1[:, jnp.newaxis, :]
                out = sg
            if k >= 4:
                # S4: backward prepare sandwich -> FS
                P0 = jnp.take(Fm, (base + off0) % xM, axis=1)
                P1 = jax.vmap(
                    lambda o: jnp.take(Fm, (base + o) % xM, axis=1)
                )(sg_off1)
                FS = fused_lr_sandwich(P0, sg, P1).astype(core.dtype)
                out = FS
            if k >= 5:
                # S5: backward extraction sandwich [B, F, c, c]
                NAF = fused_double_sandwich(E0, FS, E1).astype(
                    core.dtype
                )
                out = NAF
            if k >= 6:
                # S6: column fold scatter -> NAF_MNAF [F, c, yN]
                s = jnp.floor_divide(
                    sg_off1.astype(jnp.int32), N // yN
                )
                kk = jnp.arange(c, dtype=jnp.int32)
                idx = (
                    yN // 2 - c // 2
                    + jnp.mod(kk[jnp.newaxis, :] - s[:, jnp.newaxis], c)
                    + s[:, jnp.newaxis]
                ) % yN
                B = NAF.shape[0]
                xr = NAF.transpose(1, 2, 0, 3).reshape(-1, c, B * c)
                NAF_MNAF = jnp.zeros((F_pad, c, yN), dtype=core.dtype)
                NAF_MNAF = NAF_MNAF.at[:, :, idx.reshape(-1)].add(xr)
                out = NAF_MNAF
            if k >= 7:
                # S7: fused finish rows (four-step fwd DFT + wrap gather
                # + Fb window + mask)
                rows_o = fused_finish_rows(
                    NAF_MNAF, fb_yB, foff1, fmask1, yB
                ).astype(core.dtype)
                out = rows_o
            if k >= 8:
                # S8: padded-DUS accumulator pair fold (carried)
                u = jnp.stack(
                    [jnp.real(rows_o), jnp.imag(rows_o)]
                ).astype(jnp.float32)
                s0 = jnp.floor_divide(off0.astype(jnp.int32), N // yN)
                u = jnp.roll(u, -s0, axis=2)
                start = (yN // 2 - c // 2 + s0) % yN
                zero = jnp.zeros((), jnp.int32)
                acc = carry[1]
                blk = jax.lax.dynamic_slice(
                    acc, (zero, zero, start, zero),
                    (2, acc.shape[1], c, acc.shape[3]),
                )
                acc = jax.lax.dynamic_update_slice(
                    acc, blk + u, (zero, zero, start, zero)
                )
                red = jnp.sum(jnp.abs(jnp.real(out))) + carry[0]
                return (red, acc), None

            if isinstance(carry, tuple):
                red = jnp.sum(jnp.abs(jnp.real(out))) + carry[0]
                return (red, carry[1]), None
            red = jnp.sum(jnp.abs(jnp.real(out))) + carry
            return red, None

        return body

    results = {}
    prev = 0.0
    stage_names = {
        1: "S1 column-prepare (extract + yN transform)",
        2: "S2 per-subgrid extraction",
        3: "S3 contribution sandwich",
        4: "S4 finish sandwich + masks",
        5: "S5 backward prepare sandwich",
        6: "S6 backward extraction sandwich",
        7: "S7 fold scatter + axis-1 finish",
        8: "S8 accumulator DUS fold (carried)",
    }
    stage_names_r3 = {
        1: "S1 column-prepare (extract rows + fused transform)",
        2: "S2 gather-fused contribution sandwich",
        3: "S3 finish sandwich + masks",
        4: "S4 backward prepare sandwich",
        5: "S5 backward extraction sandwich",
        6: "S6 column fold scatter",
        7: "S7 fused finish rows",
        8: "S8 accumulator DUS fold (carried)",
    }
    if args.pipeline == "r3":
        stage_names = stage_names_r3
        stage_body = stage_body_r3
    C = engine.plan.n_columns

    # Big device arrays must be jit ARGUMENTS, not closure captures —
    # captured concrete arrays become compile-time constants and stall
    # compilation at these sizes.
    def make_prog(k):
        @jax.jit
        def prog(BF_F_, A0_, A1_, Fi_, Fm_, E0_, E1_, foff1_, fmask1_,
                 ph1_, cols_):
            nonlocal_env = dict(
                BF_F=BF_F_, A0=A0_, A1=A1_, Fi=Fi_, Fm=Fm_, E0=E0_,
                E1=E1_, foff1=foff1_, fmask1=fmask1_, ph1=ph1_,
            )
            body = stage_body(k, nonlocal_env)
            if k >= 8:
                acc0 = jnp.zeros(
                    (2, F_pad, yN + c, yB), core.real_dtype
                )
                init = (jnp.zeros((), core.real_dtype), acc0)
                (red, acc), _ = jax.lax.scan(body, init, cols_)
                return red + jnp.sum(acc[:, :, ::997, ::499])
            return jax.lax.scan(
                body, jnp.zeros((), core.real_dtype), cols_
            )[0]

        return lambda: prog(BF_F, A0, A1, Fi, Fm, E0, E1, foff1,
                            fmask1, ph1, cols)

    for k in range(1, 9):
        prog = make_prog(k)
        r = prog()
        r.block_until_ready()  # compile+run
        best = float("inf")
        for _ in range(args.reps):
            t0 = time.perf_counter()
            prog().block_until_ready()
            best = min(best, time.perf_counter() - t0)
        per_col = best / C * 1e3
        results[k] = (best, per_col, per_col - prev)
        print(
            f"k={k} {stage_names[k]}: total {best*1e3:7.1f} ms, "
            f"{per_col:6.2f} ms/col, marginal {per_col - prev:+6.2f}",
            flush=True,
        )
        prev = per_col
    print(json.dumps({str(k): v for k, v in results.items()}))


if __name__ == "__main__":
    main()
