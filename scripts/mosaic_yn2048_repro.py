"""Minimised repro for the yN=2048 Mosaic/XLA kernel fault.

Context (parallel/distributed.py `_build_programs`): with
``fft_impl="mxu"`` the engine's yN-scale facet transforms are four-step
factor-matmul DFTs (ops/fft_mxu.py). At yN=2048 — and only 2048; 4096
and 8192 are validated good — compiling the transform into the same
module as the column ``lax.scan`` produces a runtime TPU kernel fault,
even when only out-of-scan code uses the mxu path. The engine therefore
demotes itself to the XLA FFT at yN=2048 (~5% cost on 4k-class configs).

This script is the smallest reproducer we found: a scan whose body runs
one ``fft_mxu`` of length 2048 over a [512, 2048] batch. Run it after a
jax/Mosaic upgrade; if it completes, re-test the FULL engine too
(``bench.py --swift_config 4k[1]-n2k-512`` with the demotion commented
out) before dropping the demotion in `ShardedSwiftly._build_programs`
(and `StreamedSwiftly.__init__`).

Status 2026-08-17, jax 0.9.0: this minimised repro runs CLEAN but the
full 4k[1]-n2k-512 engine still kernel-faults — the repro
under-constrains the trigger (likely needs the full stream module:
Pallas sandwich kernels + collectives + the larger scan). The demotion
stays.

WARNING: on the tunnelled single-chip attachment a kernel fault wedges
the far-end TPU server for 20-60 min. Run this only when nothing else
needs the chip, in a fresh process, under `timeout`:

    timeout 600 python scripts/mosaic_yn2048_repro.py
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def engine_bisect(engine_mode, fused_fft, acc_mode, columns,
                  gather_fused=False):
    """Run the REAL 4k[1]-n2k-512 fused stream with the yN=2048 mxu
    demotion bypassed (SWIFTLY_FORCE_MXU_YN2048=1) and the given engine
    feature toggles. The full default engine is known to kernel-fault;
    removing features until a combination runs clean identifies the
    load-bearing trigger, which the minimal repro above (plain fft_mxu
    in a scan) under-constrains.

    Bisection ladder (each run is one chip compile + bounded stream):
      full:   --engine_mode pallas --fused_fft fwd --acc_mode carry
      -pallas: --engine_mode matmul  (drops the sandwich kernels)
      -fft:   --fused_fft off        (drops the fused transform kernel)
      -carry: --acc_mode ys          (drops the DUS carry fold)
    Exit 0 = ran clean; a kernel fault hangs/aborts the process (run
    under `timeout`, expect a ~20 min far-end wedge after a fault).
    """
    os.environ["SWIFTLY_FORCE_MXU_YN2048"] = "1"
    import jax
    import numpy as np

    from ska_sdp_distributed_fourier_transform_tpu import (
        SwiftlyConfig,
        make_full_facet_cover,
        make_full_subgrid_cover,
    )
    from ska_sdp_distributed_fourier_transform_tpu.api_helper import (
        make_facet,
    )
    from ska_sdp_distributed_fourier_transform_tpu.parallel import (
        ShardedSwiftly,
        make_tile_mesh,
    )
    from ska_sdp_distributed_fourier_transform_tpu.swift_configs import (
        SWIFT_CONFIGS,
    )

    params = dict(SWIFT_CONFIGS["4k[1]-n2k-512"])
    config = SwiftlyConfig(dtype=np.complex64, **params)
    fcs = make_full_facet_cover(config)
    sgs = make_full_subgrid_cover(config)
    eng = ShardedSwiftly(
        config._core, fcs, sgs, make_tile_mesh(),
        engine_mode=engine_mode, fused_fft=fused_fft,
        acc_mode=acc_mode, fft_impl="mxu",
        # pinned (round 3 made it a size-gated default) so each rung
        # varies exactly one feature against the round-2 baseline
        gather_fused=gather_fused,
    )
    assert eng.fft_impl == "mxu", "demotion bypass did not take"
    if columns:
        # bounded per-column driving (compiles the same column programs)
        facets = [make_facet(config.image_size, c, [(1.0, 1, 0)])
                  for c in fcs]
        packed = eng.pack_facets(facets)
        BF_F = eng.prepare_facets(packed)
        accum = eng.zero_accumulator()
        for ci in range(min(columns, eng.plan.n_columns)):
            sg = eng.forward_column(BF_F, ci)
            accum = eng.backward_column(sg, ci, accum)
        jax.block_until_ready(accum)
    else:
        facets = [make_facet(config.image_size, c, [(1.0, 1, 0)])
                  for c in fcs]
        out, n = eng.roundtrip(eng.pack_facets(facets))
        jax.block_until_ready(out)
    print(f"CLEAN: engine_mode={engine_mode} fused_fft={fused_fft} "
          f"acc_mode={acc_mode} gather_fused={gather_fused} "
          f"columns={columns or 'full'} "
          "ran without a kernel fault at yN=2048/mxu")


def main(n=2048, rows=512, steps=4):
    import jax
    import jax.numpy as jnp

    from ska_sdp_distributed_fourier_transform_tpu.ops.fft_mxu import (
        fft_mxu,
    )

    print(f"jax {jax.__version__}, devices {jax.devices()}", flush=True)

    @jax.jit
    def prog(seed):
        i = jnp.arange(rows, dtype=jnp.float32)[:, None]
        j = jnp.arange(n, dtype=jnp.float32)[None, :]
        x = ((jnp.sin(i * 0.3 + j * 0.01) + seed)
             + 1j * jnp.cos(i * 0.7 - j * 0.03)).astype(jnp.complex64)

        def body(carry, _):
            y = fft_mxu(x * (1.0 + carry), inverse=True)
            return jnp.sum(jnp.abs(jnp.real(y))) * 1e-9, None

        out, _ = jax.lax.scan(
            body, jnp.zeros((), jnp.float32), None, length=steps
        )
        return out

    r = prog(jnp.float32(0.5))
    r.block_until_ready()
    print(f"OK: fft_mxu(n={n}) inside lax.scan ran clean; result {r}")
    print("-> the yN=2048 demotion in ShardedSwiftly/StreamedSwiftly "
          "can be re-tested against the full engine")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--engine", action="store_true",
                    help="run the real 4k engine with the demotion "
                    "bypassed instead of the minimal scan repro")
    ap.add_argument("--engine_mode", default="pallas",
                    choices=["pallas", "matmul", "fft"])
    ap.add_argument("--fused_fft", default="fwd",
                    choices=["off", "fwd", "bwd", "both"])
    ap.add_argument("--acc_mode", default="carry",
                    choices=["carry", "ys"])
    ap.add_argument("--columns", type=int, default=0,
                    help=">0: bounded per-column driving instead of "
                    "the fused stream")
    ap.add_argument("--gather_fused", action="store_true",
                    help="enable the gather-fused contraction kernel "
                    "(pinned OFF otherwise regardless of the engine "
                    "default)")
    args = ap.parse_args()
    if args.engine:
        engine_bisect(args.engine_mode, args.fused_fft, args.acc_mode,
                      args.columns, args.gather_fused)
    else:
        main()
