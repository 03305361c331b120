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

import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


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
    main()
