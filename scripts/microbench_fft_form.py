"""A/B the four-step tile formulations (tt vs ls) on the real chip.

Dependency-chained scan at the S1 production shape (see the tunnel
micro-timing trap note in BENCH_SWEEP.md — one dispatch, many chained
calls, so the duplicate-dispatch cache can't fake the number).
"""

import argparse
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--F", type=int, default=9)
    ap.add_argument("--rows", type=int, default=256)
    ap.add_argument("--n", type=int, default=8192)
    ap.add_argument("--iters", type=int, default=30)
    args = ap.parse_args()

    from ska_sdp_distributed_fourier_transform_tpu.ops.pallas_fft import (
        four_step_pallas,
    )
    from ska_sdp_distributed_fourier_transform_tpu.utils.chiplock import (
        acquire_chip_lock,
    )

    acquire_chip_lock("microbench_fft_form")

    # complex must be constructed INSIDE jit from float operands — the
    # tunnel backend cannot execute eager complex primitives (see verify
    # SKILL.md: complex→host transfer / eager complex are UNIMPLEMENTED)
    k0, k1 = jax.random.split(jax.random.PRNGKey(0))
    shape = (args.F, args.rows, args.n)
    xre = jax.random.normal(k0, shape, jnp.float32)
    xim = jax.random.normal(k1, shape, jnp.float32)

    bytes_per_call = 2 * args.F * args.rows * args.n * 8  # c64 in + out
    for form, permuted in (("tt", False), ("ls", False), ("bd", False),
                           ("bd", True)):
        def one(carry, _):
            y = four_step_pallas(carry, inverse=False, form=form,
                                 permuted=permuted)
            # keep magnitude bounded so the chain doesn't overflow
            return y * (1.0 / args.n), None

        @jax.jit
        def chain(re, im):
            x0 = jax.lax.complex(re, im)
            y, _ = jax.lax.scan(one, x0, None, length=args.iters)
            # scalar output: a big remote array's block_until_ready
            # does not actually wait over the tunnel
            return jnp.vdot(y, y).real

        float(chain(xre, xim))  # compile + warm
        # distinct input per rep — the tunnel short-circuits duplicate
        # (executable, input) dispatches; float() forces the scalar to
        # host because block_until_ready does not wait over the tunnel
        scales = [1.0 + 1e-6 * i for i in range(1, 4)]
        best = float("inf")
        for s in scales:
            re_i = jax.block_until_ready(xre * s)
            t0 = time.perf_counter()
            float(chain(re_i, xim))
            best = min(best, time.perf_counter() - t0)
        ms = best / args.iters * 1e3
        gbps = bytes_per_call / (best / args.iters) / 1e9
        name = form + ("+perm" if permuted else "")
        print(f"form={name}: {ms:.3f} ms/call  {gbps:.1f} GB/s effective")


if __name__ == "__main__":
    main()
