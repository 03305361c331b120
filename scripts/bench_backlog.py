"""Unattended on-chip measurement queue for the round-3 bench backlog.

The axon TPU tunnel died mid-round-2 (BENCH_r02.json) leaving every
late-round-2 feature interpret-verified only. This script drains the
measurement backlog the moment the tunnel returns, without a human in
the loop:

1. wait for the relay port to accept connections,
2. probe chip aliveness in a fresh process (a wedged far end hangs at
   execute for ~15-25 min, then recovers — see the tunnel-quirks notes
   in BENCH_SWEEP.md),
3. run each queued ``bench.py`` invocation in a fresh subprocess under
   ``timeout``, appending one JSON record per item to
   ``BENCH_SWEEP_r03.jsonl``,
4. after fault-risky items (first-ever hardware compiles of Mosaic
   kernels), re-probe aliveness and sleep out a wedge before moving on.

Run: ``python scripts/bench_backlog.py [--no_wait] [--only NAME,...]``
"""

from __future__ import annotations

import argparse
import json
import os
import socket
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "BENCH_SWEEP_r03.jsonl")
PY = sys.executable
sys.path.insert(0, REPO)

# (name, extra argv, extra env, timeout_s, fault_risky)
QUEUE = [
    # 1. headline re-measure (round-2 record: 1101 sg/s @ 16k)
    ("headline_16k", ["--skip_baseline"], {}, 2400, False),
    # 2. gather-fused contribution kernel (built round 2, never timed)
    ("gather_fused_16k", ["--skip_baseline"],
     {"SWIFTLY_GATHER_FUSED": "1"}, 2400, True),
    ("gather_fused_8k",
     ["--swift_config", "8k[1]-n4k-512", "--skip_baseline"],
     {"SWIFTLY_GATHER_FUSED": "1"}, 1800, False),
    # 3. ys accumulator mode (round 3: S8 fold out of the scan carry)
    ("acc_ys_16k", ["--skip_baseline"], {"SWIFTLY_ACC": "ys"},
     2400, False),
    # 4. split tier: XLA formulation sanity (round-2 record: 74.7 sg/s)
    ("split_xla_4k",
     ["--swift_config", "4k[1]-n2k-512", "--precision", "split",
      "--split_kernel", "xla", "--skip_baseline"], {}, 2400, False),
    # 5. split tier: fused Pallas kernel — FIRST hardware compile of
    #    ops/pallas_split.py (VMEM-modeled, interpret-verified; a
    #    Mosaic fault wedges the far end ~20 min)
    ("split_pallas_4k",
     ["--swift_config", "4k[1]-n2k-512", "--precision", "split",
      "--split_kernel", "pallas", "--skip_baseline"], {}, 3000, True),
    # 6. scan-shape knobs at 16k
    ("cols2_16k", ["--skip_baseline"],
     {"SWIFTLY_COLUMNS_PER_STEP": "2"}, 2400, False),
    ("unroll2_16k", ["--skip_baseline"],
     {"SWIFTLY_SCAN_UNROLL": "2"}, 2400, False),
    # 7. fused bwd transform together with the ys accumulator (the
    #    round-2 'both' regression was VMEM pressure; ys changes it)
    ("acc_ys_fft_both_16k", ["--skip_baseline"],
     {"SWIFTLY_ACC": "ys", "SWIFTLY_FUSED_FFT": "both"}, 2400, True),
    # 8. host-streamed tier (bounded columns: the tunnel link is the
    #    bottleneck, this records the lower bound + phase split)
    ("host_tier_8k",
     ["--swift_config", "8k[1]-n4k-512", "--host_tier", "--columns",
      "4", "--skip_baseline"], {}, 3600, False),
]

# Wave 2 (after the first drain, 2026-08-18): gather_fused won
# (+8.9% at 16k, bit-identical RMSE), ys/cols2 lost, split_pallas
# compile-OOMed (VMEM planner recalibrated to a 12.8M budget —
# ops/pallas_split.py). Combos of the winner + the fixed kernel.
WAVE2 = [
    ("split_pallas_4k_v2",
     ["--swift_config", "4k[1]-n2k-512", "--precision", "split",
      "--split_kernel", "pallas", "--skip_baseline"], {}, 3000, True),
    ("gf_fft_both_16k", ["--skip_baseline"],
     {"SWIFTLY_GATHER_FUSED": "1", "SWIFTLY_FUSED_FFT": "both"},
     2400, True),
    ("gf_4k", ["--swift_config", "4k[1]-n2k-512", "--skip_baseline"],
     {"SWIFTLY_GATHER_FUSED": "1"}, 1800, False),
    ("gf_8k_n8k_256",
     ["--swift_config", "8k[1]-n8k-256", "--skip_baseline"],
     {"SWIFTLY_GATHER_FUSED": "1"}, 1800, False),
    ("gf_prec_default_16k",
     ["--precision", "default", "--skip_baseline"],
     {"SWIFTLY_GATHER_FUSED": "1"}, 2400, False),
    ("gf_dir_16k", ["--direction", "--skip_baseline"],
     {"SWIFTLY_GATHER_FUSED": "1"}, 2400, False),
]

# Wave 3: the gf+fft_both combo won at 16k (1234.9 @ 1.10e-7 vs
# 1097 @ 1.40e-7) and the fixed split kernel measured 195.9 sg/s at
# 4k. Coverage of the winning combo across the family + direction
# splits + the host tier with the eager-zeros fix.
WAVE3 = [
    ("gf_both_8k",
     ["--swift_config", "8k[1]-n4k-512", "--skip_baseline"],
     {"SWIFTLY_GATHER_FUSED": "1", "SWIFTLY_FUSED_FFT": "both"},
     1800, False),
    ("gf_both_2k",
     ["--swift_config", "2k[1]-n1k-512", "--skip_baseline"],
     {"SWIFTLY_GATHER_FUSED": "1", "SWIFTLY_FUSED_FFT": "both"},
     1800, True),
    ("split_pallas_8k",
     ["--swift_config", "8k[1]-n4k-512", "--precision", "split",
      "--split_kernel", "pallas", "--skip_baseline"], {}, 3000, True),
    ("gf_both_fwd_16k", ["--direction", "forward", "--skip_baseline"],
     {"SWIFTLY_GATHER_FUSED": "1", "SWIFTLY_FUSED_FFT": "both"},
     2400, False),
    ("gf_both_bwd_16k", ["--direction", "backward", "--skip_baseline"],
     {"SWIFTLY_GATHER_FUSED": "1", "SWIFTLY_FUSED_FFT": "both"},
     2400, False),
    ("host_tier_8k_v2",
     ["--swift_config", "8k[1]-n4k-512", "--host_tier", "--columns",
      "4", "--skip_baseline"], {}, 3600, False),
]

# Wave 4: the measured winners became the engine defaults
# (gather_fused at yN>=2048, fused_fft=both at yN>=4096 with gf,
# split kernel auto=pallas on TPU). Re-measure the family with NO env
# knobs — exactly the driver's bench invocation.
WAVE4 = [
    ("default_16k", ["--skip_baseline"], {}, 2400, False),
    ("default_8k",
     ["--swift_config", "8k[1]-n4k-512", "--skip_baseline"], {},
     1800, False),
    ("default_8k_n8k_256",
     ["--swift_config", "8k[1]-n8k-256", "--skip_baseline"], {},
     1800, True),
    ("default_4k",
     ["--swift_config", "4k[1]-n2k-512", "--skip_baseline"], {},
     1800, False),
    ("default_2k",
     ["--swift_config", "2k[1]-n1k-512", "--skip_baseline"], {},
     1800, False),
    ("default_split_4k",
     ["--swift_config", "4k[1]-n2k-512", "--precision", "split",
      "--skip_baseline"], {}, 3000, False),
]

# Wave 7 (round 5): close out the wave-6 gaps with the chip lock in
# place. bd+slices measured 1412.1 sg/s @ 5.88e-8 at 16k (wave 6) and
# became the default at yN >= 8192, so default_16k re-measures the
# driver's exact invocation; 8k/4k decide whether the gate extends
# down; split_16k is the VERDICT-6 production-size split-tier row;
# the two _retry items re-test the wave-6 RESOURCE_EXHAUSTED cases on
# an uncontended chip. Records go to BENCH_SWEEP_r05.jsonl.
WAVE7 = [
    ("default_16k", ["--skip_baseline"], {}, 2400, False),
    ("bd_slices_8k",
     ["--swift_config", "8k[1]-n4k-512", "--skip_baseline"],
     {"SWIFTLY_FFT_FORM": "bd", "SWIFTLY_EXTRACT0": "slices"},
     1800, False),
    ("bd_slices_4k",
     ["--swift_config", "4k[1]-n2k-512", "--skip_baseline"],
     {"SWIFTLY_FFT_FORM": "bd", "SWIFTLY_EXTRACT0": "slices"},
     1800, False),
    ("split_16k",
     ["--precision", "split", "--skip_baseline"], {}, 3600, True),
    ("microbench_forms", [], {}, 1800, False,
     "scripts/microbench_fft_form.py"),
    ("phasefused_16k_retry", ["--skip_baseline"],
     {"SWIFTLY_PHASE_FUSED": "1"}, 2400, True),
    ("slices_16k_retry", ["--skip_baseline"],
     {"SWIFTLY_FFT_FORM": "tt", "SWIFTLY_EXTRACT0": "slices"},
     2400, True),
    # bd-kernel tile-geometry knobs (TR/VMEM were neutral for tt —
    # the bd tile skips the lane transpose, so its VMEM/occupancy
    # trade-off is different and unmeasured)
    ("bd_tr64_16k", ["--skip_baseline"],
     {"SWIFTLY_FFT_TR": "64", "SWIFTLY_FFT_VMEM": "28"}, 2400, False),
    ("bd_tr16_16k", ["--skip_baseline"],
     {"SWIFTLY_FFT_TR": "16", "SWIFTLY_FFT_VMEM": "14"}, 2400, False),
]

# Wave 5 (round-3 session 3): the scan-hoisting knobs — gather-
# formulated column fold (SWIFTLY_FOLD), pre-transformed forward
# prepare (SWIFTLY_PREP=full), post-scan backward finish
# (SWIFTLY_FINISH=post) — singly then combined, plus the fresh r3
# stage bisection ordering them. All CPU-verified to the same oracle
# RMSE; unmeasured on hardware until this wave.
WAVE5 = [
    ("ctl_16k", ["--skip_baseline"], {}, 2400, False),
    ("fold_gather_16k", ["--skip_baseline"],
     {"SWIFTLY_FOLD": "gather"}, 2400, False),
    ("fold_gatherm_16k", ["--skip_baseline"],
     {"SWIFTLY_FOLD": "gatherm"}, 2400, False),
    ("prep_full_16k", ["--skip_baseline"],
     {"SWIFTLY_PREP": "full"}, 2400, False),
    ("finish_post_16k", ["--skip_baseline"],
     {"SWIFTLY_FINISH": "post"}, 2400, False),
    ("hoisted_16k", ["--skip_baseline"],
     {"SWIFTLY_FOLD": "gather", "SWIFTLY_PREP": "full",
      "SWIFTLY_FINISH": "post"}, 2400, False),
    ("hoisted_8k",
     ["--swift_config", "8k[1]-n4k-512", "--skip_baseline"],
     {"SWIFTLY_FOLD": "gather", "SWIFTLY_PREP": "full",
      "SWIFTLY_FINISH": "post"}, 1800, False),
    ("hoisted_4k",
     ["--swift_config", "4k[1]-n2k-512", "--skip_baseline"],
     {"SWIFTLY_FOLD": "gather", "SWIFTLY_PREP": "full",
      "SWIFTLY_FINISH": "post"}, 1800, False),
]

# Round-4 wave: the movement-minimising S1/S7 formulations built
# while the 64k run held the chip — bd four-step tiles (fused
# window+pad input, permuted finish output) and the slice-based
# forward extraction. Records go to BENCH_SWEEP_r04.jsonl.
WAVE6 = [
    # round-3-exact engine (phase-fused prepare/finish off) = the
    # same-session control every other item compares against
    ("ctl_r3_16k", ["--skip_baseline"],
     {"SWIFTLY_PHASE_FUSED": "0"}, 2400, False),
    # the fused prepare/finish PHASES alone (new default)
    ("phasefused_16k", ["--skip_baseline"], {}, 2400, False),
    # first hardware compile of the bd tiles + pad_spec input
    ("bd_16k", ["--skip_baseline"],
     {"SWIFTLY_FFT_FORM": "bd"}, 2400, True),
    ("slices_16k", ["--skip_baseline"],
     {"SWIFTLY_EXTRACT0": "slices"}, 2400, False),
    ("bd_slices_16k", ["--skip_baseline"],
     {"SWIFTLY_FFT_FORM": "bd", "SWIFTLY_EXTRACT0": "slices"},
     2400, False),
    ("bd_slices_8k",
     ["--swift_config", "8k[1]-n4k-512", "--skip_baseline"],
     {"SWIFTLY_FFT_FORM": "bd", "SWIFTLY_EXTRACT0": "slices"},
     1800, False),
    ("bd_slices_4k",
     ["--swift_config", "4k[1]-n2k-512", "--skip_baseline"],
     {"SWIFTLY_FFT_FORM": "bd", "SWIFTLY_EXTRACT0": "slices"},
     1800, False),
    # kernel-level A/B at the S1 shape (tt/ls/bd/bd+perm)
    ("microbench_forms", [], {}, 1800, False,
     "scripts/microbench_fft_form.py"),
]

# yN=2048 Mosaic-fault bisection (scripts/mosaic_yn2048_repro.py
# --engine): the full default engine is known to fault with the
# demotion bypassed; each rung removes one feature. Every FAULT costs
# a ~20 min far-end wedge, so this ladder runs LAST. A rung that exits
# 0 ran clean — the previously-removed feature is the trigger.
REPRO_LADDER = [
    ("yn2048_full", ["--engine"], {}, 1800, True),
    ("yn2048_no_pallas", ["--engine", "--engine_mode", "matmul"],
     {}, 1800, True),
    ("yn2048_no_fusedfft", ["--engine", "--fused_fft", "off"],
     {}, 1800, True),
    ("yn2048_acc_ys", ["--engine", "--acc_mode", "ys"], {}, 1800, True),
    ("yn2048_percol", ["--engine", "--columns", "2"], {}, 1800, True),
]


def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)


def port_open(host="127.0.0.1", port=None, timeout=3.0):
    if port is None:
        # SWIFTLY_RELAY_PORT lets tests point the probe at a dead port
        # so the queue never touches the real chip from a test run
        port = int(os.environ.get("SWIFTLY_RELAY_PORT", "8082"))
    try:
        with socket.create_connection((host, port), timeout=timeout):
            return True
    except OSError:
        return False


def chip_alive(timeout_s=360):
    """Trivial dependency-chained compute in a fresh process."""
    code = (
        "import jax, jax.numpy as jnp;"
        "x = jnp.ones((256, 256), jnp.bfloat16);"
        "y = (x @ x).sum();"
        "print('ALIVE', float(y))"
    )
    try:
        r = subprocess.run(
            [PY, "-c", code], capture_output=True, text=True,
            timeout=timeout_s,
        )
        return r.returncode == 0 and "ALIVE" in r.stdout
    except subprocess.TimeoutExpired:
        return False


def wait_alive(max_wait_s=2400):
    """Wait out a wedge (observed recovery ~15-25 min; f64 wedges
    longer)."""
    t0 = time.time()
    while time.time() - t0 < max_wait_s:
        if chip_alive():
            return True
        log("chip not responding; sleeping 300s (wedge recovery)")
        time.sleep(300)
    return False


def record(entry):
    with open(OUT, "a") as f:
        f.write(json.dumps(entry) + "\n")


def run_item(name, argv, env_extra, timeout_s, script="bench.py"):
    env = dict(os.environ, SWIFTLY_BENCH_NO_PROBE="1", **env_extra)
    cmd = [PY, os.path.join(REPO, script)] + argv
    log(f"running {name}: {' '.join(argv)} env={env_extra}")
    t0 = time.time()
    try:
        r = subprocess.run(
            cmd, capture_output=True, text=True, timeout=timeout_s,
            cwd=REPO, env=env,
        )
    except subprocess.TimeoutExpired:
        record({"name": name, "env": env_extra, "argv": argv,
                "status": "timeout", "elapsed_s": round(time.time() - t0)})
        log(f"{name}: TIMEOUT after {timeout_s}s")
        return "timeout"
    result = None
    for line in r.stdout.splitlines():
        line = line.strip()
        if line.startswith("{"):
            try:
                result = json.loads(line)
            except json.JSONDecodeError:
                pass
    ok = r.returncode == 0
    record({
        "name": name, "env": env_extra, "argv": argv,
        "status": "ok" if ok else "error",
        "returncode": r.returncode,
        "elapsed_s": round(time.time() - t0),
        "result": result,
        "stdout_tail": r.stdout[-400:] if result is None else None,
        "stderr_tail": r.stderr[-1500:] if r.returncode else
        r.stderr[-400:],
    })
    log(f"{name}: rc={r.returncode} "
        f"{result.get('value') if result else 'no result'}")
    return "ok" if ok else "error"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--no_wait", action="store_true",
                    help="fail immediately if the tunnel is down")
    ap.add_argument("--only", default=None,
                    help="comma-separated item names to run")
    ap.add_argument("--max_tunnel_wait_h", type=float, default=12.0)
    ap.add_argument("--repro_ladder", action="store_true",
                    help="also run the yN=2048 Mosaic-fault bisection "
                    "(each fault costs a ~20 min wedge; runs last)")
    ap.add_argument("--wave2", action="store_true",
                    help="run the wave-2 combo queue instead of the "
                    "round-start backlog")
    ap.add_argument("--wave3", action="store_true",
                    help="run the wave-3 coverage queue")
    ap.add_argument("--wave4", action="store_true",
                    help="run the wave-4 new-defaults queue")
    ap.add_argument("--wave5", action="store_true",
                    help="run the wave-5 scan-hoisting queue")
    ap.add_argument("--wave6", action="store_true",
                    help="run the round-4 bd/extract0 queue "
                    "(records to BENCH_SWEEP_r04.jsonl)")
    ap.add_argument("--wave7", action="store_true",
                    help="run the round-5 close-out queue "
                    "(records to BENCH_SWEEP_r05.jsonl)")
    args = ap.parse_args()

    base = (WAVE7 if args.wave7 else WAVE6 if args.wave6
            else WAVE5 if args.wave5
            else WAVE4 if args.wave4
            else WAVE3 if args.wave3
            else WAVE2 if args.wave2 else QUEUE)
    global OUT
    if args.wave6:
        OUT = os.path.join(REPO, "BENCH_SWEEP_r04.jsonl")
    if args.wave7:
        OUT = os.path.join(REPO, "BENCH_SWEEP_r05.jsonl")
    queue = [q if len(q) == 6 else q + ("bench.py",) for q in base]
    if args.repro_ladder:
        queue += [
            q + ("scripts/mosaic_yn2048_repro.py",)
            for q in REPRO_LADDER
        ]
    if args.only:
        names = set(args.only.split(","))
        queue = [q for q in queue if q[0] in names]

    t0 = time.time()
    while not port_open():
        if args.no_wait:
            log("tunnel down (--no_wait); exiting 2")
            sys.exit(2)
        if time.time() - t0 > args.max_tunnel_wait_h * 3600:
            log("tunnel never came back; exiting 2")
            sys.exit(2)
        time.sleep(60)
    log("tunnel port open")
    # Serialise chip users: hold the lock for the whole drain — the
    # aliveness probe below already touches the chip — (our bench.py
    # children skip acquisition via the inherited held-marker env),
    # and PARK — stop before the next item — the moment the park file
    # appears, so the driver's end-of-round bench finds the chip free
    # instead of queued behind us.
    from ska_sdp_distributed_fourier_transform_tpu.utils.chiplock \
        import acquire_chip_lock, chip_parked

    acquire_chip_lock("bench_backlog " + " ".join(sys.argv[1:]))
    if not wait_alive():
        log("chip never became responsive; exiting 2")
        sys.exit(2)
    log("chip alive; draining queue")
    record({"name": "_start", "ts": time.strftime("%F %T"),
            "items": [q[0] for q in queue]})

    for name, argv, env_extra, timeout_s, risky, script in queue:
        if chip_parked():
            log("park file present; stopping before next item")
            record({"name": "_parked", "before": name,
                    "ts": time.strftime("%F %T")})
            sys.exit(0)
        status = run_item(name, argv, env_extra, timeout_s, script)
        if status != "ok" and risky:
            log(f"{name} failed and was fault-risky; waiting out a "
                "possible wedge before continuing")
            if not wait_alive():
                log("chip gone; stopping the queue")
                record({"name": "_abort", "after": name})
                sys.exit(1)
    record({"name": "_done", "ts": time.strftime("%F %T")})
    log("queue drained")


if __name__ == "__main__":
    main()
