"""Smoke tests for the CLI drivers (subprocess, tiny config, CPU)."""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_script(name, *args, timeout=420, env=None):
    env = dict(os.environ, **(env or {}))
    env.pop("JAX_PLATFORMS", None)
    return subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", name), *args],
        capture_output=True,
        text=True,
        timeout=timeout,
        cwd=REPO,
        env=env,
    )


@pytest.mark.parametrize("backend", ["jax", "native"])
def test_demo_api_smoke(backend):
    res = run_script(
        "demo_api.py", "--swift_config", "1k[1]-n512-256",
        "--source_number", "2", "--backend", backend, "--platform", "cpu",
    )
    assert res.returncode == 0, res.stderr[-2000:]
    assert "subgrids/s" in res.stderr + res.stdout
    # every facet error line should be tiny
    assert "error facet" in res.stderr + res.stdout


def test_demo_sparse_smoke(tmp_path):
    res = run_script(
        "demo_sparse_facet.py", "--swift_config", "1k[1]-n512-256",
        "--source_number", "2", "--check_subgrid", "--platform", "cpu",
    )
    assert res.returncode == 0, res.stderr[-2000:]
    assert "sparse cover:" in res.stderr + res.stdout


def test_demo_api_rejects_unknown_config():
    res = run_script("demo_api.py", "--swift_config", "not-a-config")
    assert res.returncode != 0
    assert "Unknown configuration" in res.stderr


def test_flag_file_support(tmp_path):
    flagfile = tmp_path / "flags"
    flagfile.write_text(
        "--swift_config\n1k[1]-n512-256\n--source_number\n1\n"
        "--platform\ncpu\n"
    )
    res = run_script("demo_api.py", f"@{flagfile}")
    assert res.returncode == 0, res.stderr[-2000:]


def test_demo_host_tier_smoke():
    res = run_script(
        "demo_api.py", "--swift_config", "1k[1]-n512-256",
        "--source_number", "2", "--host_tier", "--mesh_devices", "4",
        "--platform", "cpu",
    )
    assert res.returncode == 0, res.stderr[-2000:]
    out = res.stderr + res.stdout
    assert "subgrids/s" in out
    assert "error facet" in out


def test_multichip_validate_checkpoint_resume(tmp_path):
    """The checkpointed per-column validation loop resumes mid-stream
    and reproduces the uninterrupted RMSE (the cross-session mechanism
    the 32k validation relies on)."""
    import json as _json

    ckpt = str(tmp_path / "mcv.npz")
    args = (
        "multichip_validate.py", "--swift_config", "1k[1]-n512-256",
        "--devices", "4", "--source_number", "2",
        "--checkpoint", ckpt, "--checkpoint_every", "1",
    )
    # session 1: process 3 of the 7 columns, checkpoint, exit(3)
    res = run_script(*args, "--stop_after_columns", "3", timeout=900)
    assert res.returncode == 3, res.stderr[-2000:]
    assert "stopping after 3 columns" in res.stderr
    assert os.path.exists(ckpt)
    # session 2: resume mid-stream and finish
    res2 = run_script(*args, timeout=900)
    assert res2.returncode == 0, res2.stderr[-2000:]
    assert "resumed from checkpoint at column 3" in res2.stderr
    out = _json.loads(res2.stdout.splitlines()[-1])
    assert out["ok"], out
    # the resumed result matches an uninterrupted single-session run
    res3 = run_script(
        "multichip_validate.py", "--swift_config", "1k[1]-n512-256",
        "--devices", "4", "--source_number", "2", timeout=900,
    )
    assert res3.returncode == 0, res3.stderr[-2000:]
    rmse_solid = _json.loads(res3.stdout.splitlines()[-1])["rmse"]
    assert out["rmse"] == rmse_solid


def test_error_map_script(tmp_path):
    res = run_script(
        "error_map.py", "--swift_config", "1k[1]-n512-256",
        "--source_number", "2", "--platform", "cpu",
        "--out_dir", str(tmp_path / "maps"),
    )
    assert res.returncode == 0, res.stderr[-2000:]
    assert "edge-amplification" in res.stderr + res.stdout
    import numpy
    maps = sorted((tmp_path / "maps").glob("error_map_f*.npy"))
    assert len(maps) == 9
    emap = numpy.load(maps[0])
    assert emap.max() < 1e-7  # scheme error level, not garbage

def test_hosttier_64k_runner_smoke(tmp_path):
    """The bounded host-tier session runner (the 64k artifact producer)
    executes real columns and records measured-vs-modeled memory."""
    out = tmp_path / "hosttier.json"
    res = run_script(
        "hosttier_64k.py", "--swift_config", "1k[1]-n512-256",
        "--columns", "2", "--out", str(out),
    )
    assert res.returncode == 0, res.stderr[-2000:]
    import json as _json

    rec = _json.loads(out.read_text())
    assert rec["columns_executed"] == 2
    assert rec["accum_abs_max"] > 0
    assert rec["measured"]["peak_rss_gib"] > 0


def test_bench_backlog_no_wait_exits_cleanly():
    """With the tunnel down and --no_wait, the measurement queue must
    exit 2 without touching the chip or writing records. The probe is
    pointed at a dead port (SWIFTLY_RELAY_PORT) so this holds even on
    a host whose real tunnel is up — the queue must never run actual
    chip benches from inside a test."""
    res = run_script("bench_backlog.py", "--no_wait", timeout=60,
                     env={"SWIFTLY_RELAY_PORT": "1"})
    assert res.returncode == 2, res.stdout + res.stderr


def test_bench_host_tier_cpu_smoke():
    env = dict(os.environ, SWIFTLY_BENCH_NO_PROBE="1")
    res = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py"),
         "--swift_config", "1k[1]-n512-256", "--host_tier",
         "--skip_baseline", "--source_number", "2", "--platform", "cpu"],
        capture_output=True, text=True, timeout=420, cwd=REPO, env=env,
    )
    assert res.returncode == 0, res.stderr[-2000:]
    import json as _json

    rec = _json.loads(res.stdout.strip().splitlines()[-1])
    assert rec["metric"].startswith("host_roundtrip")
    assert rec["extra"]["columns_s"] > 0
