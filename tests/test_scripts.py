"""Smoke tests for the CLI drivers (subprocess, tiny config, CPU)."""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_script(name, *args, timeout=420):
    env = dict(os.environ)
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
