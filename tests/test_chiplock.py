"""Single-chip arbitration (utils/chiplock.py).

The lock is what keeps two chip users from killing each other with
RESOURCE_EXHAUSTED on the tunnelled single-chip attachment (it cost
round 4 its driver bench number), so its semantics get real tests:
mutual exclusion across processes, job-tree reentrancy via the
held-marker env var, kernel release on holder death, and the park
signal.
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture
def lock_env(tmp_path, monkeypatch):
    """Isolated lock/park paths + a clean module state per test."""
    lock = str(tmp_path / "chip.lock")
    park = str(tmp_path / "park")
    monkeypatch.setenv("SWIFTLY_CHIP_LOCK_PATH", lock)
    monkeypatch.setenv("SWIFTLY_CHIP_PARK_PATH", park)
    monkeypatch.delenv("SWIFTLY_CHIP_LOCK_HELD", raising=False)
    monkeypatch.delenv("SWIFTLY_CHIP_LOCK", raising=False)
    # module-level path constants are bound at import; reload under the
    # patched env so each test sees its own lock file
    import importlib

    from ska_sdp_distributed_fourier_transform_tpu.utils import chiplock

    importlib.reload(chiplock)
    yield chiplock, lock, park
    chiplock.release_chip_lock()
    importlib.reload(chiplock)


def _child(code, lock, park, held=None):
    env = {k: v for k, v in os.environ.items()
           if k != "SWIFTLY_CHIP_LOCK_HELD"}
    env["SWIFTLY_CHIP_LOCK_PATH"] = lock
    env["SWIFTLY_CHIP_PARK_PATH"] = park
    if held:
        env["SWIFTLY_CHIP_LOCK_HELD"] = held
    return subprocess.run(
        [sys.executable, "-c", code], env=env, cwd=REPO,
        capture_output=True, text=True, timeout=60,
    )


CHILD_TRY = (
    "from ska_sdp_distributed_fourier_transform_tpu.utils.chiplock "
    "import acquire_chip_lock\n"
    "import sys\n"
    "try:\n"
    "    acquire_chip_lock('child', timeout_s=2, poll_s=0.2)\n"
    "    sys.exit(10)\n"
    "except TimeoutError:\n"
    "    sys.exit(11)\n"
)


def test_mutual_exclusion_and_release(lock_env):
    chiplock, lock, park = lock_env
    h = chiplock.acquire_chip_lock("parent")
    assert h is not None
    # holder info is written for diagnostics
    with open(lock) as f:
        info = json.load(f)
    assert info["tag"] == "parent" and info["pid"] == os.getpid()
    # another process cannot acquire while held
    assert _child(CHILD_TRY, lock, park).returncode == 11
    chiplock.release_chip_lock(h)
    # and acquires immediately after release
    assert _child(CHILD_TRY, lock, park).returncode == 10


def test_job_tree_reentrancy(lock_env):
    chiplock, lock, park = lock_env
    chiplock.acquire_chip_lock("parent")
    # acquiring set the held marker for children of this process
    assert os.environ.get("SWIFTLY_CHIP_LOCK_HELD") == "1"
    # a child carrying the marker skips acquisition (no deadlock)
    r = _child(
        "from ska_sdp_distributed_fourier_transform_tpu.utils.chiplock"
        " import acquire_chip_lock\n"
        "assert acquire_chip_lock('child', timeout_s=2) is None\n",
        lock, park, held="1",
    )
    assert r.returncode == 0, r.stderr
    # re-acquiring in the same process is a no-op returning the handle
    h2 = chiplock.acquire_chip_lock("parent-again")
    assert h2 is not None


def test_release_clears_marker_for_fresh_process_retry(lock_env):
    """bench.py's fresh-process retry path: after release_chip_lock the
    held marker must be gone, or the exec'd retry would skip acquiring
    while holding nothing."""
    chiplock, lock, park = lock_env
    h = chiplock.acquire_chip_lock("parent")
    chiplock.release_chip_lock(h)
    assert "SWIFTLY_CHIP_LOCK_HELD" not in os.environ


def test_lock_dies_with_holder(lock_env):
    chiplock, lock, park = lock_env
    # a child acquires then exits WITHOUT releasing; the kernel frees
    # the flock, so we can acquire immediately afterwards
    r = _child(
        "from ska_sdp_distributed_fourier_transform_tpu.utils.chiplock"
        " import acquire_chip_lock\n"
        "assert acquire_chip_lock('dying-child', timeout_s=2)"
        " is not None\n",
        lock, park,
    )
    assert r.returncode == 0, r.stderr
    assert chiplock.acquire_chip_lock("parent", timeout_s=2) is not None


def test_disable_knob_and_park(lock_env, monkeypatch):
    chiplock, lock, park = lock_env
    monkeypatch.setenv("SWIFTLY_CHIP_LOCK", "0")
    assert chiplock.acquire_chip_lock("nolock") is None
    assert not chiplock.chip_parked()
    with open(park, "w") as f:
        f.write("round ending")
    assert chiplock.chip_parked()
