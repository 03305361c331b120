"""Single-chip arbitration for the tunnelled TPU attachment.

This box has ONE TPU chip behind the axon tunnel, and two processes
touching it concurrently kill each other with RESOURCE_EXHAUSTED (the
round-4 driver bench lost its official number to exactly this, and two
wave-6 queue items died in the same collision). Every chip user —
``bench.py``, ``scripts/bench_backlog.py``, ``scripts/hosttier_64k.py``,
``scripts/multichip_validate.py``, ``scripts/profile_stages.py``,
``scripts/demo_api.py --platform tpu`` — must hold this flock while the
chip is in use.

The reference arbitrates its shared resources the same way at a
different layer (a ``distributed.Lock`` around the shared transfer-info
file, ``scripts/utils.py:177-180``); here the contended resource is the
chip itself.

Design notes:

- ``flock`` on ``/tmp/swiftly_chip.lock`` — kernel-released when the
  holder dies, so a killed bench can never wedge the chip for others.
- Reentrant across ``fork``/``exec`` within one job tree via the
  ``SWIFTLY_CHIP_LOCK_HELD`` env var: a queue runner that holds the
  lock spawns ``bench.py`` children that inherit the env and skip
  acquisition (flock would otherwise deadlock parent against child).
- A park file (``/root/repo/.chip_park``) tells long-running queues to
  stop BEFORE their next item: the driver's end-of-round bench must
  find the chip free, not queued behind a backlog.
"""

from __future__ import annotations

import errno
import fcntl
import json
import os
import time

LOCK_PATH = os.environ.get("SWIFTLY_CHIP_LOCK_PATH", "/tmp/swiftly_chip.lock")
PARK_PATH = os.environ.get(
    "SWIFTLY_CHIP_PARK_PATH", "/root/repo/.chip_park"
)

_held = None  # module-global keeps the fd alive for process lifetime


def chip_parked() -> bool:
    """True when long-running chip queues must stop taking new items."""
    return os.path.exists(PARK_PATH)


def acquire_chip_lock(tag: str, timeout_s: float | None = None,
                      poll_s: float = 5.0):
    """Acquire the single-chip lock; returns an opaque handle (the fd).

    Blocks until acquired; ``timeout_s`` bounds the wait (None = wait
    forever). Raises ``TimeoutError`` on expiry. Reentrant within a job
    tree: if ``SWIFTLY_CHIP_LOCK_HELD`` is set (exported by the first
    acquirer before spawning children) this is a no-op. Set
    ``SWIFTLY_CHIP_LOCK=0`` to disable entirely (CPU-only paths).
    """
    global _held
    if os.environ.get("SWIFTLY_CHIP_LOCK", "1") == "0":
        return None
    if _held is not None:
        # this process already holds it (checked before the held-marker
        # env var, which we set ourselves on acquire)
        return _held
    if os.environ.get("SWIFTLY_CHIP_LOCK_HELD") == "1":
        return None
    fd = os.open(LOCK_PATH, os.O_RDWR | os.O_CREAT, 0o666)
    deadline = None if timeout_s is None else time.monotonic() + timeout_s
    waited = False
    while True:
        try:
            fcntl.flock(fd, fcntl.LOCK_EX | fcntl.LOCK_NB)
            break
        except OSError as e:
            if e.errno not in (errno.EAGAIN, errno.EACCES):
                os.close(fd)
                raise
        if deadline is not None and time.monotonic() >= deadline:
            os.close(fd)
            raise TimeoutError(
                f"chip lock held by another process (see {LOCK_PATH}); "
                f"gave up after {timeout_s}s"
            )
        if not waited:
            try:
                info = os.read(fd, 4096).decode(errors="replace")
            except OSError:
                info = "?"
            print(f"[chiplock] waiting for chip ({tag}); "
                  f"holder: {info.strip() or '?'}", flush=True)
            waited = True
        time.sleep(poll_s)
    os.ftruncate(fd, 0)
    os.lseek(fd, 0, os.SEEK_SET)
    os.write(fd, json.dumps(
        {"pid": os.getpid(), "tag": tag, "since": time.time()}
    ).encode())
    # children of this process skip acquisition (see docstring)
    os.environ["SWIFTLY_CHIP_LOCK_HELD"] = "1"
    _held = fd
    return fd


def release_chip_lock(handle=None) -> None:
    """Release the lock early (process exit also releases it)."""
    global _held
    fd = handle if handle is not None else _held
    if fd is None:
        return
    try:
        os.ftruncate(fd, 0)
        fcntl.flock(fd, fcntl.LOCK_UN)
        os.close(fd)
    except OSError:
        pass
    os.environ.pop("SWIFTLY_CHIP_LOCK_HELD", None)
    _held = None
