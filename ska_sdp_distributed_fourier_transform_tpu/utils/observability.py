"""Profiling, memory and communication accounting.

The reference instruments runs with Dask's tooling: a per-run HTML
``performance_report``, a ``MemorySampler`` CSV, and per-worker transfer
byte counters summed into a text file (reference scripts/demo_api.py:125-148,
scripts/utils.py:166-231). The TPU-native equivalents here:

* :func:`performance_report` — context manager writing a jax profiler
  trace (xplane/perfetto, viewable in TensorBoard or ui.perfetto.dev);
* :class:`MemorySampler` — samples per-device HBM stats
  (``device.memory_stats()``) on a background thread, exports CSV;
* :func:`collective_bytes` — static communication accounting from a
  *compiled* program's HLO: bytes moved by all-reduce / all-to-all /
  reduce-scatter / all-gather / collective-permute. The reference can
  only measure transfers after the fact; a compiled XLA program declares
  them exactly;
* :func:`get_and_write_transfer` — sums collective bytes over an
  engine's compiled programs and appends a line to a transfer-info file
  (the reference's ``transfer_info_full_step.txt``).
"""

from __future__ import annotations

import contextlib
import csv
import re
import threading
import time

import numpy as np

__all__ = [
    "performance_report",
    "MemorySampler",
    "collective_bytes",
    "engine_collective_bytes",
    "get_and_write_transfer",
    "human_readable_size",
]


def human_readable_size(size, decimal_places=3):
    """Format a byte count using binary prefixes (reference
    scripts/utils.py:184-197)."""
    for unit in ["B", "KiB", "MiB", "GiB", "TiB"]:
        if size < 1024.0:
            break
        size /= 1024.0
    return f"{size:.{decimal_places}f}{unit}"


@contextlib.contextmanager
def performance_report(log_dir):
    """Write a jax profiler trace for the enclosed block.

    View with TensorBoard's profile plugin or perfetto. The analogue of
    ``distributed.performance_report`` (reference demo_api.py:127-133).
    """
    import jax

    jax.profiler.start_trace(str(log_dir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class MemorySampler:
    """Background sampler of per-device memory statistics.

    The analogue of ``distributed.diagnostics.MemorySampler``
    (reference demo_api.py:125-143): use :meth:`sample` as a context
    manager around a phase, then :meth:`to_csv`.

    Devices without ``memory_stats`` support (e.g. tunnelled attachments)
    yield empty samples rather than failing.
    """

    def __init__(self, interval=0.2):
        self.interval = interval
        self.rows = []  # (label, t, device, bytes_in_use, peak_bytes)

    def _snapshot(self, label, t0):
        import jax

        t = time.time() - t0
        for d in jax.local_devices():
            try:
                stats = d.memory_stats() or {}
            except Exception:
                stats = {}
            self.rows.append(
                (
                    label,
                    t,
                    str(d),
                    stats.get("bytes_in_use", np.nan),
                    stats.get("peak_bytes_in_use", np.nan),
                )
            )

    @contextlib.contextmanager
    def sample(self, label="run"):
        """Sample memory on a background thread while the block runs."""
        stop = threading.Event()
        t0 = time.time()

        def loop():
            while not stop.is_set():
                self._snapshot(label, t0)
                stop.wait(self.interval)

        thread = threading.Thread(target=loop, daemon=True)
        thread.start()
        try:
            yield self
        finally:
            stop.set()
            thread.join(timeout=5)
            self._snapshot(label, t0)

    def to_csv(self, path):
        """Write all samples as CSV (label, time_s, device, bytes_in_use,
        peak_bytes_in_use)."""
        with open(path, "w", newline="") as fh:
            w = csv.writer(fh)
            w.writerow(
                ["label", "time_s", "device", "bytes_in_use",
                 "peak_bytes_in_use"]
            )
            w.writerows(self.rows)

    def peak(self):
        """Highest observed bytes_in_use across devices (nan if no
        device exposes stats)."""
        vals = [r[3] for r in self.rows if r[3] == r[3]]
        return max(vals) if vals else float("nan")


# --------------------------------------------------------- collective bytes

_DTYPE_BYTES = {
    "f64": 8, "f32": 4, "bf16": 2, "f16": 2, "f8": 1,
    "c128": 16, "c64": 8,
    "s64": 8, "u64": 8, "s32": 4, "u32": 4, "s16": 2, "u16": 2,
    "s8": 1, "u8": 1, "pred": 1,
}

_COLLECTIVES = (
    "all-reduce", "all-to-all", "all-gather", "reduce-scatter",
    "collective-permute",
)

_SHAPE_RE = re.compile(r"([a-z0-9]+)\[([0-9,]*)\]")


def _shape_bytes(shape_str):
    total = 0
    for dtype, dims in _SHAPE_RE.findall(shape_str):
        nbytes = _DTYPE_BYTES.get(dtype)
        if nbytes is None:
            continue
        n = 1
        if dims:
            for d in dims.split(","):
                n *= int(d)
        total += n * nbytes
    return total


def collective_bytes(compiled):
    """Bytes moved by collectives in a compiled program, by op kind.

    Parses the optimised HLO of a ``jax.jit(...).lower(...).compile()``
    result (or anything with ``as_text()``): each collective instruction
    contributes its *output* shape's bytes per participating device.

    :return: dict like ``{"all-to-all": 123456, ...,
        "total": ...}`` (bytes per execution, per device)
    """
    if hasattr(compiled, "as_text"):
        hlo = compiled.as_text()
    else:
        hlo = str(compiled)
    out = {}
    for line in hlo.splitlines():
        line = line.strip()
        # e.g.:  %a2a = f32[2,9,64,64] all-to-all(...), dimensions=...
        m = re.match(r"%?[\w.\-]+\s*=\s*(\([^)]*\)|[a-z0-9]+\[[0-9,]*\][^ ]*)\s+([a-z\-]+)", line)
        if not m:
            continue
        op = m.group(2)
        base = op
        for suffix in ("-start", "-done"):
            if base.endswith(suffix):
                base = base[: -len(suffix)]
        if base not in _COLLECTIVES:
            continue
        if op.endswith("-start"):
            # Async pairs: the '-start' op's declared shape is a tuple
            # that also carries operand aliases, so counting it would
            # double-count; the matching '-done' op's shape is exactly
            # the result.
            continue
        out[base] = out.get(base, 0) + _shape_bytes(m.group(1))
    out["total"] = sum(out.values())
    return out


def engine_collective_bytes(engine):
    """Collective-byte accounting for every compiled program of a
    :class:`..parallel.ShardedSwiftly` engine (AOT-lowered, nothing is
    executed).

    :return: ``{program_name: {collective_op: bytes, ..., "total": n}}``
        — bytes per execution, per device
    """
    return {
        name: collective_bytes(compiled)
        for name, compiled in engine.lowered().items()
    }


def get_and_write_transfer(compiled_or_hlo, path, key="run",
                           executions=1):
    """Append a transfer-accounting line for a compiled program.

    The analogue of the reference's per-worker transfer-log scrape
    (scripts/utils.py:200-231), but exact: XLA declares every collective.

    :param compiled_or_hlo: compiled jax program (or HLO text)
    :param path: file to append to
    :param key: run label
    :param executions: multiply per-execution bytes by this count
    :return: the per-execution byte dict
    """
    info = collective_bytes(compiled_or_hlo)
    with open(path, "a") as fh:
        fh.write(
            f"{key}: total {human_readable_size(info['total'] * executions)}"
            f" ({executions} executions; per-execution "
            + ", ".join(
                f"{k}={human_readable_size(v)}"
                for k, v in sorted(info.items())
                if k != "total"
            )
            + ")\n"
        )
    return info
