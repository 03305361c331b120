"""Per-device memory modeling for the sharded streaming engine.

The reference scales by giving every Dask worker a 320-512 GiB host
(reference slurm_scripts/run_distr_single_csd3.slurm: ``--memory-limit
512GiB``) and never models memory explicitly. A TPU chip has ~16 GB of
HBM, so whether a catalogue entry is *runnable* is a static planning
question: this module models the engine's per-device working set for a
given config and mesh size, and — when the facet arrays exceed the mesh's
aggregate HBM — plans the host-streamed tier
(:class:`..parallel.streamed.StreamedSwiftly`), where ``BF_F`` and the
facet accumulator live in host RAM (the reference's own regime) and the
device holds only one column's working set.

All figures are bytes per device, derived from the array shapes the
engine actually allocates (:mod:`..parallel.distributed`); the 16k
single-chip model was validated against the measured footprint in
BENCH_SWEEP.md.
"""

from __future__ import annotations

import dataclasses
import math

import numpy as np

__all__ = ["MemoryPlan", "plan_config", "catalogue_report", "HBM_BYTES"]

#: HBM per TPU v5e chip (the planning target).
HBM_BYTES = 16 * 1024**3

#: Fraction of HBM the plan treats as usable (XLA workspace, fragmentation,
#: compiled-program buffers).
HBM_USABLE = 0.88


def _ceil_to(x: int, m: int) -> int:
    return -(-x // m) * m


@dataclasses.dataclass(frozen=True)
class MemoryPlan:
    """Modeled memory for one config on an ``n_devices`` mesh.

    ``device_resident`` holds the persistent per-device arrays,
    ``device_column`` the transient per-column working set; ``peak`` is
    the modeled per-device high-water mark. When ``fits_device`` is
    False, ``host_*`` describe the host-streamed tier: facet-scale
    arrays in host RAM, only the column working set on device.
    """

    name: str
    n_devices: int
    F: int
    F_pad: int
    n_columns: int
    batch: int
    device_resident: dict
    device_column: dict
    peak: int
    fits_device: bool
    host_bytes: int
    host_peak_device: int
    fits_host_tier: bool
    #: host tier with the column working set sharded over the mesh
    #: (``StreamedSwiftly(mesh=...)``): per-device peak and feasibility
    host_mesh_peak_device: int = 0
    fits_host_mesh: bool = False
    #: host tier in process-local mode (multi-process mesh,
    #: ``StreamedSwiftly(mesh=..., process_local=True)``): host bytes
    #: per process when one process drives each device — each process
    #: stores only its mesh-shard's facets' BF_F + accumulator rows
    #: (with P processes sharing the mesh evenly, multiply by
    #: ``n_devices / P``)
    host_bytes_per_process: int = 0

    @property
    def resident_total(self):
        """Sum of persistent per-device bytes."""
        return sum(self.device_resident.values())

    @property
    def column_total(self):
        """Sum of per-column transient bytes."""
        return sum(self.device_column.values())

    def summary(self):
        """One-line human-readable summary."""
        gib = 1024**3
        tier = (
            "device-resident"
            if self.fits_device
            else ("host-streamed" if self.fits_host_tier else "INFEASIBLE")
        )
        return (
            f"{self.name} x{self.n_devices}dev: peak {self.peak / gib:.2f}"
            f" GiB/dev ({tier}; host {self.host_bytes / gib:.1f} GiB, "
            f"host-tier device peak {self.host_peak_device / gib:.2f} GiB"
            f", host/process {self.host_bytes_per_process / gib:.1f} GiB)"
        )


def plan_config(params, n_devices=1, dtype_bytes=8, name="",
                host_accum_bytes=16):
    """Model the sharded engine's memory for ``params`` on a mesh.

    :param params: SWIFT_CONFIGS-style dict (``N``, ``yB_size``,
        ``yN_size``, ``xA_size``, ``xM_size`` used)
    :param n_devices: 1-D mesh size
    :param dtype_bytes: bytes per complex element (8 = complex64; the
        f32-pair accumulator costs the same 8)
    :param name: label for reports
    :param host_accum_bytes: bytes per element of the host tier's facet
        accumulator — 16 matches ``StreamedSwiftly``'s complex128
        default, 8 its ``accum_dtype=complex64`` option
    :return: :class:`MemoryPlan`
    """
    N = params["N"]
    yB, yN = params["yB_size"], params["yN_size"]
    xA, xM = params["xA_size"], params["xM_size"]
    c = xM * yN // N
    d = dtype_bytes

    side = math.ceil(N / yB)
    F = side * side
    F_pad = _ceil_to(F, n_devices)
    Floc = F_pad // n_devices
    n_cols = math.ceil(N / xA)
    B = _ceil_to(n_cols, n_devices)  # per-column batch (padded)
    Bloc = B // n_devices

    resident = {
        "facets_in": Floc * yB * yB * d,
        "BF_F": Floc * yN * yB * d,
        "accum_pair": Floc * yN * yB * 8,  # f32 (re, im) pair
        "A0+A1 (sharded)": 2 * Floc * xM * c * d,
        "E0+E1 (replicated)": 2 * F_pad * c * xM * d,
        "DFT matrices": 2 * xM * xM * d,
    }
    column = {
        "NMBF_BF": Floc * c * yN * d,
        "NMBF_NMBF": B * Floc * c * c * d,
        "partial[B,xM,xM]": B * xM * xM * d,
        "summed+FS+sg": (2 * Bloc * xM * xM + Bloc * xA * xA) * d,
        "NAF_NAF (pre/post a2a)": 2 * B * Floc * c * c * d,
        "NAF_MNAF": Floc * c * yN * d,
        "NAF_BMNAF": Floc * c * yB * d,
    }
    peak = sum(resident.values()) + sum(column.values())
    fits = peak <= HBM_BYTES * HBM_USABLE

    # Host-streamed tier (single host driving one chip): BF_F + accumulator
    # in host RAM; the device holds one column's working set, with the
    # column's subgrid batch processed in chunks (the facet sum is over
    # facets, so batch chunking is exact).
    # BF_F (core dtype) + accumulator (complex128 by default — the
    # StreamedSwiftly allocation, not an f32 pair)
    host_bytes = F * yN * yB * (d + host_accum_bytes)
    Fh = F  # host tier computes all facets' contributions on the chip

    def host_col(bchunk):
        return {
            "rows_in": Fh * c * yB * d,
            "NMBF_BF": Fh * c * yN * d,
            "NMBF_NMBF": bchunk * Fh * c * c * d,
            "partial[b,xM,xM]": bchunk * xM * xM * d,
            "summed+FS+sg": (2 * bchunk * xM * xM + bchunk * xA * xA) * d,
            "NAF_NAF": bchunk * Fh * c * c * d,
            "NAF_MNAF": Fh * c * yN * d,
            "rows_out": Fh * c * yB * d,
            "prepare/finish chunk": 2 * yN * 2048 * d,
            "operators": 4 * Fh * c * xM * d + 2 * xM * xM * d,
        }

    host_peak_device = None
    for bchunk in [B] + [x for x in (64, 32, 16, 8) if x < B]:
        host_peak_device = sum(host_col(bchunk).values())
        if host_peak_device <= HBM_BYTES * HBM_USABLE:
            break
    fits_host = host_peak_device <= HBM_BYTES * HBM_USABLE

    # Host tier on a mesh (StreamedSwiftly(mesh=...)): the column
    # working set is facet-sharded with the ShardedSwiftly collective
    # pattern, so the per-device footprint divides with the mesh while
    # facet-scale state stays in host RAM.
    host_mesh = {
        "rows_in/out": 2 * Floc * c * yB * d,
        "NMBF_BF": Floc * c * yN * d,
        "NMBF_NMBF": B * Floc * c * c * d,
        "partial[B,xM,xM]": B * xM * xM * d,
        "summed+FS+sg": (2 * Bloc * xM * xM + Bloc * xA * xA) * d,
        "NAF_NAF (pre/post a2a)": 2 * B * Floc * c * c * d,
        "NAF_MNAF": Floc * c * yN * d,
        "operators": (2 * Floc + 2 * F_pad) * c * xM * d
        + 2 * xM * xM * d,
        "prepare/finish chunk": 2 * yN * 2048 * d,
    }
    host_mesh_peak = sum(host_mesh.values())
    fits_host_mesh = host_mesh_peak <= HBM_BYTES * HBM_USABLE

    return MemoryPlan(
        name=name or f"N={N}",
        n_devices=n_devices,
        F=F,
        F_pad=F_pad,
        n_columns=n_cols,
        batch=B,
        device_resident=resident,
        device_column=column,
        peak=peak,
        fits_device=fits,
        host_bytes=host_bytes,
        host_peak_device=host_peak_device,
        fits_host_tier=fits_host,
        host_mesh_peak_device=host_mesh_peak,
        fits_host_mesh=fits_host_mesh,
        host_bytes_per_process=Floc * yN * yB * (d + host_accum_bytes),
    )


def catalogue_report(n_devices_options=(1, 4, 8, 9, 16), dtype_bytes=8):
    """Feasibility report over the full SWIFT_CONFIGS catalogue.

    For each entry: the smallest mesh (from ``n_devices_options``) whose
    modeled per-device peak fits in HBM, else whether the host-streamed
    tier fits. Every catalogue entry must be runnable one way or the
    other.

    :return: dict name -> {"tier": "device"|"host"|"infeasible",
        "n_devices": int or None, "peak_gib": float}
    """
    from ..swift_configs import SWIFT_CONFIGS

    out = {}
    for cfg_name, params in SWIFT_CONFIGS.items():
        chosen = None
        for n in sorted(n_devices_options):
            plan = plan_config(params, n, dtype_bytes, cfg_name)
            if plan.fits_device:
                chosen = ("device", n, plan.peak)
                break
        if chosen is None:
            plan = plan_config(params, 1, dtype_bytes, cfg_name)
            if plan.fits_host_tier:
                chosen = ("host", 1, plan.host_peak_device)
            else:
                chosen = ("infeasible", None, plan.host_peak_device)
        out[cfg_name] = {
            "tier": chosen[0],
            "n_devices": chosen[1],
            "peak_gib": round(chosen[2] / 1024**3, 3),
        }
    return out
