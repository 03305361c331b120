"""Sharded, column-streaming SwiFTly engine (the Dask replacement).

The reference distributes work as a dynamic Dask task graph: per-tile tasks,
scheduler-mediated pulls of contribution blocks, an LRU giving column
locality, and a TaskQueue bounding in-flight work (reference api.py). On
TPU the idiomatic equivalent is a **static compiled streaming program**:

* facets live as one dense ``[F, yN, yB]`` array **sharded over the mesh**
  (the reference's per-worker persisted ``BF_F`` buffers);
* subgrids are processed **a column at a time** as dense batches — the
  column-major order *is* the reference's LRU schedule, with the whole
  column batched so the expensive axis-1 re-preparation (``NMBF_BF``) is
  computed exactly once per (facet, column);
* the forward redistribution (reference: nfacet^2 per-subgrid block pulls)
  is one ``psum_scatter`` over the mesh axis: each device sums its local
  facets' contributions to *all* subgrids of the column, and the collective
  simultaneously reduces over facets and scatters over the subgrid batch;
* the backward redistribution (per-facet block pushes) is one
  ``all_to_all`` from subgrid-sharded to facet-sharded layout, followed by
  a fused scatter-add into the per-column accumulator (the reference's
  in-place ``accumulate_column``);
* offsets are traced scalars/vectors — a single compiled program serves
  every column; masks make sparse covers a special case of dense ones.

Capacity note: facet count is padded to a multiple of the mesh size with
zero-data dummy tiles, the column batch likewise with ``valid=0`` entries;
both contribute exact zeros.
"""

from __future__ import annotations

import dataclasses
import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from ..ops import operators as linop
from ..ops.core import (
    SwiftlyCore,
    _scale_off,
    _wrap_take_slices,
    add_to_facet_fn,
    add_to_subgrid_fn,
    extract_from_facet_fn,
    extract_from_subgrid_fn,
    finish_facet_fn,
    finish_facet_mxu,
    finish_subgrid_fn,
    prepare_facet_mxu,
    prepare_facet_op,
    prepare_subgrid_fn,
)
from .mesh import TILE_AXIS, make_tile_mesh, replicated_sharding, \
    tile_sharding

__all__ = ["ColumnPlan", "ShardedSwiftly"]


def _ceil_to(x: int, m: int) -> int:
    return -(-x // m) * m


def _psum_scatter_c(x, axis_name, scatter_dimension, n=None):
    """psum_scatter for complex arrays via a stacked float pair.

    TPU lowering lacks complex reduce-scatter (the 64-bit-type rewriter
    bails on c64 collectives); float collectives are the native path.
    ``n`` is the axis size when known at trace time: a 1-device axis
    makes the collective an identity, and skipping it saves the two
    full float-pair conversion passes per call."""
    if n == 1:
        return x
    f = jnp.stack([jnp.real(x), jnp.imag(x)])
    f = jax.lax.psum_scatter(
        f, axis_name, scatter_dimension=scatter_dimension + 1, tiled=True
    )
    return jax.lax.complex(f[0], f[1]).astype(x.dtype)


def _all_to_all_c(x, axis_name, split_axis, concat_axis, n=None):
    """all_to_all for complex arrays via a stacked float pair (identity
    when the axis is known 1-device at trace time, see
    :func:`_psum_scatter_c`)."""
    if n == 1:
        return x
    f = jnp.stack([jnp.real(x), jnp.imag(x)])
    f = jax.lax.all_to_all(
        f, axis_name, split_axis + 1, concat_axis + 1, tiled=True
    )
    return jax.lax.complex(f[0], f[1]).astype(x.dtype)


def _varying_zeros(shape, dtype):
    """Zeros typed as varying over the tile axis (scan carries inside
    shard_map must match the body output's varying-axis type)."""
    z = jnp.zeros(shape, dtype=dtype)
    try:
        return jax.lax.pcast(z, (TILE_AXIS,), to="varying")
    except (AttributeError, TypeError):
        return z


@dataclasses.dataclass(frozen=True)
class ColumnPlan:
    """Static column-major schedule derived from a subgrid cover.

    Subgrid configs are grouped by ``off0`` (column) and padded to a
    rectangular ``[n_columns, batch]`` schedule. ``valid`` masks padding.
    """

    off0: np.ndarray  # [C] int32 — column offsets
    sg_off1: np.ndarray  # [C, B] int32
    valid: np.ndarray  # [C, B] float — 1 for real subgrids
    mask0: np.ndarray  # [C, xA] — column boundary mask (axis 0)
    mask1: np.ndarray  # [C, B, xA] — per-subgrid boundary mask (axis 1)
    configs: list  # [C][B-or-fewer] original SubgridConfig objects

    @property
    def n_columns(self):
        """Number of subgrid columns."""
        return len(self.off0)

    @property
    def batch(self):
        """Padded per-column subgrid batch size."""
        return self.sg_off1.shape[1]

    @classmethod
    def from_configs(cls, subgrid_configs, xA_size, n_devices):
        """Group subgrid configs into a padded column schedule."""
        columns = {}
        for cfg in subgrid_configs:
            columns.setdefault(cfg.off0, []).append(cfg)
        col_off0 = sorted(columns)
        n_batch = _ceil_to(max(len(v) for v in columns.values()), n_devices)

        C = len(col_off0)
        off0 = np.zeros(C, dtype=np.int32)
        sg_off1 = np.zeros((C, n_batch), dtype=np.int32)
        valid = np.zeros((C, n_batch), dtype=np.float64)
        mask0 = np.zeros((C, xA_size), dtype=np.float64)
        mask1 = np.zeros((C, n_batch, xA_size), dtype=np.float64)
        cfg_lists = []
        for ci, o0 in enumerate(col_off0):
            cfgs = sorted(columns[o0], key=lambda cfg: cfg.off1)
            off0[ci] = o0
            m0 = cfgs[0].mask0
            mask0[ci] = 1.0 if m0 is None else np.asarray(m0)
            # The plan stores one axis-0 mask per column; silently
            # applying cfgs[0]'s to the rest would corrupt custom covers
            # where subgrids of one column carry different mask0.
            for other in cfgs[1:]:
                mo = other.mask0
                same = (m0 is None and mo is None) or (
                    m0 is not None and mo is not None
                    and np.array_equal(np.asarray(m0), np.asarray(mo))
                )
                if not same:
                    raise ValueError(
                        f"subgrids of column off0={o0} carry different "
                        "axis-0 masks; the sharded engine requires a "
                        "uniform mask0 per column"
                    )
            for bi, cfg in enumerate(cfgs):
                sg_off1[ci, bi] = cfg.off1
                valid[ci, bi] = 1.0
                m1 = cfg.mask1
                mask1[ci, bi] = 1.0 if m1 is None else np.asarray(m1)
            cfg_lists.append(cfgs)
        return cls(off0, sg_off1, valid, mask0, mask1, cfg_lists)


class ShardedSwiftly:
    """Dense sharded forward/backward engine over a 1-D device mesh.

    :param core: :class:`SwiftlyCore` providing parameters + constants
    :param facet_configs: list of FacetConfig (uniform ``size``)
    :param subgrid_configs: list of SubgridConfig (uniform ``size``)
    :param mesh: 1-D `jax.sharding.Mesh`; default: all local devices
    :param engine_mode: ``"matmul"`` (default) applies the
        contribution-rate ops as precomputed dense operators — batched
        complex matmuls on the MXU, with window/pad/roll/FFT folded into
        the operator (see :mod:`..ops.operators`); ``"pallas"`` is the
        operator engine with both hot contractions in fused Pallas
        kernels (:mod:`..ops.pallas_kernels`) — the fastest mode on
        real TPU hardware for production sizes; ``"fft"`` uses the
        gather+FFT formulation (:mod:`..ops.core`). Identical math —
        ``"fft"`` is the accuracy reference.
    :param precision: MXU precision for the operator contractions —
        ``"high"`` (default; 3-pass bf16 ~ f32, round-trip RMSE
        ~3.3e-7 c64), ``"highest"`` (6-pass, no RMSE gain measured,
        ~12% slower), ``"default"`` (1-pass bf16, ~10% faster,
        RMSE ~1.4e-5).
    :param process_subgrid: optional jax-traceable hook
        ``fn(sg[Bloc, xA, xA], off0, off1[Bloc]) -> [Bloc, xA, xA]``
        applied to every produced subgrid batch (the gridding/
        degridding plug-in point).
    :param columns_per_step: columns per fused-stream scan step
        (operator modes); >1 vmaps the forward passes — measured
        neutral-to-slower on v5e, kept as a tuning knob for other
        hardware. ``None`` defers to ``SWIFTLY_COLUMNS_PER_STEP``.
    :param acc_mode: backward-accumulator strategy for the fused
        stream: ``"carry"`` (pair accumulator as the scan carry,
        per-column DUS fold) or ``"ys"`` (columns' finished rows as
        stacked scan outputs, one post-scan static scatter-add; drops
        the multi-GB carry from the scan). ``None`` defers to
        ``SWIFTLY_ACC``.
    """

    def __init__(self, core: SwiftlyCore, facet_configs, subgrid_configs,
                 mesh=None, engine_mode="matmul", precision="high",
                 process_subgrid=None, columns_per_step=None,
                 fft_impl="mxu", fused_fft=None, scan_unroll=None,
                 gather_fused=None, acc_mode=None, fold_mode=None,
                 prep_mode=None, finish_mode=None, extract0=None,
                 phase_fused=None, fft_form=None):
        if engine_mode not in ("matmul", "pallas", "fft"):
            raise ValueError(f"Unknown engine_mode: {engine_mode}")
        self.engine_mode = engine_mode
        # "pallas" is the operator engine with the forward contraction
        # done by the fused Pallas kernel instead of an XLA einsum
        self._operator_mode = engine_mode in ("matmul", "pallas")
        self.precision = jax.lax.Precision(precision)
        # Optional jax-traceable hook applied to every produced subgrid
        # batch before it is consumed — the spot where gridding/
        # degridding plugs in (the reference's pass-through
        # `process_subgrid`, demo_api.py:40-42). Signature:
        # fn(sg[Bloc, xA, xA], off0, off1[Bloc]) -> [Bloc, xA, xA].
        # Traced into the compiled stream, so it must be functional.
        self.process_subgrid = process_subgrid
        # Fused-stream scan granularity: >1 lets XLA interleave one
        # column's FFT chain (VPU) with another's contractions (MXU)
        # within a scan step (operator engine modes only). None defers
        # to the SWIFTLY_COLUMNS_PER_STEP env knob (default 1).
        if columns_per_step is None:
            columns_per_step = int(
                os.environ.get("SWIFTLY_COLUMNS_PER_STEP", "1")
            )
        self.columns_per_step = int(columns_per_step)
        # Backward-accumulator strategy for the fused whole-stream
        # program (operator modes, columns_per_step == 1):
        #   "carry" (default): the padded f32-pair accumulator is the
        #     scan carry, folded per column by dynamic_update_slice.
        #   "ys": the scan emits each column's finished rows as stacked
        #     outputs and ONE static-index scatter-add after the scan
        #     builds the accumulator — the multi-GB carry leaves the
        #     scan entirely (trades per-column DUS traffic for one
        #     [C, 2, Floc, c, yB] buffer + one post-pass; candidate for
        #     the S8 fold + scan-plumbing time in the round-2 stage
        #     bisection, BENCH_SWEEP.md).
        # None defers to the SWIFTLY_ACC env knob.
        if acc_mode is None:
            acc_mode = os.environ.get("SWIFTLY_ACC", "carry")
        if acc_mode not in ("carry", "ys"):
            raise ValueError(f"Unknown acc_mode: {acc_mode}")
        self.acc_mode = acc_mode
        # Column-fold formulation (operator modes): how each column's
        # [B, Floc, c, c] contributions become the [Floc, c, yN] column
        # accumulator.
        #   "scatter" (default): one scatter-add at the wrap-window
        #     indices — duplicate indices (adjacent windows overlap),
        #     which TPU lowers to a serialised scatter.
        #   "gather": the inverse map is precomputed on the host (every
        #     output row has <= K source windows, K = max coverage — 2
        #     for all catalogue covers) and the fold becomes K
        #     duplicate-free gathers + adds along the minor axis.
        #   "gatherm": same, gathering whole [Floc, c] rows along the
        #     major axis then transposing.
        # None defers to the SWIFTLY_FOLD env knob.
        if fold_mode is None:
            fold_mode = os.environ.get("SWIFTLY_FOLD", "scatter")
        if fold_mode not in ("scatter", "gather", "gatherm"):
            raise ValueError(f"Unknown fold_mode: {fold_mode}")
        self.fold_mode = fold_mode
        # Forward axis-0 contribution extraction (operator modes):
        #   "roll" (default): the gather-based roll/extract/roll
        #     (ops/core.py extract_from_facet_fn) — a general row
        #     gather over [Floc, yN, yB].
        #   "slices": the in-window roll is absorbed into A0's columns
        #     (a per-column roll of the ~10 MB operator instead of a
        #     permuted gather of the ~300 MB stream) and the remaining
        #     contiguous wrap window is read as static-size dynamic
        #     slices (_wrap_take_slices) — pure DMA.
        # Mathematically identical (A0 @ roll(X) == roll(A0) @ X);
        # None defers to the SWIFTLY_EXTRACT0 env knob.
        # Four-step tile formulation for the fused transform kernels
        # ("tt"/"ls"/"bd", ops/pallas_fft.py). Resolved ONCE here and
        # threaded explicitly (no trace-time env reads). Measured on
        # v5e 16k[1]-n8k-512 (BENCH_SWEEP_r04.jsonl): bd+slices
        # 1412.1 sg/s @ RMSE 5.88e-8 vs tt+roll 1199.3 @ 1.10e-7 —
        # but bd WITHOUT slices regressed (1060.7), so the pair is
        # gated together: bd+slices at yN >= 8192 in pallas mode,
        # tt+roll otherwise (8k/4k pending measurement).
        if fft_form is None:
            fft_form = os.environ.get("SWIFTLY_FFT_FORM")
        if fft_form is None:
            fft_form = (
                "bd"
                if engine_mode == "pallas" and core.yN_size >= 8192
                else "tt"
            )
        if fft_form not in ("tt", "ls", "bd"):
            raise ValueError(f"Unknown fft_form: {fft_form}")
        self.fft_form = fft_form
        if extract0 is None:
            extract0 = os.environ.get("SWIFTLY_EXTRACT0")
        if extract0 is None:
            extract0 = "slices" if self.fft_form == "bd" else "roll"
        if extract0 not in ("roll", "slices"):
            raise ValueError(f"Unknown extract0: {extract0}")
        self.extract0 = extract0
        # Route the fused stream's prepare/finish PHASES through the
        # fused Pallas row-transform kernel. Resolved ONCE here (not at
        # trace time inside the jitted bodies — flipping the env var
        # after the first program build must not silently do nothing).
        # Default OFF: the phase-fused 16k run RESOURCE_EXHAUSTED on
        # v5e twice in fresh processes (BENCH_SWEEP_r04.jsonl
        # phasefused_16k) — only a measured green run flips this.
        if phase_fused is None:
            phase_fused = (
                os.environ.get("SWIFTLY_PHASE_FUSED", "0") == "1"
            )
        self.phase_fused = bool(phase_fused)
        # Forward column-prepare strategy for the fused stream:
        #   "col" (default): each column extracts its c wrap-window rows
        #     from BF_F and transforms them (extract + axis-1 prepare
        #     inside the scan — the reference's extract_column,
        #     api_helper.py:200-210).
        #   "full": transform ALL yN rows once before the scan
        #     ([Floc, yN, yN], e.g. 4.8 GiB at 16k — device-resident
        #     configs only) so the per-column step is a pure row gather.
        #     The axis-0 extraction and axis-1 transform commute exactly;
        #     XLA compiles the one-shot batched transform differently
        #     from the in-scan one, so results match at c64 rounding
        #     (same oracle RMSE), not bitwise. ~14% fewer row transforms
        #     total (columns re-transform overlapping windows) and the
        #     transform leaves the scan's serial chain. Fused-stream
        #     only; the per-column programs and checkpoint segments
        #     keep "col".
        # None defers to the SWIFTLY_PREP env knob.
        if prep_mode is None:
            prep_mode = os.environ.get("SWIFTLY_PREP", "col")
        if prep_mode not in ("col", "full"):
            raise ValueError(f"Unknown prep_mode: {prep_mode}")
        self.prep_mode = prep_mode
        # Backward finish strategy for the fused stream (the dual of
        # prep_mode):
        #   "col" (default): each column's [Floc, c, yN] block is
        #     finished along axis 1 (yN-scale transform + Fb + mask1)
        #     inside the scan, and the finished [Floc, c, yB] rows fold
        #     into the carry (the reference's accumulate_facet,
        #     api_helper.py:155-179).
        #   "post": the UNFINISHED blocks fold into a wider
        #     [2, Floc, yN + c, yN] carry and the axis-1 finish runs
        #     ONCE after the scan — finish is linear, so it commutes
        #     with the column sum; results match at c64 rounding. The
        #     per-column yN-scale transform leaves the scan's serial
        #     chain (~14% fewer row transforms at 16k), at the cost of
        #     a yN/yB-wider carry. Requires acc_mode="carry".
        # None defers to the SWIFTLY_FINISH env knob.
        if finish_mode is None:
            finish_mode = os.environ.get("SWIFTLY_FINISH", "col")
        if finish_mode not in ("col", "post"):
            raise ValueError(f"Unknown finish_mode: {finish_mode}")
        if finish_mode == "post" and acc_mode == "ys":
            raise ValueError("finish_mode='post' requires acc_mode="
                             "'carry'")
        self.finish_mode = finish_mode
        # yN-scale facet transforms: "mxu" (default) uses the four-step
        # factor-matmul FFT (ops.fft_mxu) — +23% end-to-end on v5e by
        # sidestepping the layout copies XLA inserts around FFTs;
        # "xla" uses the XLA FFT (identical math).
        if fft_impl not in ("xla", "mxu"):
            raise ValueError(f"Unknown fft_impl: {fft_impl}")
        self.fft_impl = fft_impl
        # Stream the per-subgrid window extraction through the fused
        # contribution kernel instead of materialising the
        # [B, F, c, c] window array in HBM (pallas engine mode only;
        # bitwise-equal output to the materialised path). Measured on
        # v5e (BENCH_SWEEP_r03.jsonl, 2026-08-18): +8.9% at 16k,
        # +5% at 8k, +7% at 4k — default ON at yN >= 2048; at the toy
        # 2k size (yN=1024) the combined gather_fused+fused_fft=both
        # stream measured slower (439 vs 540 sg/s), so small configs
        # keep the materialised path. None defers to
        # SWIFTLY_GATHER_FUSED, then the size gate.
        if gather_fused is None:
            env_gf = os.environ.get("SWIFTLY_GATHER_FUSED")
            if env_gf is not None:
                gather_fused = env_gf == "1"
            else:
                gather_fused = (
                    engine_mode == "pallas" and core.yN_size >= 2048
                )
        self.gather_fused = bool(gather_fused)
        # Which side(s) of the stream use the fused four-step transform
        # kernel (ops/pallas_fft.py): "fwd", "bwd", "both", or "off".
        # Measured at 16k on v5e: with the gather-fused contraction,
        # "both" is the best mode (1234.9 sg/s @ RMSE 1.10e-7 vs
        # "fwd" 1194.8 @ 1.40e-7 — the round-2 both-sides regression to
        # 806 was VMEM pressure from the materialised window array,
        # which gather_fused removes); without it, "fwd" stays best.
        # Default gated accordingly. None defers to SWIFTLY_FUSED_FFT.
        if fused_fft is None:
            fused_fft = os.environ.get("SWIFTLY_FUSED_FFT")
        if fused_fft is None:
            fused_fft = (
                "both"
                if self.gather_fused and core.yN_size >= 4096
                else "fwd"
            )
        if fused_fft not in ("off", "fwd", "bwd", "both"):
            raise ValueError(f"Unknown fused_fft: {fused_fft}")
        self.fused_fft = fused_fft
        # Unroll factor for the fused whole-stream column scan; None
        # defers to the SWIFTLY_SCAN_UNROLL env knob (default 1 —
        # unrolling measured neutral-to-negative at 16k on v5e).
        if scan_unroll is None:
            scan_unroll = int(os.environ.get("SWIFTLY_SCAN_UNROLL", "1"))
        self.scan_unroll = int(scan_unroll)
        self.core = core
        self.mesh = mesh if mesh is not None else make_tile_mesh()
        self.n_devices = self.mesh.devices.size

        sizes = {cfg.size for cfg in facet_configs}
        if len(sizes) != 1:
            raise ValueError("Engine requires a uniform facet size")
        self.yB_size = sizes.pop()
        sizes = {cfg.size for cfg in subgrid_configs}
        if len(sizes) != 1:
            raise ValueError("Engine requires a uniform subgrid size")
        self.xA_size = sizes.pop()

        self.facet_configs = list(facet_configs)
        self.plan = ColumnPlan.from_configs(
            subgrid_configs, self.xA_size, self.n_devices
        )

        # --- static facet metadata, padded to a mesh multiple ------------
        F = len(self.facet_configs)
        self.F_pad = _ceil_to(F, self.n_devices)
        rd = core.real_dtype
        self._foff0 = np.zeros(self.F_pad, dtype=np.int32)
        self._foff1 = np.zeros(self.F_pad, dtype=np.int32)
        self._fmask0 = np.zeros((self.F_pad, self.yB_size), dtype=rd)
        self._fmask1 = np.zeros((self.F_pad, self.yB_size), dtype=rd)
        for i, cfg in enumerate(self.facet_configs):
            self._foff0[i] = cfg.off0
            self._foff1[i] = cfg.off1
            m0, m1 = cfg.mask0, cfg.mask1
            self._fmask0[i] = 1.0 if m0 is None else np.asarray(m0)
            self._fmask1[i] = 1.0 if m1 is None else np.asarray(m1)

        self._shard = tile_sharding(self.mesh)
        self._repl = replicated_sharding(self.mesh)
        # Per-facet image-space phase vectors (host f64 — exact roots
        # of unity). Needed by every engine mode (the phase-fused
        # prepare/finish reads _ph0 at program-build time), so built
        # unconditionally — NOT inside _build_operators, which fft mode
        # never runs (the round-4 _ph0 AttributeError regression).
        yN_ = core.yN_size
        j_ = np.arange(yN_) - yN_ // 2
        self._ph1 = np.exp(
            2j * np.pi / yN_ * np.outer(self._foff1.astype(np.int64), j_)
        )
        self._ph0 = np.exp(
            2j * np.pi / yN_ * np.outer(self._foff0.astype(np.int64), j_)
        )
        if self._operator_mode:
            self._build_operators()
        self._build_programs()

    def _build_operators(self):
        """Precompute the per-facet dense operators (host-side, float64)
        that replace the contribution-rate FFT chains with MXU matmuls.

        Facet offsets are static metadata, so the facet-side operators are
        engine constants; the subgrid-side operators (finish/prepare)
        depend on traced offsets and are realised inside the compiled
        program as row/column gathers of the DFT matrices.
        """
        core = self.core
        N, xM, c = core.N, core.xM_size, core.xM_yN_size
        Fn = np.asarray(core._Fn, dtype=np.float64)
        cd = core.dtype

        del cd
        # Host-side complex128; moved to device lazily through the
        # float-pair transfer path (complex host->device transfers are
        # unimplemented on some TPU attachments).
        self._A0 = np.stack([  # [F_pad, xM, c]
            linop.add_to_subgrid_operator(N, xM, c, Fn, int(o))
            for o in self._foff0
        ])
        self._A1 = np.stack([
            linop.add_to_subgrid_operator(N, xM, c, Fn, int(o))
            for o in self._foff1
        ])
        self._E0 = np.stack([  # [F_pad, c, xM]
            linop.extract_from_subgrid_operator(N, xM, c, Fn, int(o))
            for o in self._foff0
        ])
        self._E1 = np.stack([
            linop.extract_from_subgrid_operator(N, xM, c, Fn, int(o))
            for o in self._foff1
        ])
        self._Fi_xM = linop.shifted_idft_matrix(xM)
        self._F_xM = linop.shifted_dft_matrix(xM)
        # (_ph0/_ph1 phase vectors are built unconditionally in
        # __init__ — every engine mode needs them)

    # ------------------------------------------------------------- packing

    def pack_facets(self, facet_arrays):
        """Stack per-facet arrays into the padded, sharded dense layout.

        Uses float-pair transfers so it works on TPU attachments without
        complex-transfer support."""
        from ..utils.transfer import put_complex

        data = np.zeros(
            (self.F_pad, self.yB_size, self.yB_size), dtype=complex
        )
        for i, arr in enumerate(facet_arrays):
            data[i] = np.asarray(arr)
        return put_complex(data, self._shard, dtype=self.core.dtype)

    def unpack_facets(self, packed):
        """Split the dense facet array back into per-facet arrays."""
        return [packed[i] for i in range(len(self.facet_configs))]

    def column_subgrids(self, col_index, sg_batch):
        """Split a column's dense subgrid batch into (config, array) pairs."""
        cfgs = self.plan.configs[col_index]
        return list(zip(cfgs, [sg_batch[i] for i in range(len(cfgs))]))

    def _col_args(self, ci):
        plan = self.plan
        rd = self.core.real_dtype
        return (
            jnp.asarray(plan.off0[ci], jnp.int32),
            jnp.asarray(plan.sg_off1[ci], jnp.int32),
            jnp.asarray(plan.valid[ci], rd),
            jnp.asarray(plan.mask0[ci], rd),
            jnp.asarray(plan.mask1[ci], rd),
            jnp.asarray(self._fold_sources()[ci], jnp.int32),
        )

    def _fold_sources(self):
        """Host-precomputed inverse of the column-fold scatter.

        For each column: ``[K, yN]`` int32 — the flat ``b * c + j``
        source element feeding output row ``y`` per coverage slot
        (K = max rows covering any output; 2 for every catalogue
        cover). Rows with fewer sources point at the trash index
        ``B * c`` (an appended zero), and invalid (padding) windows are
        excluded outright — their values are exact zeros anyway. Lets
        the fold run as K duplicate-free gathers instead of a
        duplicate-index scatter-add (the reference's accumulate_column
        semantics, api_helper.py:142-152, unchanged).
        """
        if getattr(self, "_fold_sources_cache", None) is not None:
            return self._fold_sources_cache
        plan, core = self.plan, self.core
        yN, c, N = core.yN_size, core.xM_yN_size, core.N
        C, B = plan.sg_off1.shape
        trash = B * c
        k = np.arange(c)
        # pass 1: max coverage over all columns
        K = 1
        counts = []
        idxs = []
        for ci in range(C):
            cnt = np.zeros(yN, dtype=np.int32)
            rows = {}
            for b in range(B):
                if plan.valid[ci, b] == 0:
                    continue
                s1 = int(plan.sg_off1[ci, b]) // (N // yN)
                idx = (yN // 2 - c // 2 + (k - s1) % c + s1) % yN
                rows[b] = idx
                cnt[idx] += 1
            counts.append(cnt)
            idxs.append(rows)
            K = max(K, int(cnt.max(initial=1)))
        out = np.full((C, K, yN), trash, dtype=np.int32)
        for ci in range(C):
            cnt = np.zeros(yN, dtype=np.int32)
            for b, idx in idxs[ci].items():
                slot = cnt[idx]
                out[ci, slot, idx] = b * c + k
                cnt[idx] += 1
        self._fold_sources_cache = out
        return out

    # -------------------------------------------------------- the programs

    def _build_programs(self):
        core = self.core
        N, yN, xM = core.N, core.yN_size, core.xM_size
        c = core.xM_yN_size
        yB, xA = self.yB_size, self.xA_size
        Fb, Fn = core._Fb, core._Fn
        mesh = self.mesh
        cdtype = core.dtype
        rdtype = core.real_dtype

        phase_fused = self.phase_fused
        fform = self.fft_form

        def prepare_local(facets, foff0):
            # facets [Floc, yB, yB] -> BF_F [Floc, yN, yB]
            if use_pallas_fft and phase_fused:
                # Route the stream's prepare PHASE through the fused
                # row-transform kernel (axis moved last at XLA level):
                # the XLA-level four-step materialises every stage in
                # HBM and needs a separate window+pad pass; the kernel
                # does one read + one write (and with form=bd skips the
                # pad entirely). Host-f64 phases, as in the column path.
                from ..ops.pallas_fft import fused_prepare_rows

                d = jax.lax.axis_index(TILE_AXIS)
                Floc = facets.shape[0]
                ph0 = jax.lax.complex(
                    _my(jnp.asarray(ph0_pair[0]), d, Floc),
                    _my(jnp.asarray(ph0_pair[1]), d, Floc),
                )
                ft = jnp.swapaxes(facets, 1, 2)  # [Floc, yB(cols), yB]
                out = fused_prepare_rows(ft, fb_yB, ph0, yN,
                                         form=fform).astype(cdtype)
                return jnp.swapaxes(out, 1, 2)  # [Floc, yN, yB]
            return jax.vmap(
                lambda f, o0: prep_facet(f, o0, 0, Fb, yN)
            )(facets, foff0)

        prec = self.precision
        use_pallas_fwd = self.engine_mode == "pallas"
        fft_impl = self.fft_impl
        # TPU kernel fault at yN=2048 — bisected on hardware
        # (2026-08-19, BENCH_SWEEP_r03.jsonl yn2048_* ladder): the
        # fused column scan + the factor-matmul (mxu) facet transforms
        # in ONE compiled module fault (UNAVAILABLE device error)
        # regardless of engine_mode (pallas AND pure-XLA matmul),
        # fused_fft, or accumulator mode, while per-column driving of
        # the SAME column programs is clean, and the scan with the XLA
        # FFT is clean. The faulting program contains no Pallas in the
        # matmul rung — an XLA bug, reproducible in-tree with
        # `scripts/mosaic_yn2048_repro.py --engine --engine_mode
        # matmul --fused_fft off` (vs `--columns 2` clean). Demote the
        # engine to the XLA FFT at this size (~5% on 4k configs);
        # yN=8192 is validated good with mxu (~23% faster end-to-end).
        # SWIFTLY_FORCE_MXU_YN2048=1 bypasses the demotion (the repro
        # script uses it).
        if (fft_impl == "mxu" and yN == 2048
                and os.environ.get("SWIFTLY_FORCE_MXU_YN2048") != "1"):
            fft_impl = "xla"
        if fft_impl == "mxu":
            prep_facet = prepare_facet_mxu
            fin_facet = finish_facet_mxu
        else:
            prep_facet = prepare_facet_op
            fin_facet = finish_facet_fn
        prep_facet_scan = prep_facet
        fin_facet_scan = fin_facet

        # yB-window of the grid-correction vector + per-facet phase
        # vectors (host f64 — more accurate than the f32 cos/sin the
        # traced _phase computes) for the fused transform kernels.
        fb_yB = np.asarray(core._Fb, dtype=np.float64)[
            (yN - 1) // 2 - self.yB_size // 2 :
        ][: self.yB_size].astype(np.float32)
        # axis-0 phase constants for the fused prepare phase (small:
        # [F_pad, yN] f32 pair, embedded replicated and sliced per
        # shard inside shard_map)
        ph0_pair = (self._ph0.real.astype(np.float32),
                    self._ph0.imag.astype(np.float32))

        # Fused four-step transform kernel (ops/pallas_fft.py).
        # fused_fft=fwd|bwd|both|off. Measured at 16k on v5e
        # (BENCH_SWEEP_r03.jsonl): with the gather-fused contraction,
        # "both" 1234.9 sg/s @ RMSE 1.10e-7 (the default at
        # yN >= 4096); without it "fwd" 1101 @ 1.40e-7 beats "both"
        # 806 (VMEM pressure from the materialised window array).
        # Host-f64 phases are the accuracy win.
        _fmode = self.fused_fft
        use_pallas_fft = (use_pallas_fwd and fft_impl == "mxu"
                          and _fmode in ("both", "fwd"))
        use_pallas_fft_bwd = (use_pallas_fwd and fft_impl == "mxu"
                              and _fmode in ("both", "bwd"))
        use_slices0 = self.extract0 == "slices"

        def fwd_column_local_mm(BF_F, A0, A1, Fi_xM, foff1, ph1, off0,
                                sg_off1, valid, mask0, mask1,
                                prepped=False):
            # Matmul formulation: the whole add_to_subgrid_2d + facet-sum
            # is one MXU einsum against precomputed per-facet operators;
            # finish_subgrid is a sandwich against offset-gathered rows of
            # the inverse-DFT matrix.
            if use_slices0 and not prepped:
                # extract0="slices": contiguous wrap window as pure DMA;
                # the in-window roll moves into A0's columns
                # (A0 @ roll(X, s0) == roll(A0, -s0, axis=-1) @ X)
                s0 = _scale_off(off0, N // yN)
                _win_start = yN // 2 - c // 2 + s0

                def _extract0(bf):
                    return _wrap_take_slices(bf, _win_start, c, 0)

                A0 = jnp.roll(A0, -s0, axis=-1)
            else:
                def _extract0(bf):
                    return extract_from_facet_fn(bf, off0, 0, N, yN, c)

            if prepped:
                # prep_mode="full": BF_F is already the fully prepared
                # [Floc, yN, yN] — the column step is a pure row gather
                NMBF_BF = jax.vmap(
                    lambda bb: extract_from_facet_fn(bb, off0, 0, N, yN,
                                                     c)
                )(BF_F)  # [Floc, c, yN]
            elif use_pallas_fft:
                from ..ops.pallas_fft import fused_prepare_rows

                rows = jax.vmap(_extract0)(BF_F)  # [Floc, c, yB]
                # complex output: pair-threading to the sandwich was
                # measured SLOWER (1046 vs 1101 sg/s at 16k) — XLA
                # already fuses the complex<->pair conversions into the
                # window gathers, and per-plane gathers double the
                # gather count
                NMBF_BF = fused_prepare_rows(
                    rows, fb_yB, ph1, yN, form=fform
                ).astype(cdtype)
            else:
                def col_one(bf, o1):
                    return prep_facet_scan(_extract0(bf), o1, 1, Fb, yN)

                NMBF_BF = jax.vmap(col_one)(BF_F, foff1)  # [Floc, c, yN]

            if use_pallas_fwd and self.gather_fused:
                from ..ops.pallas_kernels import fused_gather_sandwich

                partial = fused_gather_sandwich(
                    A0, NMBF_BF, _scale_off(sg_off1, N // yN), A1
                ).astype(cdtype)  # [B, xM, xM]
            else:
                def per_sg(o1b):
                    return jax.vmap(
                        lambda nb: extract_from_facet_fn(
                            nb, o1b, 1, N, yN, c)
                    )(NMBF_BF)

                NMBF_NMBF = jax.vmap(per_sg)(sg_off1)  # [B, Floc, c, c]

                if use_pallas_fwd:
                    from ..ops.pallas_kernels import fused_sandwich

                    partial = fused_sandwich(A0, NMBF_NMBF, A1).astype(
                        cdtype
                    )  # [B, xM, xM]
                else:
                    partial = jnp.einsum(
                        "fqk,bfkl,frl->bqr", A0, NMBF_NMBF, A1,
                        precision=prec,
                    )  # [B, xM, xM]

            summed = _psum_scatter_c(
                partial, TILE_AXIS, scatter_dimension=0, n=ndev
            )  # [Bloc, xM, xM]

            d = jax.lax.axis_index(TILE_AXIS)
            Bloc = summed.shape[0]
            my_off1 = jax.lax.dynamic_slice_in_dim(sg_off1, d * Bloc, Bloc)
            my_valid = jax.lax.dynamic_slice_in_dim(valid, d * Bloc, Bloc)
            my_mask1 = jax.lax.dynamic_slice_in_dim(mask1, d * Bloc, Bloc)

            base = xM // 2 - xA // 2 + jnp.arange(xA, dtype=jnp.int32)
            G0 = jnp.take(Fi_xM, (base + off0) % xM, axis=0)
            G1 = jax.vmap(
                lambda o1b: jnp.take(Fi_xM, (base + o1b) % xM, axis=0)
            )(my_off1)  # [Bloc, xA, xM]
            if use_pallas_fwd:
                from ..ops.pallas_kernels import fused_lr_sandwich

                sg = fused_lr_sandwich(G0, summed, G1).astype(cdtype)
            else:
                sg = jnp.einsum(
                    "qk,bkl,brl->bqr", G0, summed, G1, precision=prec
                )
            sg = sg * mask0[jnp.newaxis, :, jnp.newaxis]
            sg = sg * my_mask1[:, jnp.newaxis, :]
            sg = sg * my_valid[:, jnp.newaxis, jnp.newaxis].astype(cdtype)
            if self.process_subgrid is not None:
                sg = self.process_subgrid(sg, off0, my_off1)
            return sg

        def fwd_column_local(BF_F, foff0, foff1, off0, sg_off1, valid,
                             mask0, mask1):
            # Column step: NMBF_BF once per (facet, column) — the cost the
            # reference's forward LRU amortises (api_helper extract_column).
            def col_one(bf, o1):
                nm = extract_from_facet_fn(bf, off0, 0, N, yN, c)
                return prep_facet_scan(nm, o1, 1, Fb, yN)

            NMBF_BF = jax.vmap(col_one)(BF_F, foff1)  # [Floc, c, yN]

            # All subgrids of the column at once: [B, Floc, c, c]
            def per_sg(o1b):
                return jax.vmap(
                    lambda nb: extract_from_facet_fn(nb, o1b, 1, N, yN, c)
                )(NMBF_BF)

            NMBF_NMBF = jax.vmap(per_sg)(sg_off1)

            # Window + pad into the xM domain, accumulate over local facets
            def add2d(x, o0f, o1f):
                t = add_to_subgrid_fn(x, o0f, 0, N, xM, Fn)
                return add_to_subgrid_fn(t, o1f, 1, N, xM, Fn)

            terms = jax.vmap(
                lambda xb: jax.vmap(add2d)(xb, foff0, foff1)
            )(NMBF_NMBF)  # [B, Floc, xM, xM]
            partial = terms.sum(axis=1)  # [B, xM, xM]

            # The redistribution: reduce over facet shards, scatter over
            # the subgrid batch — one collective over ICI.
            summed = _psum_scatter_c(
                partial, TILE_AXIS, scatter_dimension=0, n=ndev
            )  # [Bloc, xM, xM]

            d = jax.lax.axis_index(TILE_AXIS)
            Bloc = summed.shape[0]
            my_off1 = jax.lax.dynamic_slice_in_dim(sg_off1, d * Bloc, Bloc)
            my_valid = jax.lax.dynamic_slice_in_dim(valid, d * Bloc, Bloc)
            my_mask1 = jax.lax.dynamic_slice_in_dim(mask1, d * Bloc, Bloc)

            sg = jax.vmap(
                lambda s, o1b: finish_subgrid_fn(s, [off0, o1b], xA)
            )(summed, my_off1)  # [Bloc, xA, xA]
            sg = sg * mask0[jnp.newaxis, :, jnp.newaxis]
            sg = sg * my_mask1[:, jnp.newaxis, :]
            sg = sg * my_valid[:, jnp.newaxis, jnp.newaxis].astype(cdtype)
            if self.process_subgrid is not None:
                sg = self.process_subgrid(sg, off0, my_off1)
            return sg

        ndev = self.n_devices
        fold_mode = self.fold_mode
        finish_post = self.finish_mode == "post"
        # carry width: finished rows are yB wide; unfinished (post) yN
        acc_w = yN if finish_post else yB

        def _bwd_nafb_mm(sg, E0, E1, F_xM, foff1, fmask1, off0,
                         sg_off1, valid, fsrc, do_finish=True):
            # Matmul formulation of prepare_subgrid (column/row gathers of
            # the DFT matrix) and extract_from_subgrid (precomputed
            # per-facet operators); returns the column's finished facet
            # rows plus their target positions in the accumulator.
            d = jax.lax.axis_index(TILE_AXIS)
            Bloc = sg.shape[0]
            my_off1 = jax.lax.dynamic_slice_in_dim(sg_off1, d * Bloc, Bloc)
            my_valid = jax.lax.dynamic_slice_in_dim(valid, d * Bloc, Bloc)

            base = xM // 2 - xA // 2 + jnp.arange(xA, dtype=jnp.int32)
            P0 = jnp.take(F_xM, (base + off0) % xM, axis=1)
            P1 = jax.vmap(
                lambda o1b: jnp.take(F_xM, (base + o1b) % xM, axis=1)
            )(my_off1)  # [Bloc, xM, xA]
            sgv = sg * my_valid[:, jnp.newaxis, jnp.newaxis].astype(cdtype)
            if use_pallas_fwd:
                from ..ops.pallas_kernels import fused_lr_sandwich

                FS = fused_lr_sandwich(P0, sgv, P1).astype(cdtype)
            else:
                FS = jnp.einsum(
                    "iq,bqr,bjr->bij", P0, sgv, P1, precision=prec
                )  # [Bloc, xM, xM]

            if use_pallas_fwd:
                from ..ops.pallas_kernels import fused_double_sandwich

                NAF_NAF = fused_double_sandwich(E0, FS, E1).astype(
                    cdtype
                )  # [Bloc, F_pad, c, c]
            else:
                NAF_NAF = jnp.einsum(
                    "fki,bij,flj->bfkl", E0, FS, E1, precision=prec
                )  # [Bloc, F_pad, c, c]

            x = _all_to_all_c(
                NAF_NAF, TILE_AXIS, split_axis=1, concat_axis=0, n=ndev
            )  # [B, Floc, c, c]

            B = x.shape[0]
            Floc = x.shape[1]
            if fold_mode == "gather":
                # duplicate-free inverse map: K gathers along the minor
                # axis (no scatter)
                xr = x.transpose(1, 2, 0, 3).reshape(Floc, c, B * c)
                xr = jnp.pad(xr, ((0, 0), (0, 0), (0, 1)))
                NAF_MNAF = jnp.take(xr, fsrc[0], axis=2)
                for ks in range(1, fsrc.shape[0]):
                    NAF_MNAF = NAF_MNAF + jnp.take(xr, fsrc[ks], axis=2)
            elif fold_mode == "gatherm":
                # same map, gathering whole [Floc, c] rows along the
                # major axis then transposing back
                xr = x.transpose(0, 3, 1, 2).reshape(B * c, Floc, c)
                xr = jnp.pad(xr, ((0, 1), (0, 0), (0, 0)))
                g = jnp.take(xr, fsrc[0], axis=0)
                for ks in range(1, fsrc.shape[0]):
                    g = g + jnp.take(xr, fsrc[ks], axis=0)
                NAF_MNAF = jnp.transpose(g, (1, 2, 0))
            else:
                s = jnp.floor_divide(sg_off1.astype(jnp.int32), N // yN)
                k = jnp.arange(c, dtype=jnp.int32)
                idx = (
                    yN // 2 - c // 2
                    + jnp.mod(k[jnp.newaxis, :] - s[:, jnp.newaxis], c)
                    + s[:, jnp.newaxis]
                ) % yN  # [B, c]
                xr = x.transpose(1, 2, 0, 3).reshape(-1, c, B * c)
                NAF_MNAF = jnp.zeros((x.shape[1], c, yN), dtype=cdtype)
                NAF_MNAF = NAF_MNAF.at[:, :, idx.reshape(-1)].add(xr)

            # add_to_facet axis=0, fused: the c (finished) rows scatter
            # straight into the accumulator instead of padding each
            # column's contribution to a full [Floc, yN, yB] temporary
            # (the pad+add dominated the backward fold's HBM traffic).
            s0 = jnp.floor_divide(off0.astype(jnp.int32), N // yN)
            k0 = jnp.arange(c, dtype=jnp.int32)
            rows = (
                yN // 2 - c // 2 + jnp.mod(k0 - s0, c) + s0
            ) % yN  # [c]

            if not do_finish:
                # finish_mode="post": fold the unfinished [Floc, c, yN]
                # block; the axis-1 finish runs once after the scan
                return NAF_MNAF, rows, s0

            if use_pallas_fft_bwd:
                from ..ops.pallas_fft import fused_finish_rows

                NAF_BMNAF = fused_finish_rows(
                    NAF_MNAF, fb_yB,
                    _my(foff1, d, NAF_MNAF.shape[0]),
                    _my(fmask1, d, NAF_MNAF.shape[0]), yB,
                    form=fform,
                ).astype(cdtype)
            else:
                NAF_BMNAF = jax.vmap(
                    lambda a, o1f: fin_facet_scan(a, o1f, yB, 1, Fb)
                )(NAF_MNAF, _my(foff1, d, NAF_MNAF.shape[0]))
                NAF_BMNAF = NAF_BMNAF * _my(
                    fmask1, d, NAF_MNAF.shape[0]
                )[:, jnp.newaxis, :]

            return NAF_BMNAF, rows, s0

        def bwd_column_local_mm(sg, MNAF_BMNAF, E0, E1, F_xM, foff1,
                                fmask1, off0, sg_off1, valid, fsrc):
            NAF_BMNAF, rows, _ = _bwd_nafb_mm(
                sg, E0, E1, F_xM, foff1, fmask1, off0, sg_off1, valid,
                fsrc,
            )
            return MNAF_BMNAF.at[:, rows, :].add(
                NAF_BMNAF, unique_indices=True, mode="promise_in_bounds"
            )

        def _pair_fold(acc_pair, NAF_BMNAF, s0):
            # Scan-carry fold: the accumulator is an f32 (real, imag)
            # pair with c PADDING rows ([2, Floc, yN + c, yB]) so the
            # column's wrap window [start, start + c) never wraps, and
            # the fold is a dynamic_slice + add + dynamic_update_slice —
            # XLA reliably updates a scan carry in place for DUS, while
            # the previous gather-scatter re-materialised the multi-GB
            # carry every column. The in-window permutation (value j
            # comes from finished row (j + s0) mod c) is a roll of the
            # c-row update block, not of the accumulator.
            u = jnp.stack(
                [jnp.real(NAF_BMNAF), jnp.imag(NAF_BMNAF)]
            ).astype(acc_pair.dtype)
            u = jnp.roll(u, -s0, axis=2)
            start = (yN // 2 - c // 2 + s0) % yN
            zero = jnp.zeros((), jnp.int32)
            blk = jax.lax.dynamic_slice(
                acc_pair, (zero, zero, start, zero),
                (2, acc_pair.shape[1], c, acc_pair.shape[3]),
            )
            return jax.lax.dynamic_update_slice(
                acc_pair, blk + u, (zero, zero, start, zero)
            )

        def bwd_column_pair_mm(sg, acc_pair, E0, E1, F_xM, foff1, fmask1,
                               off0, sg_off1, valid, fsrc):
            NAF_BMNAF, _, s0 = _bwd_nafb_mm(
                sg, E0, E1, F_xM, foff1, fmask1, off0, sg_off1, valid,
                fsrc, do_finish=not finish_post,
            )
            return _pair_fold(acc_pair, NAF_BMNAF, s0)

        def _bwd_nafb_fft(sg, foff0, foff1, fmask1, off0, sg_off1,
                          valid):
            # sg [Bloc, xA, xA] subgrid-sharded; accumulator facet-sharded.
            d = jax.lax.axis_index(TILE_AXIS)
            Bloc = sg.shape[0]
            my_off1 = jax.lax.dynamic_slice_in_dim(sg_off1, d * Bloc, Bloc)
            my_valid = jax.lax.dynamic_slice_in_dim(valid, d * Bloc, Bloc)

            FS = jax.vmap(
                lambda s, o1b, v: prepare_subgrid_fn(
                    s * v.astype(cdtype), [off0, o1b], xM
                )
            )(sg, my_off1, my_valid)  # [Bloc, xM, xM]

            def ext_all(fs):
                def ext_f(o0f, o1f):
                    e0 = extract_from_subgrid_fn(fs, o0f, 0, N, xM, c, Fn)
                    return extract_from_subgrid_fn(e0, o1f, 1, N, xM, c, Fn)

                return jax.vmap(ext_f)(foff0, foff1)

            NAF_NAF = jax.vmap(ext_all)(FS)  # [Bloc, F_pad, c, c]

            # Redistribute: subgrid-sharded -> facet-sharded over ICI.
            x = _all_to_all_c(
                NAF_NAF, TILE_AXIS, split_axis=1, concat_axis=0, n=ndev
            )  # [B, Floc, c, c]

            # accumulate_column, fused: scatter-add every subgrid's
            # contribution directly into the [Floc, c, yN] column
            # accumulator instead of materialising B padded copies.
            s = jnp.floor_divide(sg_off1.astype(jnp.int32), N // yN)
            k = jnp.arange(c, dtype=jnp.int32)
            # target column of source column k for subgrid b (derived from
            # roll(-s) . pad_mid . roll(+s), see ops.core.add_to_facet_fn)
            idx = (
                yN // 2 - c // 2
                + jnp.mod(k[jnp.newaxis, :] - s[:, jnp.newaxis], c)
                + s[:, jnp.newaxis]
            ) % yN  # [B, c]
            B = x.shape[0]
            xr = x.transpose(1, 2, 0, 3).reshape(-1, c, B * c)
            NAF_MNAF = jnp.zeros((x.shape[1], c, yN), dtype=cdtype)
            NAF_MNAF = NAF_MNAF.at[:, :, idx.reshape(-1)].add(xr)

            # accumulate_facet: finish the column along axis 1 and fold it
            # into the facet accumulator.
            NAF_BMNAF = jax.vmap(
                lambda a, o1f: fin_facet_scan(a, o1f, yB, 1, Fb)
            )(NAF_MNAF, _my(foff1, d, NAF_MNAF.shape[0]))
            NAF_BMNAF = NAF_BMNAF * _my(
                fmask1, d, NAF_MNAF.shape[0]
            )[:, jnp.newaxis, :]

            # add_to_facet axis=0, fused: scatter-add the c finished rows
            # straight into the accumulator instead of padding each
            # column's contribution to a full [Floc, yN, yB] temporary
            # (the pad+add dominated the backward fold's HBM traffic).
            s0 = jnp.floor_divide(off0.astype(jnp.int32), N // yN)
            k0 = jnp.arange(c, dtype=jnp.int32)
            rows = (
                yN // 2 - c // 2 + jnp.mod(k0 - s0, c) + s0
            ) % yN  # [c]
            return NAF_BMNAF, rows, s0

        def bwd_column_local(sg, MNAF_BMNAF, foff0, foff1, fmask1, off0,
                             sg_off1, valid):
            NAF_BMNAF, rows, _ = _bwd_nafb_fft(
                sg, foff0, foff1, fmask1, off0, sg_off1, valid
            )
            return MNAF_BMNAF.at[:, rows, :].add(
                NAF_BMNAF, unique_indices=True, mode="promise_in_bounds"
            )

        def bwd_column_pair(sg, acc_pair, foff0, foff1, fmask1, off0,
                            sg_off1, valid):
            # f32-pair padded-DUS carry variant (see _pair_fold)
            NAF_BMNAF, _, s0 = _bwd_nafb_fft(
                sg, foff0, foff1, fmask1, off0, sg_off1, valid
            )
            return _pair_fold(acc_pair, NAF_BMNAF, s0)

        def _my(arr, d, nloc):
            return jax.lax.dynamic_slice_in_dim(arr, d * nloc, nloc)

        def finish_local(MNAF_BMNAF, foff0, fmask0):
            if use_pallas_fft_bwd and phase_fused:
                # the axis-0 finish through the fused forward kernel
                # (axis moved last at XLA level; with form=bd the
                # permuted output folds into the gather indices)
                from ..ops.pallas_fft import fused_finish_rows

                x = jnp.swapaxes(MNAF_BMNAF, 1, 2)  # [Floc, yB, yN]
                out = fused_finish_rows(
                    x, fb_yB, foff0, fmask0, yB, form=fform
                ).astype(cdtype)
                return jnp.swapaxes(out, 1, 2)  # [Floc, yB, yB]
            out = jax.vmap(
                lambda a, o0: fin_facet(a, o0, yB, 0, Fb)
            )(MNAF_BMNAF, foff0)
            return out * fmask0[:, :, jnp.newaxis]

        # shard_map's varying-axes (vma) type checking is ON wherever the
        # kernels compile (TPU): pallas_call outputs carry the input's
        # vma type via ops.pallas_kernels._sds. Only the Pallas *HLO
        # interpreter* (the CPU test path) still trips the checker — its
        # internal block dynamic_slice mixes varying refs with
        # non-varying program-id indices — so the exemption is scoped to
        # interpret-mode runs of the pallas engine only.
        from ..ops.pallas_kernels import _is_tpu

        pallas_interpret = self.engine_mode == "pallas" and not _is_tpu()
        shmap = functools.partial(
            jax.shard_map, mesh=mesh, check_vma=not pallas_interpret,
        )
        t, r = P(TILE_AXIS), P()

        self._prepare = jax.jit(
            shmap(prepare_local, in_specs=(t, t), out_specs=t)
        )
        if self._operator_mode:
            # A0/A1 are facet-sharded with BF_F; E0/E1 and the DFT
            # matrices are replicated (the backward extraction computes
            # every facet's block from the local subgrids before the
            # all_to_all re-shards by facet).
            self._fwd_column = jax.jit(
                shmap(
                    fwd_column_local_mm,
                    in_specs=(t, t, t, r, t, t, r, r, r, r, r),
                    out_specs=t,
                )
            )
            self._bwd_column = jax.jit(
                shmap(
                    bwd_column_local_mm,
                    in_specs=(t, t, r, r, r, r, r, r, r, r, r),
                    out_specs=t,
                ),
                donate_argnums=(1,),
            )
        else:
            self._fwd_column = jax.jit(
                shmap(
                    fwd_column_local,
                    in_specs=(t, t, t, r, r, r, r, r),
                    out_specs=t,
                )
            )
            # Facet metadata is replicated here: the extraction step
            # computes every facet's contribution from the local subgrids
            # before the all_to_all re-shards by facet.
            self._bwd_column = jax.jit(
                shmap(
                    bwd_column_local,
                    in_specs=(t, t, r, r, r, r, r, r),
                    out_specs=t,
                ),
                donate_argnums=(1,),
            )
        self._finish = jax.jit(
            shmap(finish_local, in_specs=(t, t, t), out_specs=t)
        )

        def finish_pair_local(acc_pair, foff0, fmask0, foff1, fmask1):
            # fold the c padding rows (wrapped column windows) back onto
            # the start of the yN axis, then finish
            folded = acc_pair[:, :, :yN, :].at[:, :, :c, :].add(
                acc_pair[:, :, yN:, :]
            )
            acc = jax.lax.complex(folded[0], folded[1]).astype(cdtype)
            if finish_post:
                # the deferred axis-1 finish (linear — commutes with
                # the column sum): yN-scale transform + Fb + mask1 over
                # all rows at once
                if use_pallas_fft_bwd:
                    from ..ops.pallas_fft import fused_finish_rows

                    acc = fused_finish_rows(
                        acc, fb_yB, foff1, fmask1, yB, form=fform
                    ).astype(cdtype)
                else:
                    acc = jax.vmap(
                        lambda a, o1f: fin_facet(a, o1f, yB, 1, Fb)
                    )(acc, foff1)
                    acc = acc * fmask1[:, jnp.newaxis, :]
            return finish_local(acc, foff0, fmask0)

        self._finish_pair = jax.jit(
            shmap(
                finish_pair_local,
                in_specs=(P(None, TILE_AXIS), t, t, t, t),
                out_specs=t,
            )
        )

        # --- whole-stream program: prepare -> scan over columns (fused
        # forward+backward per column) -> finish, in ONE compiled
        # dispatch. Columns are an identical offset-traced program, so
        # lax.scan carries the facet accumulator across them with zero
        # per-column dispatch overhead (which dominates on tunnelled or
        # small-problem setups).
        if self._operator_mode:
            # Static per-column scatter rows (padded accumulator space)
            # for the ys accumulator mode: finished row k of column ci
            # lands at padded row start + ((k - s0) mod c) — the same
            # placement _pair_fold reaches via roll + DUS, but with the
            # indices known at trace time (plan offsets are host data).
            _offs0 = np.asarray(
                self.plan.off0[: self.plan.n_columns], np.int64
            )
            _s0s = _offs0 // (N // yN)
            _starts = (yN // 2 - c // 2 + _s0s) % yN
            _k0 = np.arange(c, dtype=np.int64)
            _ys_rows = (
                _starts[:, None] + (_k0[None, :] - _s0s[:, None]) % c
            ).reshape(-1).astype(np.int32)  # [C * c]
            use_ys = self.acc_mode == "ys" and self.columns_per_step == 1

            prep_full = self.prep_mode == "full"

            def stream_local(facets, A0, A1, Fi_xM, F_xM, E0, E1, foff0,
                             foff1, ph1, foff1_r, fmask0, fmask1_r,
                             cols):
                BF_F = prepare_local(facets, foff0)
                Floc = facets.shape[0]
                if prep_full:
                    # transform every row once, before the scan
                    if use_pallas_fft:
                        from ..ops.pallas_fft import fused_prepare_rows

                        BF_F = fused_prepare_rows(
                            BF_F, fb_yB, ph1, yN, form=fform
                        ).astype(cdtype)  # [Floc, yN, yN]
                    else:
                        BF_F = jax.vmap(
                            lambda bf, o1: prep_facet_scan(bf, o1, 1,
                                                           Fb, yN)
                        )(BF_F, foff1)

                if use_ys:
                    # ys mode: no multi-GB carry — each column's
                    # finished rows are stacked scan outputs; one
                    # static-index scatter-add builds the padded pair
                    # accumulator after the scan.
                    def body_ys(_, col):
                        off0, sg_off1, valid, mask0, mask1 = col[:5]
                        sg = fwd_column_local_mm(
                            BF_F, A0, A1, Fi_xM, foff1, ph1, off0,
                            sg_off1, valid, mask0, mask1,
                            prepped=prep_full,
                        )
                        NAF_BMNAF, _, _ = _bwd_nafb_mm(
                            sg, E0, E1, F_xM, foff1_r, fmask1_r,
                            off0, sg_off1, valid, col[5],
                        )
                        u = jnp.stack(
                            [jnp.real(NAF_BMNAF), jnp.imag(NAF_BMNAF)]
                        ).astype(rdtype)  # [2, Floc, c, yB]
                        return 0, u

                    _, ys = jax.lax.scan(
                        body_ys, 0, cols, unroll=self.scan_unroll,
                    )  # [C, 2, Floc, c, yB]
                    u_all = jnp.transpose(
                        ys, (1, 2, 0, 3, 4)
                    ).reshape(2, Floc, -1, yB)
                    accum0 = _varying_zeros(
                        (2, Floc, yN + c, yB), rdtype
                    )
                    return accum0.at[:, :, jnp.asarray(_ys_rows), :].add(
                        u_all, mode="promise_in_bounds"
                    )

                # the carry is an f32 (real, imag) pair: float scatters
                # are the native TPU path, and complex scatters on a scan
                # carry miscompile for some shapes
                accum0 = _varying_zeros(
                    (2, Floc, yN + c, acc_w), rdtype
                )

                k = self.columns_per_step

                def body(acc, col):
                    if k == 1:
                        off0, sg_off1, valid, mask0, mask1 = col[:5]
                        sg = fwd_column_local_mm(
                            BF_F, A0, A1, Fi_xM, foff1, ph1, off0,
                            sg_off1, valid, mask0, mask1,
                            prepped=prep_full,
                        )
                        acc = bwd_column_pair_mm(
                            sg, acc, E0, E1, F_xM, foff1_r, fmask1_r,
                            off0, sg_off1, valid, col[5],
                        )
                        return acc, None
                    # k columns per step: the forward passes are
                    # independent, so vmapping them lets XLA interleave
                    # one column's FFT chain (VPU) with another's
                    # contraction (MXU); the backward folds commute
                    # (disjoint or additive scatter rows) and run
                    # sequentially on the carry.
                    sgs = jax.vmap(
                        lambda off0, sg_off1, valid, mask0, mask1:
                        fwd_column_local_mm(
                            BF_F, A0, A1, Fi_xM, foff1, ph1, off0,
                            sg_off1, valid, mask0, mask1,
                            prepped=prep_full,
                        )
                    )(*col[:5])
                    for i in range(k):
                        acc = bwd_column_pair_mm(
                            sgs[i], acc, E0, E1, F_xM, foff1_r,
                            fmask1_r, col[0][i], col[1][i], col[2][i],
                            col[5][i],
                        )
                    return acc, None

                accum, _ = jax.lax.scan(
                    body, accum0, cols, unroll=self.scan_unroll,
                )
                # finishing happens in a separate program: fusing the
                # axis-0 finish into the same module as the scan
                # miscompiles on some shapes (TPU kernel fault)
                return accum

            def stream_fwd_local(facets, A0, A1, Fi_xM, foff0, foff1,
                                 ph1, cols):
                # Degridding direction: produce every column's subgrids
                # [C, Bloc, xA, xA], one compiled dispatch.
                BF_F = prepare_local(facets, foff0)

                def body(_, col):
                    off0, sg_off1, valid, mask0, mask1 = col[:5]
                    sg = fwd_column_local_mm(
                        BF_F, A0, A1, Fi_xM, foff1, ph1, off0, sg_off1,
                        valid, mask0, mask1,
                    )
                    return 0, sg

                _, sgs = jax.lax.scan(body, 0, cols)
                return sgs

            def stream_bwd_local(sgs, E0, E1, F_xM, foff0, foff1_r,
                                 fmask0, fmask1_r, cols):
                # Gridding direction: consume [C, Bloc, xA, xA] subgrids
                # into finished facets, one compiled dispatch.
                accum0 = _varying_zeros(
                    (2, fmask0.shape[0], yN + c, acc_w), rdtype
                )

                def body(acc, col_and_sg):
                    col, sg = col_and_sg
                    off0, sg_off1, valid = col[:3]
                    acc = bwd_column_pair_mm(
                        sg, acc, E0, E1, F_xM, foff1_r, fmask1_r, off0,
                        sg_off1, valid, col[5],
                    )
                    return acc, None

                accum, _ = jax.lax.scan(body, accum0, (cols, sgs))
                return accum

            def stream_segment_local(BF_F, acc_pair, A0, A1, Fi_xM, F_xM,
                                     E0, E1, foff1, ph1, foff1_r,
                                     fmask1_r, cols):
                # Checkpointable slice of the fused stream: scan a subset
                # of columns carrying an existing accumulator pair. Used
                # by roundtrip_checkpointed — the scan is chunked at
                # checkpoint granularity so a preempted run resumes from
                # the last saved segment.
                def body(acc, col):
                    off0, sg_off1, valid, mask0, mask1 = col[:5]
                    sg = fwd_column_local_mm(
                        BF_F, A0, A1, Fi_xM, foff1, ph1, off0, sg_off1,
                        valid, mask0, mask1,
                    )
                    acc = bwd_column_pair_mm(
                        sg, acc, E0, E1, F_xM, foff1_r, fmask1_r,
                        off0, sg_off1, valid, col[5],
                    )
                    return acc, None

                acc, _ = jax.lax.scan(body, acc_pair, cols)
                return acc

            col_spec = (r, r, r, r, r, r)
            self._stream = jax.jit(
                shmap(
                    stream_local,
                    in_specs=(t, t, t, r, r, r, r, t, t, t, r, t, r,
                              col_spec),
                    out_specs=P(None, TILE_AXIS),
                ),
            )
            self._stream_segment = jax.jit(
                shmap(
                    stream_segment_local,
                    in_specs=(t, P(None, TILE_AXIS), t, t, r, r, r, r,
                              t, t, r, r, col_spec),
                    out_specs=P(None, TILE_AXIS),
                ),
                donate_argnums=(1,),
            )
            self._stream_fwd = jax.jit(
                shmap(
                    stream_fwd_local,
                    in_specs=(t, t, t, r, t, t, t, col_spec),
                    # ys are stacked per column: [C, Bloc, xA, xA] with
                    # the batch axis sharded
                    out_specs=P(None, TILE_AXIS),
                ),
            )
            self._stream_bwd = jax.jit(
                shmap(
                    stream_bwd_local,
                    in_specs=(P(None, TILE_AXIS), r, r, r, t, r, t, r,
                              col_spec),
                    out_specs=P(None, TILE_AXIS),
                ),
            )
        else:

            def stream_local(facets, foff0, foff1, foff0_r, foff1_r,
                             fmask0, fmask1_r, cols):
                BF_F = prepare_local(facets, foff0)
                accum0 = _varying_zeros(
                    (2, facets.shape[0], yN + c, yB), rdtype
                )

                def body(acc, col):
                    off0, sg_off1, valid, mask0, mask1 = col[:5]
                    sg = fwd_column_local(
                        BF_F, foff0, foff1, off0, sg_off1, valid, mask0,
                        mask1,
                    )
                    acc = bwd_column_pair(
                        sg, acc, foff0_r, foff1_r, fmask1_r, off0,
                        sg_off1, valid,
                    )
                    return acc, None

                accum, _ = jax.lax.scan(body, accum0, cols)
                return accum

            col_spec = (r, r, r, r, r, r)
            self._stream = jax.jit(
                shmap(
                    stream_local,
                    in_specs=(t, t, t, r, r, t, r, col_spec),
                    out_specs=P(None, TILE_AXIS),
                ),
            )

    # ------------------------------------------------------------- driving

    def prepare_facets(self, packed_facets):
        """facets [F_pad, yB, yB] -> device-resident BF_F [F_pad, yN, yB]."""
        return self._prepare(packed_facets, self._dev(self._foff0))

    def _dev(self, arr, repl=False):
        return jax.device_put(arr, self._repl if repl else self._shard)

    def _dev_c(self, key, arr, repl=False):
        """Cached complex device constant via float-pair transfer."""
        from ..utils.transfer import put_complex

        cache = getattr(self, "_dev_cache", None)
        if cache is None:
            cache = self._dev_cache = {}
        if key not in cache:
            cache[key] = put_complex(
                arr, self._repl if repl else self._shard,
                dtype=self.core.dtype,
            )
        return cache[key]

    def zero_accumulator(self):
        """Fresh facet-sharded MNAF_BMNAF accumulator.

        Built inside a compiled program: eager complex-constant creation
        implies a host transfer, which some TPU attachments lack."""
        if not hasattr(self, "_zeros_fn"):
            shape = (self.F_pad, self.core.yN_size, self.yB_size)
            dtype = self.core.dtype
            self._zeros_fn = jax.jit(
                lambda: jnp.zeros(shape, dtype=dtype),
                out_shardings=self._shard,
            )
        return self._zeros_fn()

    def _forward_args(self, BF_F, col_index):
        off0, sg_off1, valid, mask0, mask1 = self._col_args(
            col_index
        )[:5]
        if self._operator_mode:
            return (
                BF_F,
                self._dev_c("A0", self._A0),
                self._dev_c("A1", self._A1),
                self._dev_c("Fi", self._Fi_xM, repl=True),
                self._dev(self._foff1),
                self._dev_c("ph1", self._ph1),
                off0, sg_off1, valid, mask0, mask1,
            )
        return (
            BF_F,
            self._dev(self._foff0),
            self._dev(self._foff1),
            off0, sg_off1, valid, mask0, mask1,
        )

    def forward_column(self, BF_F, col_index):
        """Produce the column's approximate subgrids [B, xA, xA]
        (batch-sharded)."""
        return self._fwd_column(*self._forward_args(BF_F, col_index))

    def _backward_args(self, sg_batch, col_index, MNAF_BMNAF):
        ca = self._col_args(col_index)
        off0, sg_off1, valid = ca[:3]
        if self._operator_mode:
            return (
                sg_batch,
                MNAF_BMNAF,
                self._dev_c("E0", self._E0, repl=True),
                self._dev_c("E1", self._E1, repl=True),
                self._dev_c("F", self._F_xM, repl=True),
                self._dev(self._foff1, repl=True),
                self._dev(self._fmask1, repl=True),
                off0, sg_off1, valid, ca[5],
            )
        return (
            sg_batch,
            MNAF_BMNAF,
            self._dev(self._foff0, repl=True),
            self._dev(self._foff1, repl=True),
            self._dev(self._fmask1, repl=True),
            off0, sg_off1, valid,
        )

    def backward_column(self, sg_batch, col_index, MNAF_BMNAF):
        """Fold a column of subgrids into the facet accumulator."""
        return self._bwd_column(
            *self._backward_args(sg_batch, col_index, MNAF_BMNAF)
        )

    def lowered(self, col_index=0):
        """AOT-compile the four programs at a column's shapes.

        Returns ``{name: compiled}`` for static inspection — collective
        accounting (:func:`..utils.observability.collective_bytes`), FLOP
        estimates, memory analyses — without executing anything.
        """
        core = self.core
        yN, yB = core.yN_size, self.yB_size
        xA = self.xA_size
        B = self.plan.batch

        def sds(shape, dtype=None, repl=False):
            return jax.ShapeDtypeStruct(
                shape, dtype or core.dtype,
                sharding=self._repl if repl else self._shard,
            )

        facets = sds((self.F_pad, yB, yB))
        BF_F = sds((self.F_pad, yN, yB))
        accum = sds((self.F_pad, yN, yB))
        sg = sds((B, xA, xA))

        out = {}
        out["prepare"] = self._prepare.lower(
            facets, self._dev(self._foff0)
        ).compile()
        out["fwd_column"] = self._fwd_column.lower(
            *self._forward_args(BF_F, col_index)
        ).compile()
        out["bwd_column"] = self._bwd_column.lower(
            *self._backward_args(sg, col_index, accum)
        ).compile()
        out["finish"] = self._finish.lower(
            accum, self._dev(self._foff0), self._dev(self._fmask0)
        ).compile()
        return out

    def finish_facets(self, MNAF_BMNAF):
        """Finish all facets: [F_pad, yB, yB] (facet-sharded)."""
        return self._finish(
            MNAF_BMNAF, self._dev(self._foff0), self._dev(self._fmask0)
        )

    def _all_col_args(self, group=1):
        plan = self.plan
        rd = self.core.real_dtype
        arrs = [
            np.asarray(plan.off0, np.int32),
            np.asarray(plan.sg_off1, np.int32),
            np.asarray(plan.valid, rd),
            np.asarray(plan.mask0, rd),
            np.asarray(plan.mask1, rd),
            np.asarray(self._fold_sources(), np.int32),
        ]
        if group > 1:
            C = len(plan.off0)
            pad = (-C) % group
            out = []
            for a in arrs:
                if pad:
                    tail = np.repeat(a[-1:], pad, axis=0)
                    a = np.concatenate([a, tail], axis=0)
                out.append(a.reshape((len(a) // group, group)
                                     + a.shape[1:]))
            arrs = out
            # padded dummy columns contribute nothing: valid = 0
            if pad:
                arrs[2][-1, -pad:] = 0
        return tuple(jnp.asarray(a) for a in arrs)

    def roundtrip(self, packed_facets, fused=True):
        """Full streaming round trip: facets -> every subgrid -> facets.

        Returns ``(facets_out, n_subgrids)``.

        ``fused=True`` (default) runs prepare + a ``lax.scan`` over the
        fused per-column forward+backward + finish as ONE compiled
        program — zero per-column dispatch overhead. ``fused=False``
        drives the per-column programs from Python (the mode the
        streaming API and checkpointer use); JAX async dispatch still
        overlaps column k+1's forward with column k's backward fold.
        """
        n = sum(len(c) for c in self.plan.configs)
        if fused:
            return self._run_stream(packed_facets), n
        BF_F = self.prepare_facets(packed_facets)
        accum = self.zero_accumulator()
        for ci in range(self.plan.n_columns):
            sg = self.forward_column(BF_F, ci)
            accum = self.backward_column(sg, ci, accum)
        return self.finish_facets(accum), n

    def forward_stream(self, packed_facets):
        """Degridding direction in one dispatch: facets -> every subgrid
        of every column, returned as ``[C, B, xA, xA]`` (batch-sharded).
        Operator engine modes only."""
        if not self._operator_mode:
            raise NotImplementedError(
                "forward_stream requires engine_mode matmul/pallas"
            )
        cols = self._all_col_args()
        return self._stream_fwd(
            packed_facets,
            self._dev_c("A0", self._A0),
            self._dev_c("A1", self._A1),
            self._dev_c("Fi", self._Fi_xM, repl=True),
            self._dev(self._foff0),
            self._dev(self._foff1),
            self._dev_c("ph1", self._ph1),
            cols,
        )

    def backward_stream(self, subgrids):
        """Gridding direction in one dispatch: ``[C, B, xA, xA]``
        subgrids -> finished facets. Operator engine modes only."""
        if not self._operator_mode:
            raise NotImplementedError(
                "backward_stream requires engine_mode matmul/pallas"
            )
        cols = self._all_col_args()
        acc_pair = self._stream_bwd(
            subgrids,
            self._dev_c("E0", self._E0, repl=True),
            self._dev_c("E1", self._E1, repl=True),
            self._dev_c("F", self._F_xM, repl=True),
            self._dev(self._foff0),
            self._dev(self._foff1, repl=True),
            self._dev(self._fmask0),
            self._dev(self._fmask1, repl=True),
            cols,
        )
        return self._finish_pair(
            acc_pair, self._dev(self._foff0), self._dev(self._fmask0),
            self._dev(self._foff1), self._dev(self._fmask1),
        )

    def _stream_args(self, packed_facets):
        """Argument tuple for ``self._stream`` (shared by execution and
        AOT cost analysis)."""
        cols = self._all_col_args(
            self.columns_per_step if self._operator_mode else 1
        )
        if self._operator_mode:
            return (
                packed_facets,
                self._dev_c("A0", self._A0),
                self._dev_c("A1", self._A1),
                self._dev_c("Fi", self._Fi_xM, repl=True),
                self._dev_c("F", self._F_xM, repl=True),
                self._dev_c("E0", self._E0, repl=True),
                self._dev_c("E1", self._E1, repl=True),
                self._dev(self._foff0),
                self._dev(self._foff1),
                self._dev_c("ph1", self._ph1),
                self._dev(self._foff1, repl=True),
                self._dev(self._fmask0),
                self._dev(self._fmask1, repl=True),
                cols,
            )
        return (
            packed_facets,
            self._dev(self._foff0),
            self._dev(self._foff1),
            self._dev(self._foff0, repl=True),
            self._dev(self._foff1, repl=True),
            self._dev(self._fmask0),
            self._dev(self._fmask1, repl=True),
            cols,
        )

    def _run_stream(self, packed_facets):
        acc_pair = self._stream(*self._stream_args(packed_facets))
        return self._finish_pair(
            acc_pair, self._dev(self._foff0), self._dev(self._fmask0),
            self._dev(self._foff1), self._dev(self._fmask1),
        )

    def stream_cost(self):
        """XLA cost analysis of the whole fused-stream program
        (+ the separate finish program): ``{"flops": ..., "bytes":
        ...}`` summed over both compiled HLOs. Powers the MFU /
        %-of-peak report in ``bench.py`` — the compiler's own count of
        what the stream executes, not an analytic model."""
        core = self.core
        yB = self.yB_size
        facets = jax.ShapeDtypeStruct(
            (self.F_pad, yB, yB), core.dtype, sharding=self._shard
        )
        total = {"flops": 0.0, "bytes": 0.0}
        compiled_stream = self._stream.lower(
            *self._stream_args(facets)
        ).compile()
        acc_w = (core.yN_size if self.finish_mode == "post"
                 else yB)
        acc_pair = jax.ShapeDtypeStruct(
            (2, self.F_pad, core.yN_size + core.xM_yN_size, acc_w),
            core.real_dtype, sharding=self._pair_shard,
        )
        compiled_finish = self._finish_pair.lower(
            acc_pair, self._dev(self._foff0), self._dev(self._fmask0),
            self._dev(self._foff1), self._dev(self._fmask1),
        ).compile()
        for compiled in (compiled_stream, compiled_finish):
            ca = compiled.cost_analysis()
            if isinstance(ca, (list, tuple)):
                ca = ca[0] if ca else {}
            total["flops"] += float(ca.get("flops", 0.0))
            total["bytes"] += float(ca.get("bytes accessed", 0.0))
        return total

    # ------------------------------------------------- checkpointed stream

    @property
    def _pair_shard(self):
        from jax.sharding import NamedSharding

        return NamedSharding(self.mesh, P(None, TILE_AXIS))

    def zero_accumulator_pair(self):
        """Fresh f32 (re, im) accumulator pair, [2, F_pad, yN, yB],
        facet-sharded — the fused stream's carry layout."""
        if not hasattr(self, "_zeros_pair_fn"):
            acc_w = (self.core.yN_size if self.finish_mode == "post"
                     else self.yB_size)
            shape = (
                2, self.F_pad,
                self.core.yN_size + self.core.xM_yN_size, acc_w,
            )
            rdtype = self.core.real_dtype
            self._zeros_pair_fn = jax.jit(
                lambda: jnp.zeros(shape, dtype=rdtype),
                out_shardings=self._pair_shard,
            )
        return self._zeros_pair_fn()

    def stream_segment(self, BF_F, acc_pair, col_lo, col_hi):
        """Run columns [col_lo, col_hi) of the fused stream, returning the
        updated accumulator pair. Operator engine modes only. Segments of
        equal length share one compilation (offsets are traced)."""
        if not self._operator_mode:
            raise NotImplementedError(
                "stream_segment requires engine_mode matmul/pallas"
            )
        cols = tuple(a[col_lo:col_hi] for a in self._all_col_args())
        return self._stream_segment(
            BF_F,
            acc_pair,
            self._dev_c("A0", self._A0),
            self._dev_c("A1", self._A1),
            self._dev_c("Fi", self._Fi_xM, repl=True),
            self._dev_c("F", self._F_xM, repl=True),
            self._dev_c("E0", self._E0, repl=True),
            self._dev_c("E1", self._E1, repl=True),
            self._dev(self._foff1),
            self._dev_c("ph1", self._ph1),
            self._dev(self._foff1, repl=True),
            self._dev(self._fmask1, repl=True),
            cols,
        )

    def roundtrip_checkpointed(self, packed_facets, checkpointer,
                               segment=8):
        """Fused round trip with periodic checkpointing: the scan is
        chunked into ``segment``-column slices and the accumulator pair
        is saved after each — a preempted run resumes from the last
        completed segment (the fused-stream checkpointing the per-column
        driving loop cannot provide).

        :param checkpointer: :class:`..utils.checkpoint.StreamCheckpointer`
        :param segment: columns per checkpoint interval
        :return: ``(facets_out, n_subgrids)``
        """
        n = sum(len(c) for c in self.plan.configs)
        C = self.plan.n_columns
        BF_F = self.prepare_facets(packed_facets)
        acc_pair, start = checkpointer.resume_stream(self)
        ci = start
        while ci < C:
            hi = min(ci + segment, C)
            # equal-length segments share one compilation; the tail
            # segment compiles once more
            acc_pair = self.stream_segment(BF_F, acc_pair, ci, hi)
            acc_pair = checkpointer.step_stream(acc_pair, hi)
            ci = hi
        out = self._finish_pair(
            acc_pair, self._dev(self._foff0), self._dev(self._fmask0),
            self._dev(self._foff1), self._dev(self._fmask1),
        )
        return out, n
