"""Host-streamed SwiFTly engine: configs bigger than device memory.

The reference runs its largest configs by giving every Dask worker a
320-512 GiB *host* (reference slurm_scripts/run_distr_single_csd3.slurm)
— facet-scale state lives in host RAM and only tile-scale pieces move.
This engine is the TPU-native version of that regime, for catalogue
entries whose facet arrays exceed the mesh's aggregate HBM
(64k/128k-class, see :mod:`..utils.memory_plan`):

* ``BF_F`` (prepared facets, ``[F, yN, yB]``) and the backward facet
  accumulator live in **host memory** (complex64/128 numpy);
* the device only ever holds one column's working set: the ``[F, c, yB]``
  row block a column actually reads, the column-scale intermediates, and
  a batch chunk of subgrids — bounded regardless of N;
* per column, the host gathers the wrap-window row block (contiguous
  modulo yN, so it is two slices + a roll — O(c·yB), no full-array
  traffic), ships it through the float-pair transfer path, and
  scatter-adds the returned finished rows into the accumulator
  (complex128 by default — the host fold costs nothing extra in
  accuracy; ``accum_dtype=complex64`` halves its host RAM);
* facet prepare/finish (the only yN-scale axis-0 transforms) run on
  device in yB-column chunks, so their footprint is also bounded.

The column pipeline itself is the operator (MXU) formulation of the
sharded engine (:mod:`.distributed`), minus the collectives — on a
single chip. With ``mesh=`` the per-column device working set is
instead sharded over the mesh with the same collective pattern as
:class:`ShardedSwiftly` (facet-sharded contributions ``psum_scatter``
to subgrid shards forward, ``all_to_all`` back to facet shards
backward), so a pod divides both the column compute and the per-device
footprint while the facet-scale state stays in host RAM — the regime
the reference runs on its 512 GiB CSD3 nodes
(reference slurm_scripts/run_distr_single_csd3.slurm).

Reference parity: this makes the 64k/128k half of ``SWIFT_CONFIGS``
(reference swift_configs.py:30-40) *runnable* on TPU hardware, which the
reference only achieves with multi-hundred-GiB cluster nodes.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import operators as linop
from ..ops.core import (
    SwiftlyCore,
    extract_from_facet_fn,
    finish_facet_fn,
    finish_facet_mxu,
    prepare_facet_mxu,
    prepare_facet_op,
)
from ..utils.transfer import (
    get_complex,
    get_complex_local_shards,
    put_complex,
    put_complex_local,
)
from .distributed import (
    ColumnPlan,
    _all_to_all_c,
    _ceil_to,
    _psum_scatter_c,
)
from .mesh import TILE_AXIS, replicated_sharding, tile_sharding

__all__ = ["StreamedSwiftly"]


class StreamedSwiftly:
    """Single-device streaming engine with host-resident facet state.

    :param core: :class:`SwiftlyCore` (parameters + constants)
    :param facet_configs: list of FacetConfig (uniform ``size``)
    :param subgrid_configs: list of SubgridConfig (uniform ``size``)
    :param batch_chunk: subgrids per device dispatch within a column
        (auto: the whole column)
    :param prepare_chunk: yB-columns per facet prepare/finish dispatch
    :param precision: MXU precision for the operator contractions
    :param fft_impl: ``"mxu"``/``"xla"`` for the yN-scale transforms
        (same trade-off as :class:`ShardedSwiftly`)
    :param accum_dtype: host accumulator dtype — ``complex128``
        (default) or ``complex64`` (halves accumulator host RAM;
        equivalent at the engine's c64 working precision)
    """

    def __init__(self, core: SwiftlyCore, facet_configs, subgrid_configs,
                 batch_chunk=None, prepare_chunk=2048,
                 precision="highest", fft_impl="xla", mesh=None,
                 process_local=None, accum_dtype=None,
                 host_store_dir=None):
        # precision defaults to "highest" (6-pass bf16) here, unlike the
        # device-resident engine's "high": the host tier is
        # transfer-bound (the extra MXU passes are invisible next to
        # the per-column window shipping), and "high" measurably
        # corrupts the backward extraction sandwich at large-N scales —
        # at 128k[1]-n16k-1k the subgrid values sit at ~1/N^2 ~ 6e-11
        # and the 3-pass split's dropped terms left the accumulator
        # with ~20x excess energy on chip (facet RMSE 0.12-1.3 vs the
        # oracle; "highest" reproduces the CPU accumulator exactly —
        # measured 2026-08-20, /tmp/dbg_accum* methodology in
        # ROUND5_NOTES.md).
        self.core = core
        #: Optional directory for disk-backed host state: when set,
        #: ``BF_F`` and the accumulator are numpy memmaps
        #: (``<dir>/bf_f.npy`` / ``<dir>/accum.npy``) instead of RAM
        #: arrays — prepare writes them sequentially, the per-column
        #: gather/scatter reads/writes only each column's wrap-window
        #: rows, so the page cache keeps the hot set and host RSS stays
        #: bounded. This is what lets 64k-class full runs coexist with
        #: other host work on a 125 GiB box, and is one half of the
        #: 128k story (whose full facet state exceeds host RAM —
        #: reference only runs these on 320-512 GiB cluster nodes,
        #: reference slurm_scripts/run_distr_single_csd3.slurm).
        self.host_store_dir = host_store_dir
        self.precision = jax.lax.Precision(precision)
        #: Host accumulator dtype. Default complex128 (the host fold is
        #: free to be exact). complex64 halves the accumulator's host
        #: RAM — at 64k that is 53 vs 106 GiB — and costs nothing real
        #: when the device computes in complex64 anyway (each element
        #: receives only the 1-2 adds of overlapping column windows).
        self.accum_dtype = np.dtype(
            np.complex128 if accum_dtype is None else accum_dtype
        )
        if self.accum_dtype not in (np.dtype(np.complex64),
                                    np.dtype(np.complex128)):
            raise ValueError(f"Unknown accum_dtype: {accum_dtype}")
        if fft_impl not in ("xla", "mxu"):
            raise ValueError(f"Unknown fft_impl: {fft_impl}")
        # Same Mosaic workaround as ShardedSwiftly._build_programs
        # (still faults on jax 0.9.0; minimised repro passes);
        # SWIFTLY_FORCE_MXU_YN2048=1 bypasses it for on-chip bisection.
        if (fft_impl == "mxu" and core.yN_size == 2048
                and os.environ.get("SWIFTLY_FORCE_MXU_YN2048") != "1"):
            fft_impl = "xla"
        self.fft_impl = fft_impl
        #: Optional device mesh: shard the per-column device working set
        #: (facet-sharded contributions, psum_scatter/all_to_all
        #: redistribution — the ShardedSwiftly pattern) while facet
        #: state stays host-resident. ``None`` = single device.
        self.mesh = mesh
        self.n_devices = 1 if mesh is None else mesh.devices.size

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
            subgrid_configs, self.xA_size, n_devices=self.n_devices
        )
        B = self.plan.batch
        self.batch_chunk = min(batch_chunk or B, B)

        F = len(self.facet_configs)
        self.F = F
        # facet metadata padded to a mesh multiple (F_pad == F on a
        # single device); padded facets have zero masks and zero rows,
        # so they contribute nothing
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

        self.prepare_chunk = min(prepare_chunk, self.yB_size)

        #: Process-local host state: on a multi-process mesh each
        #: process keeps only *its* mesh-shard's facets' ``BF_F`` and
        #: accumulator rows in host RAM (the reference distributes its
        #: facet state the same way across 320-512 GiB workers,
        #: reference slurm_scripts/run_distr_single_astrolab.slurm) —
        #: at 128k the full facet state is ~190 GiB c64, which must not
        #: be replicated per process. Auto-on when the mesh spans
        #: multiple ``jax.distributed`` processes.
        if process_local is None:
            process_local = (
                mesh is not None and jax.process_count() > 1
            )
        self.process_local = bool(process_local) and mesh is not None
        #: padded-facet ids whose tile-shard device is addressable from
        #: this process, in shard order (== host-state row order)
        floc = self.F_pad // self.n_devices
        if self.process_local:
            local_devs = set(jax.local_devices())
            self._local_pad_fidx = [
                fi
                for d_idx, dev in enumerate(mesh.devices.flat)
                if dev in local_devs
                for fi in range(d_idx * floc, (d_idx + 1) * floc)
            ]
        else:
            self._local_pad_fidx = list(range(self.F_pad))
        #: real (non-padding) facet ids stored in this process's host
        #: state, and their row position in ``_BF_F``/``_accum``
        self._store_fidx = [
            fi for fi in self._local_pad_fidx if fi < F
        ]
        self._store_pos = {
            fi: k for k, fi in enumerate(self._store_fidx)
        }

        # Host state (allocated by prepare/zero_accumulator);
        # first dim = len(self._store_fidx) (== F unless process_local)
        self._BF_F = None  # [F_store, yN, yB] core-dtype numpy
        self._accum = None  # [F_store, yN, yB] accum_dtype numpy

        self._build_operators()
        self._build_programs()

    # ------------------------------------------------------------ operators

    def _build_operators(self):
        core = self.core
        N, xM, c = core.N, core.xM_size, core.xM_yN_size
        Fn = np.asarray(core._Fn, dtype=np.float64)
        self._A0 = np.stack([
            linop.add_to_subgrid_operator(N, xM, c, Fn, int(o))
            for o in self._foff0
        ])
        self._A1 = np.stack([
            linop.add_to_subgrid_operator(N, xM, c, Fn, int(o))
            for o in self._foff1
        ])
        self._E0 = np.stack([
            linop.extract_from_subgrid_operator(N, xM, c, Fn, int(o))
            for o in self._foff0
        ])
        self._E1 = np.stack([
            linop.extract_from_subgrid_operator(N, xM, c, Fn, int(o))
            for o in self._foff1
        ])
        self._Fi_xM = linop.shifted_idft_matrix(xM)
        self._F_xM = linop.shifted_dft_matrix(xM)
        self._dev_cache = {}

    def _dev_c(self, key, arr, sharding=None):
        if key not in self._dev_cache:
            self._dev_cache[key] = put_complex(
                arr, sharding, dtype=self.core.dtype
            )
        return self._dev_cache[key]

    # ------------------------------------------------------------- programs

    def _build_programs(self):
        core = self.core
        N, yN, xM = core.N, core.yN_size, core.xM_size
        c = core.xM_yN_size
        yB, xA = self.yB_size, self.xA_size
        Fb, Fn = core._Fb, core._Fn
        del Fn
        cdtype = core.dtype
        prec = self.precision

        if self.fft_impl == "mxu":
            prep_facet = prepare_facet_mxu
            fin_facet = finish_facet_mxu
        else:
            prep_facet = prepare_facet_op
            fin_facet = finish_facet_fn

        @jax.jit
        def prepare_cols(facet_cols, foff0):
            # [yB, chunk] -> [yN, chunk]: axis-0 facet prepare
            return prep_facet(facet_cols, foff0, 0, Fb, yN)

        @jax.jit
        def finish_cols(accum_cols, foff0, fmask0_cols):
            # [yN, chunk] -> [yB, chunk]: axis-0 facet finish + mask
            out = fin_facet(accum_cols, foff0, yB, 0, Fb)
            return out * fmask0_cols

        @jax.jit
        def column_prepare(rows_in, foff1):
            # rows_in [F, c, yB] -> NMBF_BF [F, c, yN] (axis-1 prepare)
            return jax.vmap(
                lambda r, o1: prep_facet(r, o1, 1, Fb, yN)
            )(rows_in, foff1)

        A0 = lambda: self._dev_c("A0", self._A0)
        A1 = lambda: self._dev_c("A1", self._A1)
        E0 = lambda: self._dev_c("E0", self._E0)
        E1 = lambda: self._dev_c("E1", self._E1)
        Fi = lambda: self._dev_c("Fi", self._Fi_xM)
        Fm = lambda: self._dev_c("F", self._F_xM)

        @jax.jit
        def fwd_chunk(NMBF_BF, A0, A1, Fi_xM, off0, sg_off1, valid,
                      mask0, mask1):
            # One batch chunk of the column: contributions -> subgrids.
            def per_sg(o1b):
                return jax.vmap(
                    lambda nb: extract_from_facet_fn(nb, o1b, 1, N, yN, c)
                )(NMBF_BF)

            X = jax.vmap(per_sg)(sg_off1)  # [b, F, c, c]
            partial = jnp.einsum(
                "fqk,bfkl,frl->bqr", A0, X, A1, precision=prec
            )
            base = xM // 2 - xA // 2 + jnp.arange(xA, dtype=jnp.int32)
            G0 = jnp.take(Fi_xM, (base + off0) % xM, axis=0)
            G1 = jax.vmap(
                lambda o1b: jnp.take(Fi_xM, (base + o1b) % xM, axis=0)
            )(sg_off1)
            sg = jnp.einsum(
                "qk,bkl,brl->bqr", G0, partial, G1, precision=prec
            )
            sg = sg * mask0[jnp.newaxis, :, jnp.newaxis]
            sg = sg * mask1[:, jnp.newaxis, :]
            return sg * valid[:, jnp.newaxis, jnp.newaxis].astype(cdtype)

        @jax.jit
        def bwd_chunk(sg, NAF_MNAF, E0, E1, F_xM, off0, sg_off1, valid):
            # One batch chunk: subgrids -> column accumulator fold.
            base = xM // 2 - xA // 2 + jnp.arange(xA, dtype=jnp.int32)
            P0 = jnp.take(F_xM, (base + off0) % xM, axis=1)
            P1 = jax.vmap(
                lambda o1b: jnp.take(F_xM, (base + o1b) % xM, axis=1)
            )(sg_off1)
            sgv = sg * valid[:, jnp.newaxis, jnp.newaxis].astype(cdtype)
            FS = jnp.einsum(
                "iq,bqr,bjr->bij", P0, sgv, P1, precision=prec
            )
            NAF_NAF = jnp.einsum(
                "fki,bij,flj->bfkl", E0, FS, E1, precision=prec
            )  # [b, F, c, c]

            s = jnp.floor_divide(sg_off1.astype(jnp.int32), N // yN)
            k = jnp.arange(c, dtype=jnp.int32)
            idx = (
                yN // 2 - c // 2
                + jnp.mod(k[jnp.newaxis, :] - s[:, jnp.newaxis], c)
                + s[:, jnp.newaxis]
            ) % yN  # [b, c]
            b = NAF_NAF.shape[0]
            xr = NAF_NAF.transpose(1, 2, 0, 3).reshape(self.F, c, b * c)
            return NAF_MNAF.at[:, :, idx.reshape(-1)].add(xr)

        @jax.jit
        def finish_column(NAF_MNAF, foff1, fmask1):
            # [F, c, yN] -> finished rows [F, c, yB] (axis-1 finish)
            out = jax.vmap(
                lambda a, o1: fin_facet(a, o1, yB, 1, Fb)
            )(NAF_MNAF, foff1)
            return out * fmask1[:, jnp.newaxis, :]

        self._prepare_cols = prepare_cols
        self._finish_cols = finish_cols
        self._column_prepare = column_prepare
        self._fwd_chunk = fwd_chunk
        self._bwd_chunk = bwd_chunk
        self._finish_column = finish_column
        self._A0d, self._A1d, self._E0d, self._E1d = A0, A1, E0, E1
        self._Fid, self._Fmd = Fi, Fm

        if self.mesh is None:
            return

        # ----- mesh-sharded column pipeline (ShardedSwiftly pattern):
        # rows facet-sharded in, one psum_scatter forward, one
        # all_to_all backward, finished rows facet-sharded out. The
        # whole column runs as a single compiled dispatch per column.
        mesh = self.mesh
        from jax.sharding import PartitionSpec as P

        def column_local(rows, A0l, A1l, E0f, E1f, Fi_xM, F_xM, foff1l,
                         fmask1l, off0, sg_off1, valid, mask0, mask1):
            # rows [Floc, c, yB] — this shard's facets' window rows
            NMBF_BF = jax.vmap(
                lambda r, o1: prep_facet(r, o1, 1, Fb, yN)
            )(rows, foff1l)  # [Floc, c, yN]

            def per_sg(o1b):
                return jax.vmap(
                    lambda nb: extract_from_facet_fn(nb, o1b, 1, N, yN, c)
                )(NMBF_BF)

            X = jax.vmap(per_sg)(sg_off1)  # [B_pad, Floc, c, c]
            partial = jnp.einsum(
                "fqk,bfkl,frl->bqr", A0l, X, A1l, precision=prec
            )  # [B_pad, xM, xM]
            summed = _psum_scatter_c(
                partial, TILE_AXIS, scatter_dimension=0,
                n=self.n_devices,
            )  # [Bloc, xM, xM]

            d = jax.lax.axis_index(TILE_AXIS)
            Bloc = summed.shape[0]
            my_off1 = jax.lax.dynamic_slice_in_dim(
                sg_off1, d * Bloc, Bloc)
            my_valid = jax.lax.dynamic_slice_in_dim(valid, d * Bloc, Bloc)
            my_mask1 = jax.lax.dynamic_slice_in_dim(mask1, d * Bloc, Bloc)

            base = xM // 2 - xA // 2 + jnp.arange(xA, dtype=jnp.int32)
            G0 = jnp.take(Fi_xM, (base + off0) % xM, axis=0)
            G1 = jax.vmap(
                lambda o1b: jnp.take(Fi_xM, (base + o1b) % xM, axis=0)
            )(my_off1)
            sg = jnp.einsum(
                "qk,bkl,brl->bqr", G0, summed, G1, precision=prec
            )
            sg = sg * mask0[jnp.newaxis, :, jnp.newaxis]
            sg = sg * my_mask1[:, jnp.newaxis, :]
            sg = sg * my_valid[:, jnp.newaxis, jnp.newaxis].astype(cdtype)

            # ---- backward
            P0 = jnp.take(F_xM, (base + off0) % xM, axis=1)
            P1 = jax.vmap(
                lambda o1b: jnp.take(F_xM, (base + o1b) % xM, axis=1)
            )(my_off1)
            FS = jnp.einsum(
                "iq,bqr,bjr->bij", P0, sg, P1, precision=prec
            )  # [Bloc, xM, xM]
            NAF_NAF = jnp.einsum(
                "fki,bij,flj->bfkl", E0f, FS, E1f, precision=prec
            )  # [Bloc, F_pad, c, c]
            x = _all_to_all_c(
                NAF_NAF, TILE_AXIS, split_axis=1, concat_axis=0,
                n=self.n_devices,
            )  # [B_pad, Floc, c, c]

            s = jnp.floor_divide(sg_off1.astype(jnp.int32), N // yN)
            k = jnp.arange(c, dtype=jnp.int32)
            idx = (
                yN // 2 - c // 2
                + jnp.mod(k[jnp.newaxis, :] - s[:, jnp.newaxis], c)
                + s[:, jnp.newaxis]
            ) % yN  # [B_pad, c]
            Bp = x.shape[0]
            xr = x.transpose(1, 2, 0, 3).reshape(-1, c, Bp * c)
            NAF_MNAF = jnp.zeros((x.shape[1], c, yN), dtype=cdtype)
            NAF_MNAF = NAF_MNAF.at[:, :, idx.reshape(-1)].add(xr)

            rows_out = jax.vmap(
                lambda a, o1: fin_facet(a, o1, yB, 1, Fb)
            )(NAF_MNAF, foff1l)
            rows_out = rows_out * fmask1l[:, jnp.newaxis, :]
            return sg, rows_out

        fsh = P(TILE_AXIS)
        rep = P()
        self._column_mesh = jax.jit(jax.shard_map(
            column_local,
            mesh=mesh,
            in_specs=(fsh, fsh, fsh, rep, rep, rep, rep, fsh, fsh,
                      rep, rep, rep, rep, rep),
            out_specs=(fsh, fsh),
        ))
        self._row_shard = tile_sharding(mesh)
        self._repl_shard = replicated_sharding(mesh)

    # --------------------------------------------------------- host helpers

    def _window_start(self, off0):
        core = self.core
        yN, c = core.yN_size, core.xM_yN_size
        s = int(off0) // (core.N // yN)
        return (yN // 2 - c // 2 + s) % yN, s

    def _gather_rows(self, off0):
        """Host-side ``extract_from_facet`` along axis 0: the wrap window
        is contiguous modulo yN (two slices) followed by a roll."""
        yN, c = self.core.yN_size, self.core.xM_yN_size
        start, s = self._window_start(off0)
        end = start + c
        if end <= yN:
            win = self._BF_F[:, start:end, :]
        else:
            win = np.concatenate(
                [self._BF_F[:, start:, :], self._BF_F[:, : end - yN, :]],
                axis=1,
            )
        return np.roll(win, s, axis=1)

    def _scatter_rows(self, off0, rows_out):
        """Host-side dual: fold finished rows into the accumulator at the
        column's wrap window (complex128 accumulation)."""
        yN, c = self.core.yN_size, self.core.xM_yN_size
        start, s = self._window_start(off0)
        win = np.roll(rows_out, -s, axis=1)
        end = start + c
        if end <= yN:
            self._accum[:, start:end, :] += win
        else:
            self._accum[:, start:, :] += win[:, : yN - start, :]
            self._accum[:, : end - yN, :] += win[:, yN - start :, :]

    # --------------------------------------------------------------- phases

    def prepare_facets(self, facet_arrays, start_facet=0,
                       on_facet_done=None):
        """Compute host-resident ``BF_F`` from per-facet host arrays,
        one yB-column chunk at a time on device.

        In process-local mode only this process's facets are prepared
        and stored; entries of ``facet_arrays`` for other processes'
        facets may be ``None``.

        :param start_facet: resume after a partial prepare — stored
            facets before this index are assumed present in the
            (reused) host store and are skipped
        :param on_facet_done: called with the store index after each
            facet's rows are written (checkpoint hook — callers persist
            a facet-granular progress marker so a killed multi-hour
            prepare resumes instead of restarting)
        """
        core = self.core
        yN, yB = core.yN_size, self.yB_size
        self._BF_F, reused = self._host_alloc(
            "bf_f", (len(self._store_fidx), yN, yB), core.dtype,
            reuse=start_facet > 0,
        )
        if start_facet > 0 and not reused:
            # The caller believes facets < start_facet are already in
            # the store, but the allocation came back fresh (RAM mode,
            # missing file, or shape/dtype mismatch) — skipping them
            # would leave silent zeros in BF_F.
            raise ValueError(
                f"start_facet={start_facet} but no existing host store "
                "was reused (host_store_dir unset, file missing, or "
                "shape/dtype changed) — resume would leave zero-filled "
                "facets; restart with start_facet=0"
            )
        for k, fi in enumerate(self._store_fidx):
            if k < start_facet:
                continue
            facet = facet_arrays[fi]
            if facet is None:
                raise ValueError(
                    f"facet {fi} is stored on this process but its "
                    "array is None"
                )
            off0 = jnp.asarray(self._foff0[fi], jnp.int32)
            for lo in range(0, yB, self.prepare_chunk):
                hi = min(lo + self.prepare_chunk, yB)
                cols = put_complex(
                    np.asarray(facet)[:, lo:hi], dtype=core.dtype
                )
                out = self._prepare_cols(cols, off0)
                self._BF_F[k, :, lo:hi] = get_complex(out)
            if on_facet_done is not None:
                if self.host_store_dir:
                    self._BF_F.flush()
                on_facet_done(k)

    def _host_alloc(self, name, shape, dtype, reuse=False):
        """Allocate a host-state array: RAM by default, a disk memmap
        under ``host_store_dir`` when set (fresh zero-filled, or the
        existing file when ``reuse`` — partial-prepare resume).

        :return: ``(array, reused)`` — ``reused`` is True only when an
            existing compatible store was actually reattached; callers
            resuming mid-state MUST check it (a silently fresh array
            would hold zeros where the caller assumes data).
        """
        if self.host_store_dir:
            os.makedirs(self.host_store_dir, exist_ok=True)
            path = os.path.join(self.host_store_dir, f"{name}.npy")
            if reuse and os.path.exists(path):
                mm = np.lib.format.open_memmap(path, mode="r+")
                if mm.shape == shape and mm.dtype == dtype:
                    return mm, True
            return np.lib.format.open_memmap(
                path, mode="w+", shape=shape, dtype=dtype
            ), False
        return np.zeros(shape, dtype=dtype), False

    def attach_host_state(self, bf_f=None, accum=None):
        """Adopt already-computed host state (e.g. a memmap reloaded
        from a previous session) in place of ``prepare_facets`` /
        ``zero_accumulator``. Shapes/dtypes are validated."""
        yN, yB = self.core.yN_size, self.yB_size
        shape = (len(self._store_fidx), yN, yB)
        if bf_f is not None:
            if bf_f.shape != shape or bf_f.dtype != self.core.dtype:
                raise ValueError(
                    f"BF_F mismatch: {bf_f.shape}/{bf_f.dtype} vs "
                    f"{shape}/{self.core.dtype}"
                )
            self._BF_F = bf_f
        if accum is not None:
            if accum.shape != shape or accum.dtype != self.accum_dtype:
                raise ValueError(
                    f"accum mismatch: {accum.shape}/{accum.dtype} vs "
                    f"{shape}/{self.accum_dtype}"
                )
            self._accum = accum

    def zero_accumulator(self):
        """Fresh host-side facet accumulator (``accum_dtype``)."""
        self._accum, _ = self._host_alloc(
            "accum",
            (len(self._store_fidx), self.core.yN_size, self.yB_size),
            self.accum_dtype,
        )

    def _col_args(self, ci, lo, hi):
        plan = self.plan
        rd = self.core.real_dtype
        return (
            jnp.asarray(plan.off0[ci], jnp.int32),
            jnp.asarray(plan.sg_off1[ci, lo:hi], jnp.int32),
            jnp.asarray(plan.valid[ci, lo:hi], rd),
            jnp.asarray(plan.mask0[ci], rd),
            jnp.asarray(plan.mask1[ci, lo:hi], rd),
        )

    def process_column(self, ci, collect_subgrids=False):
        """Forward+backward for one column: gather rows from host BF_F,
        run the column pipeline on device (batch-chunked), scatter
        finished rows into the host accumulator.

        :return: list of (SubgridConfig, host subgrid array) when
            ``collect_subgrids``, else None
        """
        if self.mesh is not None:
            return self._process_column_mesh(ci, collect_subgrids)

        core = self.core
        yN, c = core.yN_size, core.xM_yN_size
        B = self.plan.batch
        foff1 = jnp.asarray(self._foff1, jnp.int32)
        fmask1 = jnp.asarray(self._fmask1)

        rows_in = put_complex(self._gather_rows(self.plan.off0[ci]),
                              dtype=core.dtype)
        NMBF_BF = self._column_prepare(rows_in, foff1)

        # built inside a compiled program: eager complex-constant
        # creation implies a host transfer, which the axon TPU
        # attachment lacks (same workaround as
        # ShardedSwiftly.zero_accumulator)
        if not hasattr(self, "_col_zeros_fn"):
            self._col_zeros_fn = jax.jit(
                lambda: jnp.zeros((self.F, c, yN), dtype=core.dtype)
            )
        NAF_MNAF = self._col_zeros_fn()
        collected = [] if collect_subgrids else None
        for lo in range(0, B, self.batch_chunk):
            hi = min(lo + self.batch_chunk, B)
            off0, sg_off1, valid, mask0, mask1 = self._col_args(ci, lo, hi)
            sg = self._fwd_chunk(
                NMBF_BF, self._A0d(), self._A1d(), self._Fid(),
                off0, sg_off1, valid, mask0, mask1,
            )
            if collect_subgrids:
                cfgs = self.plan.configs[ci]
                host_sg = get_complex(sg)
                for bi in range(lo, min(hi, len(cfgs))):
                    collected.append((cfgs[bi], host_sg[bi - lo]))
            NAF_MNAF = self._bwd_chunk(
                sg, NAF_MNAF, self._E0d(), self._E1d(), self._Fmd(),
                off0, sg_off1, valid,
            )
        rows_out = self._finish_column(NAF_MNAF, foff1, fmask1)
        self._scatter_rows(self.plan.off0[ci], get_complex(rows_out))
        return collected

    def _process_column_mesh(self, ci, collect_subgrids=False):
        """Mesh-sharded :meth:`process_column`: the whole column —
        axis-1 prepare, forward contraction + ``psum_scatter``, finish,
        backward prepare + ``all_to_all`` + extraction + axis-1 finish
        — is one compiled sharded dispatch; the host only ships the
        ``[F, c, yB]`` window rows each way."""
        core = self.core
        c = core.xM_yN_size
        win = self._gather_rows(self.plan.off0[ci])  # [F_store, c, yB]
        if self.process_local:
            # each process contributes its padded-facet rows (zeros for
            # padding ids) and the global array is assembled shard-wise
            rows_local = np.zeros(
                (len(self._local_pad_fidx),) + win.shape[1:],
                dtype=win.dtype,
            )
            for k, fi in enumerate(self._local_pad_fidx):
                if fi < self.F:
                    rows_local[k] = win[self._store_pos[fi]]
            rows_in = put_complex_local(
                rows_local, self._row_shard, dtype=core.dtype
            )
        else:
            rows_host = win
            if self.F_pad != self.F:
                rows_host = np.concatenate([
                    rows_host,
                    np.zeros(
                        (self.F_pad - self.F,) + rows_host.shape[1:],
                        dtype=rows_host.dtype,
                    ),
                ])
            rows_in = put_complex(rows_host, self._row_shard,
                                  dtype=core.dtype)

        rd = core.real_dtype
        sg, rows_out = self._column_mesh(
            rows_in,
            self._dev_c("A0", self._A0, self._row_shard),
            self._dev_c("A1", self._A1, self._row_shard),
            self._dev_c("E0", self._E0, self._repl_shard),
            self._dev_c("E1", self._E1, self._repl_shard),
            self._dev_c("Fi", self._Fi_xM, self._repl_shard),
            self._dev_c("F", self._F_xM, self._repl_shard),
            jnp.asarray(self._foff1, jnp.int32),
            jnp.asarray(self._fmask1),
            jnp.asarray(self.plan.off0[ci], jnp.int32),
            jnp.asarray(self.plan.sg_off1[ci], jnp.int32),
            jnp.asarray(self.plan.valid[ci], rd),
            jnp.asarray(self.plan.mask0[ci], rd),
            jnp.asarray(self.plan.mask1[ci], rd),
        )
        collected = None
        if collect_subgrids:
            cfgs = self.plan.configs[ci]
            if self.process_local:
                # only this process's batch shards come home
                collected = []
                for index, data in get_complex_local_shards(sg):
                    b0 = index[0].start or 0
                    for bi in range(b0, min(b0 + data.shape[0],
                                            len(cfgs))):
                        collected.append((cfgs[bi], data[bi - b0]))
            else:
                host_sg = get_complex(sg)
                collected = [
                    (cfgs[bi], host_sg[bi]) for bi in range(len(cfgs))
                ]
        if self.process_local:
            win_out = np.zeros_like(win)
            for index, data in get_complex_local_shards(rows_out):
                f0 = index[0].start or 0
                for k in range(data.shape[0]):
                    fi = f0 + k
                    if fi < self.F:
                        win_out[self._store_pos[fi]] = data[k]
            self._scatter_rows(self.plan.off0[ci], win_out)
        else:
            self._scatter_rows(
                self.plan.off0[ci], get_complex(rows_out)[: self.F]
            )
        return collected

    def finish_facet(self, fi):
        """Finish ONE facet from the host accumulator (device axis-0
        transform, yB-column chunks) and return its ``[yB, yB]`` host
        array.

        At 64k/128k scale the full list of finished facets does not fit
        host RAM next to the accumulator — callers stream facets one at
        a time (validate/free each before the next;
        scripts/hosttier_64k.py does this for the complete-run RMSE).

        :param fi: global facet index; must be stored on this process
        """
        core = self.core
        yB = self.yB_size
        k = list(self._store_fidx).index(fi)
        facet = np.zeros((yB, yB), dtype=core.dtype)
        off0 = jnp.asarray(self._foff0[fi], jnp.int32)
        for lo in range(0, yB, self.prepare_chunk):
            hi = min(lo + self.prepare_chunk, yB)
            cols = put_complex(
                self._accum[k, :, lo:hi], dtype=core.dtype
            )
            m0 = jnp.asarray(
                self._fmask0[fi, :, np.newaxis]
            ).astype(core.real_dtype)
            res = self._finish_cols(cols, off0, m0)
            facet[:, lo:hi] = get_complex(res)
        return facet

    def finish_facets(self):
        """Finish the host accumulator into per-facet arrays
        (device axis-0 transform, yB-column chunks).

        :return: list of length ``F`` — in process-local mode entries
            for facets stored on other processes are ``None``
        """
        out = [None] * self.F
        for fi in self._store_fidx:
            out[fi] = self.finish_facet(fi)
        return out

    def _fingerprint(self):
        core = self.core
        fp = {
            "N": core.N, "yN_size": core.yN_size,
            "xM_size": core.xM_size, "W": core.W, "F": self.F,
            "n_columns": self.plan.n_columns, "tier": "host",
        }
        if self.process_local:
            fp["process"] = jax.process_index()
            fp["n_processes"] = jax.process_count()
        if self.accum_dtype != np.dtype(np.complex128):
            # non-default only, so pre-existing checkpoints stay valid
            fp["accum_dtype"] = self.accum_dtype.name
        return fp

    def roundtrip(self, facet_arrays, checkpoint=None,
                  checkpoint_every=8, stop_after_columns=None):
        """Full streaming round trip through the host tier.

        The host accumulator plus the next column index is the tier's
        entire mutable state, so a ``checkpoint`` path makes the
        (days-long at 128k) column loop resumable: an existing matching
        checkpoint resumes mid-stream (``prepare_facets`` is re-run —
        deterministic and minutes-scale, so ``BF_F`` is not saved);
        ``stop_after_columns`` bounds one invocation's work and returns
        ``(None, columns_done)`` when the stream is left unfinished.

        :return: ``(facets_out, n_subgrids)`` — host numpy arrays —
            or ``(None, columns_done)`` when stopped early
        """
        import os as _os

        from ..utils.checkpoint import (
            input_digest,
            load_checkpoint,
            save_checkpoint,
        )

        if checkpoint and self.process_local:
            # each process checkpoints its own accumulator rows
            checkpoint = f"{checkpoint}.p{jax.process_index()}"
        self.prepare_facets(facet_arrays)
        digest = (
            input_digest([facet_arrays[fi] for fi in self._store_fidx])
            if checkpoint else None
        )
        start = 0
        if checkpoint and _os.path.exists(checkpoint):
            arrays, meta = load_checkpoint(checkpoint)
            if (meta.get("fingerprint") == self._fingerprint()
                    and meta.get("input_digest") == digest):
                self._accum = np.asarray(
                    arrays["accum"], dtype=self.accum_dtype
                )
                start = int(meta["next_column"])
        if self.process_local and checkpoint:
            # The column loop is SPMD — every process must resume at
            # the same column or the collectives deadlock. If any
            # process's checkpoint is missing/stale, ALL restart clean
            # (partial credit would double-add the laggard's columns).
            from jax.experimental import multihost_utils

            starts = multihost_utils.process_allgather(
                np.int32(start)
            )
            if int(starts.min()) != int(starts.max()):
                start = 0
        if start == 0:
            self.zero_accumulator()

        def save(done):
            save_checkpoint(
                checkpoint,
                {"accum": self._accum},
                {"next_column": done,
                 "fingerprint": self._fingerprint(),
                 "input_digest": digest},
            )

        n_cols = self.plan.n_columns
        for ci in range(start, n_cols):
            self.process_column(ci)
            done = ci + 1
            if checkpoint and (
                done % checkpoint_every == 0 or done == n_cols
            ):
                save(done)
            if (stop_after_columns is not None
                    and done - start >= stop_after_columns
                    and done < n_cols):
                if checkpoint and done % checkpoint_every:
                    save(done)
                return None, done
        self._BF_F = None  # release before finish
        n = sum(len(cfgs) for cfgs in self.plan.configs)
        return self.finish_facets(), n
