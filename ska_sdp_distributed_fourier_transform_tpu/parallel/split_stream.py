"""Split-precision (double-f32) streaming engine: the ``--precision
split`` tier.

Runs the full facet->subgrid->facet round trip with every value carried
as an (hi, lo) f32 pair and every contraction computed by the exact
integer-chunked MXU matmul (:mod:`..ops.split_precision`) — f64-class
accuracy (~1e-10 round trip) on hardware whose fast paths are bf16/f32.
The reference only reaches its 3e-10 bound in complex128 on CPU
(reference tests/test_api.py:125); the TPU-native answer is not to
emulate f64 scalar arithmetic (XLA's f64-on-TPU is orders of magnitude
slow) but to restructure the pipeline so all precision-critical work is
*exact integer MXU arithmetic*:

* facet-offset phases, window vectors and operator matrices are static
  — precomputed in f64 on host and split exactly into (hi, lo) pairs;
* traced subgrid offsets only ever enter through gathers and
  dynamic-slice folds — exact data movement;
* the yN-scale transforms are four-step factor matmuls in chunked
  arithmetic (:func:`..ops.split_precision.df_fft_mxu`);
* the contribution/finish sandwiches are chunked complex matmuls.

Single-device engine (the accuracy tier targets 2k-8k configs whose
split working set fits one chip); the c64 sharded engine remains the
throughput path.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import operators as linop
from ..ops.pallas_split import (
    dfc_matmul,
    df_fft_pallas,
    gather_prechunked_rows,
    prechunk_const,
)
from ..ops.primitives import pad_mid
from ..ops.split_precision import (
    cdf_from_c128,
    cdf_to_c128,
    df_add,
    df_cmul,
    df_fft_mxu,
    df_from_f64,
    df_matmul,
)
from .distributed import ColumnPlan, _varying_zeros
from .mesh import TILE_AXIS

__all__ = ["SplitSwiftly"]


from ..ops.pallas_kernels import _is_tpu


def _cdf_map(fn, x):
    """Apply a plane-wise jnp op to a complex df32 4-tuple."""
    return tuple(fn(p) for p in x)


def _cdf_add(x, y):
    re = df_add((x[0], x[1]), (y[0], y[1]))
    im = df_add((x[2], x[3]), (y[2], y[3]))
    return re + im


def _left_mm(Fc, x, keep=3, n_chunks=4):
    """Constant complex df32 matrix times batched cdf: contract the
    second-to-last axis of ``x``: out[..., p, r] = sum_q F[p,q] x[..., q, r].
    """
    from ..ops.split_precision import _left_cmatmul

    return _left_cmatmul(Fc, x, keep=keep, n_chunks=n_chunks)


def _right_mm(x, Fc_t, keep=3, n_chunks=4):
    """Batched cdf times a constant: out[..., m, p] = sum_q x[..., m, q]
    F_t[q, p] (pass the constant already transposed)."""
    lead = x[0].shape[:-1]
    Q = x[0].shape[-1]
    xf = tuple(p.reshape(-1, Q) for p in x)
    from ..ops.split_precision import df_cmatmul

    of = df_cmatmul(xf, Fc_t, keep=keep, n_chunks=n_chunks)
    P = Fc_t[0].shape[-1]
    return tuple(p.reshape(lead + (P,)) for p in of)


def _pair_cmatmul(a, b, keep=3, n_chunks=4):
    """Batched cdf @ cdf matmul (both batched identically)."""
    from ..ops.split_precision import df_cmatmul

    return df_cmatmul(a, b, keep=keep, n_chunks=n_chunks)


def _cdf_sum0(x):
    """Sum a cdf over axis 0 with pairwise df32 reduction (vectorised
    two-sum halving — log2(F) steps, no per-facet unrolled graph)."""
    from ..ops.split_precision import _two_sum

    def red(h, l):
        while h.shape[0] > 1:
            n = h.shape[0]
            m = n // 2
            s, e = _two_sum(h[:m], h[m : 2 * m])
            l2 = l[:m] + l[m : 2 * m] + e
            if n % 2:
                s = jnp.concatenate([s, h[2 * m :]])
                l2 = jnp.concatenate([l2, l[2 * m :]])
            h, l = s, l2
        return h[0], l[0]

    rh, rl = red(x[0], x[1])
    ih, il = red(x[2], x[3])
    return (rh, rl, ih, il)


def _wrap_take_planes(x, start, size, axis):
    n = x[0].shape[axis]
    idx = jnp.mod(start + jnp.arange(size), n)
    return tuple(jnp.take(p, idx, axis=axis) for p in x)


class SplitSwiftly:
    """Single-device split-precision round-trip engine.

    :param core: :class:`..ops.core.SwiftlyCore` (its dtype is ignored —
        all math here is df32)
    :param facet_configs: uniform-size facet cover
    :param subgrid_configs: uniform-size subgrid cover
    """

    def __init__(self, core, facet_configs, subgrid_configs,
                 keep=5, n_chunks=6, kernel=None, mesh=None):
        #: n_chunks bounds the operand representation (7 bits/chunk,
        #: error ~2^-7*n_chunks of the matrix max); keep bounds the
        #: chunk-pair diagonals computed — dropped diagonals contribute
        #: ~sqrt(K)*2^-7(keep+1) relative (chunk values reach 2^7, so a
        #: diagonal's magnitude is 2^-7d, not 2^-7(d+2)). The default
        #: keep=5/n_chunks=6 measures ~7e-12 per matmul at K=192 with 21
        #: bf16 dots per real product (2.3x the default engine's 9);
        #: keep=6/n_chunks=7 is full double-float (~1e-12) at 28 dots.
        self.keep = keep
        self.n_chunks = n_chunks
        #: ``kernel="pallas"`` computes every contraction with the
        #: fused chunk+dot+combine Pallas kernel
        #: (:mod:`..ops.pallas_split`) — same accuracy class, a
        #: fraction of the runtime of the XLA formulation ("xla").
        #: ``None`` auto-selects "pallas" on TPU (override with
        #: SWIFTLY_SPLIT_KERNEL).
        explicit_kernel = kernel is not None
        if kernel is None:
            # auto: the fused Pallas kernel on real TPU hardware —
            # measured green on chip 2026-08-18 (BENCH_SWEEP_r03.jsonl:
            # 4k 195.9 sg/s @ 5.46e-11, 8k 164.0 @ 1.90e-11 — 2.6x the
            # XLA formulation at identical accuracy class); the XLA
            # formulation elsewhere (CPU, or non-default truncation).
            kernel = os.environ.get(
                "SWIFTLY_SPLIT_KERNEL",
                "pallas" if _is_tpu() else "xla",
            )
            if kernel == "pallas" and not (
                    _is_tpu() and (keep, n_chunks) == (5, 6)):
                kernel = "xla"
        if kernel not in ("pallas", "xla"):
            raise ValueError(f"Unknown kernel: {kernel}")
        if kernel == "pallas" and (keep, n_chunks) != (5, 6):
            raise ValueError(
                "kernel='pallas' uses a fixed 42-bit truncation and "
                "ignores keep/n_chunks; use kernel='xla' to vary them"
            )
        self.kernel = kernel
        #: Optional device mesh: shard the stream over facets/batch
        #: with the same collective pattern as :class:`ShardedSwiftly`,
        #: keeping the f64-class accuracy — the cross-device facet
        #: reduction runs as an all_gather plus an exact two-sum
        #: ladder, and the backward redistribution is pure data
        #: movement. The reference only reaches complex128 accuracy at
        #: cluster scale on big-memory CPU nodes; this gives the same
        #: at pod scale. Works with both kernels: the fused-kernel
        #: mode shards its facet-leading pre-chunked operands with the
        #: facets (chunk scales are global powers of two, so local
        #: shards stay exact).
        self.mesh = mesh
        self.n_devices = 1 if mesh is None else mesh.devices.size
        self.core = core
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
        self.F = len(self.facet_configs)
        #: facet count padded to a mesh multiple; padded facets carry
        #: zero masks and zero input, so they contribute exact zeros
        self.F_pad = -(-self.F // self.n_devices) * self.n_devices
        if self.kernel == "pallas":
            # the fused kernel keeps the contraction depth untiled in
            # its VMEM chunk scratch — large-xM configs don't fit
            from ..ops.pallas_split import dfc_fits_vmem

            xM, c = core.xM_size, core.xM_yN_size
            xA, B, Fp = self.xA_size, self.plan.batch, self.F_pad
            # post-redistribution stages see only this shard's batch
            Bl = B // self.n_devices
            calls = [
                (xM, c, B * c, "left"),        # contribution (A0)
                (B * xM, c, xM, "right"),      # contribution (A1t)
                (xA, xM, xM, "left"),          # finish (Fi rows)
                (xA, xM, xA, "right"),
                (xM, xA, xA, "left"),          # backward prepare (Fm)
                (xM, xA, xM, "right"),
                (Fp * c, xM, Bl * xM, "left"),  # extraction (E0)
                (Bl * c, xM, c, "right"),      # extraction (E1t)
            ]
            if not all(dfc_fits_vmem(*s) for s in calls):
                if explicit_kernel:
                    raise ValueError(
                        f"kernel='pallas' does not fit VMEM at "
                        f"xM={xM} (the chunk scratch holds the full "
                        "contraction depth); use kernel='xla'"
                    )
                self.kernel = "xla"
        self._build_constants()
        # Warm the split-FFT constant caches OUTSIDE any trace: the
        # lru_cache'd device constants must not be born inside the scan
        # trace (tracer leak).
        from ..ops.pallas_split import _df_fft_consts_pc
        from ..ops.split_precision import _df_fft_consts

        warm = (_df_fft_consts_pc if self.kernel == "pallas"
                else _df_fft_consts)
        for inverse in (True, False):
            if warm(core.yN_size, inverse) is None:
                raise ValueError(
                    f"yN={core.yN_size} has no four-step factorisation"
                )

    def _fft(self, x_cdf, inverse):
        if self.kernel == "pallas":
            return df_fft_pallas(x_cdf, inverse=inverse)
        return df_fft_mxu(x_cdf, inverse=inverse, keep=self.keep,
                          n_chunks=self.n_chunks)

    # ----------------------------------------------------------- constants

    def _build_constants(self):
        core = self.core
        N, yN, xM, c = core.N, core.yN_size, core.xM_size, core.xM_yN_size
        yB = self.yB_size
        F = self.F_pad  # padded facets: off 0, mask 0 -> exact zeros
        foff0 = np.zeros(F, dtype=np.int64)
        foff1 = np.zeros(F, dtype=np.int64)
        for i, cfg in enumerate(self.facet_configs):
            foff0[i] = cfg.off0
            foff1[i] = cfg.off1
        self._foff0 = jnp.asarray(foff0, jnp.int32)
        self._foff1 = jnp.asarray(foff1, jnp.int32)

        # facet masks (0/1 — exact in f32)
        m0 = np.zeros((F, yB))
        m1 = np.zeros((F, yB))
        for i, cfg in enumerate(self.facet_configs):
            m0[i] = 1.0 if cfg.mask0 is None else np.asarray(cfg.mask0)
            m1[i] = 1.0 if cfg.mask1 is None else np.asarray(cfg.mask1)
        self._fmask0 = jnp.asarray(m0, jnp.float32)
        self._fmask1 = jnp.asarray(m1, jnp.float32)

        # window vectors (f64 -> exact df pairs)
        pswf_Fb = np.asarray(core._Fb, dtype=np.float64)
        lo = (yN - 1) // 2 - yB // 2
        self._Fb_yB = df_from_f64(pswf_Fb[lo : lo + yB])

        # image-space phase vectors for the static facet offsets
        j0 = np.arange(yN) - yN // 2
        self._phase0 = cdf_from_c128(
            np.exp(2j * np.pi / yN * np.outer(foff0, j0))
        )  # [F, yN]
        self._phase1 = cdf_from_c128(
            np.exp(2j * np.pi / yN * np.outer(foff1, j0))
        )  # [F, yN]

        # operator matrices (host f64, exact split)
        Fn = np.asarray(core._Fn, dtype=np.float64)
        A0 = np.stack([
            linop.add_to_subgrid_operator(N, xM, c, Fn, int(o))
            for o in foff0
        ])  # [F, xM, c]
        A1t = np.stack([
            linop.add_to_subgrid_operator(N, xM, c, Fn, int(o)).T
            for o in foff1
        ])  # [F, c, xM]
        E0 = np.stack([
            linop.extract_from_subgrid_operator(N, xM, c, Fn, int(o))
            for o in foff0
        ])  # [F, c, xM]
        E1t = np.stack([
            linop.extract_from_subgrid_operator(N, xM, c, Fn, int(o)).T
            for o in foff1
        ])  # [F, xM, c]
        Fi = linop.shifted_idft_matrix(xM)
        Fm = linop.shifted_dft_matrix(xM)
        self._A0 = cdf_from_c128(A0)
        self._A1t = cdf_from_c128(A1t)
        self._E0 = cdf_from_c128(E0)
        self._E1t = cdf_from_c128(E1t)
        self._Fi = cdf_from_c128(Fi)
        self._Fm = cdf_from_c128(Fm)
        if self.kernel == "pallas":
            # pre-chunked forms for the fused kernel (K = the
            # contraction depth each operand is used with)
            xA = self.xA_size
            self._A0_pc = prechunk_const(A0, K=c)  # left, [F,m,xM,c]
            self._A1t_pc = prechunk_const(A1t, K=c)  # right
            self._E0all_pc = prechunk_const(
                E0.reshape(1, F * c, xM), K=xM
            )  # left, G=1
            self._E1t_pc = prechunk_const(E1t, K=xM)  # right
            # DFT matrices kept whole for runtime row gathers:
            # Fi rows feed the finish sandwich (contraction over xM);
            # Fm columns feed the prepare sandwich (contraction over
            # xA) — stored transposed so gathers are row gathers.
            self._Fi_pc = prechunk_const(Fi, K=xM)
            self._FmT_pc = prechunk_const(
                np.ascontiguousarray(Fm.T), K=xA
            )

        # static per-facet wrap-window gather indices for the finishes
        base = np.arange(yB)
        self._fin1_idx = jnp.asarray(
            (yN // 2 - yB // 2 + foff1[:, None] + base[None, :]) % yN,
            jnp.int32,
        )  # [F, yB]
        self._fin0_idx = jnp.asarray(
            (yN // 2 - yB // 2 + foff0[:, None] + base[None, :]) % yN,
            jnp.int32,
        )  # [F, yB]

    def _fsh(self):
        """The facet-leading constants as one pytree — passed through
        the stream program so the mesh mode can shard them (axis 0)
        while everything else is closure-captured replicated."""
        out = {
            "A0": self._A0, "A1t": self._A1t,
            "ph0": self._phase0, "ph1": self._phase1,
            "fin0": self._fin0_idx, "fin1": self._fin1_idx,
            "m0": self._fmask0, "m1": self._fmask1,
        }
        if self.kernel == "pallas":
            # fused-kernel mode: the facet-leading pre-chunked operand
            # planes ([F, m, R, C] bf16) travel with the facets so the
            # mesh mode shards them; the power-of-two scales are global
            # and stay static (local shards remain exact under them)
            out["A0pc"] = (self._A0_pc.crr, self._A0_pc.cii,
                           self._A0_pc.css)
            out["A1tpc"] = (self._A1t_pc.crr, self._A1t_pc.cii,
                            self._A1t_pc.css)
        return out

    def _col_args(self, ci):
        plan = self.plan
        return (
            jnp.asarray(plan.off0[ci], jnp.int32),
            jnp.asarray(plan.sg_off1[ci], jnp.int32),
            jnp.asarray(plan.valid[ci], jnp.float32),
            jnp.asarray(plan.mask0[ci], jnp.float32),
            jnp.asarray(plan.mask1[ci], jnp.float32),
            jnp.asarray(self._fold_targets()[ci], jnp.int32),
        )

    def _fold_targets(self):
        """Host-precomputed duplicate-free scatter targets for the
        column fold: [C, B, c] indices into a [2, yN + 1] slot buffer
        (slot = coverage order of the row, <= 2 for every config;
        invalid batch entries land on the shared trash row — their
        values are exact zeros)."""
        if getattr(self, "_fold_targets_cache", None) is not None:
            return self._fold_targets_cache
        plan = self.plan
        core = self.core
        yN, c = core.yN_size, core.xM_yN_size
        N = core.N
        yNp = yN + 1
        C, B = plan.sg_off1.shape
        out = np.zeros((C, B, c), dtype=np.int32)
        k = np.arange(c)
        for ci in range(C):
            count = np.zeros(yN, dtype=np.int32)
            for b in range(B):
                if plan.valid[ci, b] == 0:
                    out[ci, b] = yN  # trash row in slot 0
                    continue
                s1 = int(plan.sg_off1[ci, b]) // (N // yN)
                idx = (yN // 2 - c // 2 + (k - s1) % c + s1) % yN
                slot = count[idx]
                if slot.max() > 1:
                    raise AssertionError(
                        "column window multiplicity > 2"
                    )
                out[ci, b] = slot * yNp + idx
                count[idx] += 1
        self._fold_targets_cache = out
        return out

    # ------------------------------------------------------------ pipeline

    def _prepare(self, facets_cdf, Cf):
        """[F, yB, yB] cdf -> BF_F [F, yN, yB] cdf (axis-0 prepare,
        batched over facets — a single transform graph)."""
        from ..ops.split_precision import df_mul

        core = self.core
        yN = core.yN_size
        fb = self._Fb_yB
        fbb = (fb[0][None, :, None], fb[1][None, :, None])
        wre = df_mul((facets_cdf[0], facets_cdf[1]), fbb)
        wim = df_mul((facets_cdf[2], facets_cdf[3]), fbb)
        win = wre + wim  # [F, yB, yB]
        padded = tuple(pad_mid(p, yN, 1) for p in win)  # [F, yN, yB]
        moved = tuple(jnp.swapaxes(p, 1, 2) for p in padded)  # [F,yB,yN]
        tr = self._fft(moved, True)
        ph = tuple(p[:, None, :] for p in Cf["ph0"])  # [F, 1, yN]
        tr = df_cmul(tr, tuple(jnp.broadcast_to(p, tr[0].shape)
                               for p in ph))
        return tuple(jnp.swapaxes(p, 1, 2) for p in tr)  # [F, yN, yB]

    def _column(self, BF_F, acc, col, Cf):
        """One column: forward to subgrids, backward into the padded
        accumulator. All arrays are cdf 4-tuples of f32 planes.

        With a mesh, facet-leading arrays (``BF_F``, ``Cf``, ``acc``)
        are this shard's local slices; the facet sum crosses the mesh
        as an all_gather + exact two-sum ladder and the backward
        contributions return to their facet shards via all_to_all
        (pure data movement).
        """
        core = self.core
        N, yN, xM, c = core.N, core.yN_size, core.xM_size, core.xM_yN_size
        yB, xA = self.yB_size, self.xA_size
        off0, sg_off1, valid, mask0, mask1 = col[:5]

        # --- extract rows (axis 0) at off0: wrap window + roll ---------
        s0 = jnp.floor_divide(off0, N // yN)
        start0 = yN // 2 - c // 2 + s0
        rows = _wrap_take_planes(BF_F, start0, c, axis=1)  # [F, c, yB]
        rows = tuple(jnp.roll(p, s0, axis=1) for p in rows)

        # --- prepare axis 1: window Fb, pad to yN, ifft, static phase --
        from ..ops.split_precision import df_mul

        fb = self._Fb_yB
        wre = df_mul((rows[0], rows[1]), (fb[0][None, None, :],
                                          fb[1][None, None, :]))
        wim = df_mul((rows[2], rows[3]), (fb[0][None, None, :],
                                          fb[1][None, None, :]))
        win = wre + wim
        padded = tuple(pad_mid(p, yN, 2) for p in win)  # [F, c, yN]
        NMBF_BF = self._fft(padded, True)
        ph1 = tuple(p[:, None, :] for p in Cf["ph1"])
        NMBF_BF = df_cmul(
            NMBF_BF,
            tuple(jnp.broadcast_to(p, NMBF_BF[0].shape) for p in ph1),
        )

        # --- per-subgrid extraction (axis 2 windows) -------------------
        s1 = jnp.floor_divide(sg_off1, N // yN)  # [B]

        def window_b(s1b):
            w = _wrap_take_planes(
                NMBF_BF, yN // 2 - c // 2 + s1b, c, axis=2
            )
            return tuple(jnp.roll(p, s1b, axis=2) for p in w)

        X = jax.vmap(window_b)(s1)  # planes [B, F, c, c]

        # --- contribution sandwich, summed over facets -----------------
        # batched over F (one vmapped matmul graph, not F unrolled ones)
        B = X[0].shape[0]
        F = X[0].shape[1]  # local facets (F_pad, or Floc on a mesh)
        Xf = tuple(
            p.transpose(1, 2, 0, 3).reshape(F, c, B * c) for p in X
        )
        if self.kernel == "pallas":
            A0pc = self._A0_pc._replace(
                crr=Cf["A0pc"][0], cii=Cf["A0pc"][1], css=Cf["A0pc"][2]
            )
            T = dfc_matmul(Xf, A0pc, "left")  # [F, xM, B*c]
        else:
            T = _pair_cmatmul(Cf["A0"], Xf, self.keep, self.n_chunks)
        Tv = tuple(
            p.reshape(F, xM, B, c).transpose(0, 2, 1, 3)
            .reshape(F, B * xM, c)
            for p in T
        )
        if self.kernel == "pallas":
            A1tpc = self._A1t_pc._replace(
                crr=Cf["A1tpc"][0], cii=Cf["A1tpc"][1],
                css=Cf["A1tpc"][2],
            )
            S = dfc_matmul(Tv, A1tpc, "right")  # [F, B*xM, xM]
        else:
            S = _pair_cmatmul(Tv, Cf["A1t"], self.keep, self.n_chunks)
        Sv = tuple(p.reshape(F, B, xM, xM) for p in S)
        summed = _cdf_sum0(Sv)  # [B, xM, xM] (local-facet sum)

        if self.mesh is not None:
            # exact cross-shard facet reduction: exchange batch slices
            # (all_to_all — each shard receives every shard's partial
            # for ITS Bloc subgrids only) and combine with a true df32
            # two-sum ladder; a plain psum would round the hi planes,
            # and an all_gather would materialise n copies of the full
            # batch on every device
            n = self.n_devices
            Bloc = B // n
            parts = tuple(
                jax.lax.all_to_all(
                    p, TILE_AXIS, split_axis=0, concat_axis=0,
                    tiled=True,
                ).reshape((n, Bloc) + p.shape[1:])
                for p in summed
            )  # [n, Bloc, xM, xM] per plane, indexed by source shard
            total = tuple(p[0] for p in parts)
            for i in range(1, n):
                total = _cdf_add(total, tuple(p[i] for p in parts))
            summed = total
            d = jax.lax.axis_index(TILE_AXIS)
            my_off1 = jax.lax.dynamic_slice_in_dim(
                sg_off1, d * Bloc, Bloc)
            my_valid = jax.lax.dynamic_slice_in_dim(
                valid, d * Bloc, Bloc)
            my_mask1 = jax.lax.dynamic_slice_in_dim(
                mask1, d * Bloc, Bloc)
        else:
            my_off1, my_valid, my_mask1 = sg_off1, valid, mask1

        # --- finish sandwich -> subgrids -------------------------------
        base = xM // 2 - xA // 2 + jnp.arange(xA, dtype=jnp.int32)
        g0_rows = (base + off0) % xM
        g1_rows = (base[None, :] + my_off1[:, None]) % xM  # [Bloc, xA]
        if self.kernel == "pallas":
            G0pc = gather_prechunked_rows(self._Fi_pc, g0_rows)
            T = dfc_matmul(summed, G0pc, "left")  # [B, xA, xM]
            G1tpc = gather_prechunked_rows(
                self._Fi_pc, g1_rows, transpose=True
            )  # [B, m, xM, xA]
            sg = dfc_matmul(T, G1tpc, "right")  # [B, xA, xA]
        else:
            G0 = tuple(jnp.take(p, g0_rows, axis=0) for p in self._Fi)
            G1t = tuple(
                jnp.take(p, g1_rows, axis=0).transpose(0, 2, 1)
                for p in self._Fi
            )  # [B, xM, xA]
            T = _left_mm(G0, summed, self.keep, self.n_chunks)
            sg = _pair_cmatmul(T, G1t, self.keep, self.n_chunks)
        m = (mask0[None, :, None] * my_mask1[:, None, :]
             * my_valid[:, None, None])
        sg = tuple(p * m for p in sg)

        # --- backward: prepare sandwich --------------------------------
        if self.kernel == "pallas":
            # P0 = Fm[:, g0_rows] == (FmT[g0_rows, :])^T
            P0pc = gather_prechunked_rows(
                self._FmT_pc, g0_rows, transpose=True
            )  # [1, m, xM, xA] — left, contraction over xA
            T = dfc_matmul(sg, P0pc, "left")  # [B, xM, xA]
            P1tpc = gather_prechunked_rows(
                self._FmT_pc, g1_rows
            )  # [B, m, xA, xM] — right
            FS = dfc_matmul(T, P1tpc, "right")  # [B, xM, xM]
        else:
            P0 = tuple(jnp.take(p, g0_rows, axis=1) for p in self._Fm)
            # P1^T[b] = F_xM[:, rows_b]^T  -> [B, xA, xM]
            P1t = tuple(
                jnp.take(p, g1_rows, axis=1).transpose(1, 2, 0)
                for p in self._Fm
            )
            T = _left_mm(P0, sg, self.keep, self.n_chunks)  # [B, xM, xA]
            FS = _pair_cmatmul(T, P1t, self.keep, self.n_chunks)

        # --- extraction sandwich, batched over facets ------------------
        # contributions to ALL facets from this shard's subgrids (full
        # E0/E1t — replicated), redistributed to facet shards below
        Bl = FS[0].shape[0]
        Ff = self._E0[0].shape[0]  # full padded facet count
        # stage 1 is a single 2-D matmul: stack E0 rows over facets
        FSm = tuple(
            jnp.moveaxis(p, 1, 0).reshape(xM, Bl * xM) for p in FS
        )
        if self.kernel == "pallas":
            T = dfc_matmul(FSm, self._E0all_pc, "left")  # [F*c, B*xM]
        else:
            E0all = tuple(p.reshape(Ff * c, xM) for p in self._E0)
            T = _pair_cmatmul(E0all, FSm, self.keep, self.n_chunks)
        Tv = tuple(
            p.reshape(Ff, c, Bl, xM).transpose(0, 2, 1, 3)
            .reshape(Ff, Bl * c, xM)
            for p in T
        )
        if self.kernel == "pallas":
            NAFf = dfc_matmul(Tv, self._E1t_pc, "right")  # [F, B*c, c]
        else:
            NAFf = _pair_cmatmul(Tv, self._E1t, self.keep,
                                 self.n_chunks)
        NAFv = tuple(p.reshape(Ff, Bl, c, c) for p in NAFf)

        if self.mesh is not None:
            # back to facet shards — pure data movement, exact
            def a2a(p):
                q = jnp.moveaxis(p, 0, 1)  # [Bloc, Ff, c, c]
                q = jax.lax.all_to_all(
                    q, TILE_AXIS, split_axis=1, concat_axis=0,
                    tiled=True,
                )  # [B, Floc, c, c]
                return jnp.moveaxis(q, 0, 1)  # [Floc, B, c, c]

            NAFv = tuple(a2a(p) for p in NAFv)

        # --- column fold: scatter into [F, c, yN] ----------------------
        # Subgrid windows overlap (multiplicity <= 2, and the last
        # window wraps around to overlap the first), and a plain f32
        # scatter-add would round the overlapping hi-plane sums — error
        # the Fb grid-correction then amplifies at facet edges. The
        # host-precomputed slot targets (``col[5]``) place every valid
        # contribution at a unique position in a 2-slot buffer (padded
        # entries share a trash row, but contribute exact zeros); the
        # two slots then combine with a true df32 add.
        targets = col[5].reshape(-1)  # [B*c] into [2*(yN+1)]
        yNp = yN + 1
        Fl = NAFv[0].shape[0]  # facets folded locally
        planes = []
        for p in NAFv:
            xr = p.transpose(0, 2, 1, 3).reshape(Fl, c, -1)
            planes.append(
                jnp.zeros((Fl, c, 2 * yNp), jnp.float32)
                .at[:, :, targets]
                .add(xr, mode="promise_in_bounds")
            )
        NAF_MNAF = _cdf_add(
            tuple(p[:, :, :yN] for p in planes),
            tuple(p[:, :, yNp : yNp + yN] for p in planes),
        )

        # --- finish axis 1 (yN fft + static wrap gather + Fb window) ---
        g = self._fft(NAF_MNAF, False)  # [F, c, yN]
        # per-facet static wrap windows: one vmapped gather
        w = tuple(
            jax.vmap(lambda pf, ix: jnp.take(pf, ix, axis=1))(
                p, Cf["fin1"]
            )
            for p in g
        )  # [F, c, yB]
        fbr = (fb[0][None, None, :], fb[1][None, None, :])
        re = df_mul((w[0], w[1]), fbr)
        im = df_mul((w[2], w[3]), fbr)
        mm = Cf["m1"][:, None, :]
        rows_out = tuple(p * mm for p in re + im)  # [F, c, yB]

        # --- DUS fold into the padded accumulator ----------------------
        u = tuple(jnp.roll(p, -s0, axis=1) for p in rows_out)
        start = (yN // 2 - c // 2 + s0) % yN
        zero = jnp.zeros((), jnp.int32)
        blk = tuple(
            jax.lax.dynamic_slice(
                acc[k], (zero, start, zero), (Fl, c, yB)
            )
            for k in range(4)
        )
        newblk = _cdf_add(blk, u)
        acc = tuple(
            jax.lax.dynamic_update_slice(
                acc[k], newblk[k], (zero, start, zero)
            )
            for k in range(4)
        )
        return acc, sg

    def _finish(self, acc, Cf):
        """Padded accumulator -> finished facets [F, yB, yB] cdf."""
        core = self.core
        yN, yB, c = core.yN_size, self.yB_size, core.xM_yN_size
        # wrap-row fold in true df32 (plain hi-plane adds would round)
        head = _cdf_add(
            tuple(p[:, :c, :] for p in acc),
            tuple(p[:, yN:, :] for p in acc),
        )
        folded = tuple(
            jnp.concatenate([head[k], acc[k][:, c:yN, :]], axis=1)
            for k in range(4)
        )
        moved = tuple(jnp.moveaxis(p, 1, -1) for p in folded)  # [F,yB,yN]
        g = self._fft(moved, False)

        from ..ops.split_precision import df_mul

        fb = self._Fb_yB
        # [F, yB(cols), yB(rows)] -> [F, yB(rows), yB(cols)]
        w = tuple(
            jnp.swapaxes(
                jax.vmap(lambda pf, ix: jnp.take(pf, ix, axis=1))(
                    p, Cf["fin0"]
                ),
                1, 2,
            )
            for p in g
        )
        fbb = (fb[0][None, :, None], fb[1][None, :, None])
        re = df_mul((w[0], w[1]), fbb)
        im = df_mul((w[2], w[3]), fbb)
        mm = Cf["m0"][:, :, None]
        return tuple(p * mm for p in re + im)

    # -------------------------------------------------------------- driver

    @functools.cached_property
    def _stream_fn(self):
        yN, yB, c = (self.core.yN_size, self.yB_size,
                     self.core.xM_yN_size)

        def run(facets_cdf, cols, Cf):
            Floc = facets_cdf[0].shape[0]
            BF_F = self._prepare(facets_cdf, Cf)
            zeros = (jnp.zeros if self.mesh is None
                     else _varying_zeros)  # scan-carry vma typing
            acc0 = tuple(
                zeros((Floc, yN + c, yB), jnp.float32)
                for _ in range(4)
            )

            def body(acc, col):
                acc, _ = self._column(BF_F, acc, col, Cf)
                return acc, None

            acc, _ = jax.lax.scan(body, acc0, cols)
            return self._finish(acc, Cf)

        if self.mesh is None:
            return jax.jit(run)

        from jax.sharding import PartitionSpec as P

        from ..ops.pallas_kernels import _is_tpu

        fsh = P(TILE_AXIS)
        # vma checking stays ON for compiled runs (pallas_split's
        # out_shapes carry vma); the interpret-mode pallas evaluator
        # mixes varying and replicated values in its internal
        # dynamic_slice, so — exactly as in ShardedSwiftly
        # (distributed.py) — the exemption is scoped to CPU interpret
        # runs of the fused kernel only.
        pallas_interpret = self.kernel == "pallas" and not _is_tpu()
        return jax.jit(jax.shard_map(
            run,
            mesh=self.mesh,
            in_specs=(fsh, P(), fsh),  # pytree-prefix specs
            out_specs=fsh,
            check_vma=not pallas_interpret,
        ))

    def roundtrip(self, facet_arrays):
        """Full split-precision round trip.

        :param facet_arrays: list of host complex arrays [yB, yB]
        :return: ``(facets_out, n_subgrids)`` — host complex128 arrays
        """
        stacked = np.stack(
            [np.asarray(f, dtype=np.complex128) for f in facet_arrays]
            + [np.zeros_like(np.asarray(facet_arrays[0]))]
            * (self.F_pad - self.F)
        )
        facets_cdf = cdf_from_c128(stacked)
        plan = self.plan
        cols = tuple(
            jnp.asarray(a)
            for a in (
                np.asarray(plan.off0, np.int32),
                np.asarray(plan.sg_off1, np.int32),
                np.asarray(plan.valid, np.float32),
                np.asarray(plan.mask0, np.float32),
                np.asarray(plan.mask1, np.float32),
                self._fold_targets(),
            )
        )
        out_cdf = self._stream_fn(facets_cdf, cols, self._fsh())
        out = cdf_to_c128(tuple(np.asarray(p) for p in out_cdf))
        n = sum(len(cfgs) for cfgs in plan.configs)
        return [out[i] for i in range(self.F)], n
