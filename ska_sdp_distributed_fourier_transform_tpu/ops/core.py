"""The SwiFTly numerical core: ten processing functions, TPU-native.

Reproduces the reference semantics exactly (cited per-op below from
`/root/reference/src/ska_sdp_exec_swiftly/fourier_transform/core.py`) but as
pure, functional JAX ops designed for XLA:

* every op is axis-separable and statically shaped — pad/extract arithmetic
  is resolved at trace time;
* tile *offsets are traced values* (int32 scalars/vectors), so one compiled
  program serves every facet/subgrid position: offsets only enter via
  ``jnp.roll`` (compiled to cheap gathers) — no per-offset recompilation;
* there is no in-place ``out=`` mutation — accumulation is functional
  (``out + result``), which XLA turns into in-place updates after fusion,
  with donation handling buffer reuse at the engine level;
* dtype is a parameter: complex128 for CPU-grade accuracy (the reference's
  3e-10 round-trip bound), complex64 for the TPU fast path.

Two backends share this surface, mirroring the reference's
``SwiftlyCore`` (numpy) / ``SwiftlyCoreFunc`` (native) dual-backend design:
:class:`SwiftlyCore` here is the jnp/XLA path; the fused Pallas/MXU operator
path lives in :mod:`.operators` and :mod:`.pallas_kernels`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .primitives import broadcast, extract_mid, fft, ifft, pad_mid
from .pswf import make_window_constants

__all__ = ["SwiftlyCore", "check_swiftly_params"]


def check_swiftly_params(N: int, xM_size: int, yN_size: int) -> None:
    """Validate the divisibility constraints that make every scaled roll
    integral (reference: core.py:55-74)."""
    if N % yN_size != 0:
        raise ValueError(
            f"Image size {N} not divisible by facet size {yN_size}!"
        )
    if N % xM_size != 0:
        raise ValueError(
            f"Image size {N} not divisible by subgrid size {xM_size}!"
        )
    if (xM_size * yN_size) % N != 0:
        raise ValueError(
            f"Contribution size not integer with image size {N}, "
            f"subgrid size {xM_size} and facet size {yN_size}!"
        )


# ---------------------------------------------------------------------------
# Functional ops. All take the relevant window constant(s) and static sizes
# explicitly so they can be reused by the batched/sharded engine and vmapped
# freely. Offsets may be Python ints or traced int scalars.
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _phase_table(n, rdtype_name):
    """Host-f64 root-of-unity table ``exp(2pi i m / n)`` as a float
    pair (complex constants can't cross some TPU attachments)."""
    m = np.arange(n, dtype=np.float64)
    ang = 2.0 * np.pi * m / n
    return (np.cos(ang).astype(rdtype_name),
            np.sin(ang).astype(rdtype_name))


def _phase(shift, n, sign, dtype):
    """Image-space phase vector equivalent to a grid-space roll under the
    centre-zero FFT convention:
    ``ifft(roll(x, s)) == ifft(x) * _phase(s, n, +1)`` and
    ``fft(roll(x, s)) == fft(x) * _phase(s, n, -1)``.

    Turns O(n)-data rolls of large buffers into an elementwise multiply
    that XLA fuses into the FFT epilogue (a VPU op instead of a gather).

    The exponent ``(sign * shift * j) mod n`` is computed in EXACT
    integer modular arithmetic and looked up in a host-f64 root-of-unity
    table. The obvious ``cos((2pi/n) * shift * j)`` in traced f32 loses
    up to 2.4e-2 per phase at production offsets (shift ~ 1e5 puts the
    angle at ~4e5 rad; f32 coefficient rounding alone is amplified by
    j) — errors that CANCEL between a prepare and its matching finish,
    so full-cover round trips looked fine, but that break any path
    where the two sides see different offsets (the 128k sparse run
    measured facet RMSE 0.12 from exactly this). The modular product is
    split ``shift = hi*256 + lo`` so every intermediate stays below
    2^31 for n up to 2^20 (int32-safe under jit without x64).
    """
    rdtype = jnp.finfo(dtype).dtype
    cos_t, sin_t = _phase_table(n, np.dtype(rdtype).name)
    j = jnp.arange(n, dtype=jnp.int32) - n // 2
    jm = jnp.mod(j, n)
    s = jnp.mod(jnp.asarray(shift, jnp.int32), n)
    hi, lo = s // 256, s % 256
    k = jnp.mod(jnp.mod(hi * jm, n) * 256 + lo * jm, n)
    if sign < 0:
        k = jnp.mod(n - k, n)
    return jax.lax.complex(
        jnp.asarray(cos_t)[k], jnp.asarray(sin_t)[k]
    ).astype(dtype)


def _wrap_take(a, start, size, axis):
    """Gather the wrap-around window ``out[i] = a[(start + i) mod n]``
    along ``axis``. Equivalent to ``extract_mid(roll(a, -s), size)`` with
    ``start = n//2 - size//2 + s``, but touches only ``size`` rows instead
    of rolling the full buffer (the buffers here are up to yN=64k)."""
    n = a.shape[axis]
    idx = jnp.mod(start + jnp.arange(size), n)
    return jnp.take(a, idx, axis=axis)


def _wrap_take_slices(a, start, size, axis):
    """:func:`_wrap_take` as two static-size dynamic slices instead of a
    general gather: the window is contiguous-with-wrap, so it is pure
    DMA — ``q1`` anchored at the (clamped) start, ``q2`` at the array
    head for the wrapped tail, stitched with one small slice. XLA
    lowers this to block copies where the row gather builds per-row
    scatter/gather descriptors.

    Requires ``size <= a.shape[axis]`` (the wrapped tail is read as a
    single head slice — unlike :func:`_wrap_take`, whose index-mod
    handles windows that wrap more than once).
    """
    n = a.shape[axis]
    assert size <= n, (
        f"_wrap_take_slices needs size <= axis length ({size} > {n}); "
        "use _wrap_take for multi-wrap windows"
    )
    start = jnp.mod(start, n)
    q1 = jax.lax.dynamic_slice_in_dim(a, start, size, axis)
    # dynamic_slice clamps start to n-size; delta is how far it moved
    delta = start - jnp.minimum(start, n - size)
    q2 = jax.lax.slice_in_dim(a, 0, size, axis=axis)
    return jax.lax.dynamic_slice_in_dim(
        jnp.concatenate([q1, q2], axis=axis), delta, size, axis
    )


def _roll_extract_roll(a, scaled_off, size, axis):
    """roll(+s) . extract_mid(size) . roll(-s) along axis, gather-based."""
    win = _wrap_take(a, a.shape[axis] // 2 - size // 2 + scaled_off, size,
                     axis)
    return jnp.roll(win, scaled_off, axis=axis)


def _scale_off(off, step):
    """Scale an aligned offset by 1/step exactly.

    Equivalent to ``off * size // N`` (reference formula) for offsets that
    are multiples of ``step = N // size`` — floor semantics for any sign —
    but immune to int32 overflow at N=128k scale on TPU.
    """
    return jnp.floor_divide(off, step)


def prepare_facet_op(facet, facet_off, axis, Fb, yN_size):
    """facet(yB) -> BF(yN): grid-correct, pad, phase-align, ifft.

    Reference: core.py:189-222 (pad, roll by +facet_off, ifft). The roll
    happens in grid space just before the ifft, so it is realised as an
    image-space phase multiply after the ifft — same math, no yN-size
    gather. Expensive; reuse across subgrids.
    """
    facet_size = facet.shape[axis]
    fb = extract_mid(Fb, facet_size, 0)
    BF = pad_mid(facet * broadcast(fb, facet.ndim, axis), yN_size, axis)
    phase = _phase(facet_off, yN_size, +1, BF.dtype)
    return ifft(BF, axis) * broadcast(phase, BF.ndim, axis)


def prepare_facet_mxu(facet, facet_off, axis, Fb, yN_size):
    """:func:`prepare_facet_op` with the yN-scale inverse FFT on the MXU
    (four-step factor matmuls, :mod:`.fft_mxu`) instead of the XLA FFT.

    Mathematically identical; on TPU it sidesteps the layout copies XLA's
    FFT decomposition inserts around non-last-axis transforms. The target
    axis is moved last for the transform and moved back.
    """
    from .fft_mxu import fft_mxu

    facet_size = facet.shape[axis]
    fb = extract_mid(Fb, facet_size, 0)
    BF = pad_mid(facet * broadcast(fb, facet.ndim, axis), yN_size, axis)
    last = facet.ndim - 1
    if axis != last:
        BF = jnp.moveaxis(BF, axis, last)
    out = fft_mxu(BF, inverse=True)
    if axis != last:
        out = jnp.moveaxis(out, last, axis)
    phase = _phase(facet_off, yN_size, +1, out.dtype)
    return out * broadcast(phase, out.ndim, axis)


def extract_from_facet_fn(prep_facet, subgrid_off, axis, N, yN_size,
                          xM_yN_size):
    """BF(yN) -> NMBF(xM_yN): compact contribution extraction.

    Pure data movement — a wrap-around window gather of xM_yN rows at the
    scaled subgrid offset (reference: core.py:224-253, roll/extract/roll).
    """
    scaled_off = _scale_off(subgrid_off, N // yN_size)
    return _roll_extract_roll(prep_facet, scaled_off, xM_yN_size, axis)


def add_to_subgrid_fn(facet_contrib, facet_off, axis, N, xM_size, Fn):
    """NMBF(xM_yN) -> subgrid-padded term (xM): fft, window by Fn, pad,
    phase-align. The result is meant to be accumulated over facets.

    Reference: core.py:255-285 (add_mode).
    """
    scaled_off = _scale_off(facet_off, N // xM_size)
    FNMBF = broadcast(Fn, facet_contrib.ndim, axis) * jnp.roll(
        fft(facet_contrib, axis), -scaled_off, axis=axis
    )
    return jnp.roll(pad_mid(FNMBF, xM_size, axis), scaled_off, axis=axis)


def finish_subgrid_fn(summed_contribs, subgrid_offs, subgrid_size):
    """Summed contributions (xM per axis) -> approximate subgrid (xA).

    Per axis: ifft then wrap-window gather at -offset (reference:
    core.py:287-325, ifft/roll/extract).
    """
    tmp = summed_contribs
    for axis, off in enumerate(subgrid_offs):
        img = ifft(tmp, axis)
        tmp = _wrap_take(
            img,
            img.shape[axis] // 2 - subgrid_size // 2 + off,
            subgrid_size,
            axis,
        )
    return tmp


def prepare_subgrid_fn(subgrid, subgrid_offs, xM_size):
    """subgrid(xA) -> FS(xM): pad, phase-align, fft — all axes.

    The grid-space roll by +offset before the fft is realised as an
    image-space phase multiply after it (reference: core.py:328-368).
    """
    tmp = subgrid
    for axis, off in enumerate(subgrid_offs):
        g = fft(pad_mid(tmp, xM_size, axis), axis)
        tmp = g * broadcast(_phase(off, xM_size, -1, g.dtype), g.ndim, axis)
    return tmp


def extract_from_subgrid_fn(FSi, facet_off, axis, N, xM_size, xM_yN_size,
                            Fn):
    """FS(xM) -> NAF(xM_yN): extract facet's contribution window, apply Fn,
    bring to image space. Reference: core.py:370-406.
    """
    scaled_off = _scale_off(facet_off, N // xM_size)
    win = _wrap_take(
        FSi, xM_size // 2 - xM_yN_size // 2 + scaled_off, xM_yN_size, axis
    )
    FNjSi = broadcast(Fn, FSi.ndim, axis) * win
    return ifft(jnp.roll(FNjSi, scaled_off, axis=axis), axis)


def add_to_facet_fn(subgrid_contrib, subgrid_off, axis, N, yN_size):
    """NAF(xM_yN) -> facet-padded term (yN): phase-align, pad. To be
    accumulated over subgrids. Reference: core.py:408-449 (add_mode).

    (The sharded engine fuses this into a direct scatter-add on the
    accumulator instead of materialising the padded buffer per subgrid.)
    """
    scaled_off = _scale_off(subgrid_off, N // yN_size)
    MiNjSi = jnp.roll(subgrid_contrib, -scaled_off, axis=axis)
    return jnp.roll(pad_mid(MiNjSi, yN_size, axis), scaled_off, axis=axis)


def finish_facet_fn(MiNjSi_sum, facet_off, facet_size, axis, Fb):
    """Accumulated contributions (yN) -> approximate facet (yB): fft,
    de-align (wrap-window gather at -facet_off), grid-correct by Fb.
    Reference: core.py:452-484.
    """
    g = fft(MiNjSi_sum, axis)
    win = _wrap_take(
        g,
        g.shape[axis] // 2 - facet_size // 2 + facet_off,
        facet_size,
        axis,
    )
    return broadcast(extract_mid(Fb, facet_size, 0), win.ndim, axis) * win


def finish_facet_mxu(MiNjSi_sum, facet_off, facet_size, axis, Fb):
    """:func:`finish_facet_fn` with the yN-scale FFT on the MXU
    (four-step factor matmuls)."""
    from .fft_mxu import fft_mxu

    last = MiNjSi_sum.ndim - 1
    x = MiNjSi_sum
    if axis != last:
        x = jnp.moveaxis(x, axis, last)
    g = fft_mxu(x)
    if axis != last:
        g = jnp.moveaxis(g, last, axis)
    win = _wrap_take(
        g,
        g.shape[axis] // 2 - facet_size // 2 + facet_off,
        facet_size,
        axis,
    )
    return broadcast(extract_mid(Fb, facet_size, 0), win.ndim, axis) * win


class SwiftlyCore:
    """Streaming distributed Fourier transform core (JAX backend).

    Method-surface parity with the reference's ``SwiftlyCore`` /
    ``SwiftlyCoreFunc`` (core.py:20-484 / :487-929), including the
    ``out=``/add-mode output protocol — realised functionally (accumulating
    ops return ``out + result``).

    :param W: PSWF grid-space support parameter
    :param N: total image size
    :param xM_size: padded subgrid size
    :param yN_size: padded facet size
    :param dtype: complex dtype for all device math (complex128 needs JAX
        x64 mode; use complex64 on TPU)
    """

    def __init__(self, W, N, xM_size, yN_size, dtype=None):
        self.W = W
        self.N = N
        self.xM_size = xM_size
        self.yN_size = yN_size
        check_swiftly_params(N, xM_size, yN_size)
        self.xM_yN_size = xM_size * yN_size // N

        if dtype is None:
            dtype = (
                jnp.complex128
                if jax.config.jax_enable_x64
                else jnp.complex64
            )
        self.dtype = jnp.dtype(dtype)
        self.real_dtype = jnp.finfo(self.dtype).dtype

        pswf, Fb, Fn = make_window_constants(W, N, xM_size, yN_size)
        self.pswf = pswf  # host-side float64
        self._Fb = jnp.asarray(Fb, dtype=self.real_dtype)
        self._Fn = jnp.asarray(Fn, dtype=self.real_dtype)

    # -- bookkeeping -------------------------------------------------------

    @property
    def subgrid_off_step(self):
        """Base subgrid offset; all subgrid offsets are multiples of it."""
        return self.N // self.yN_size

    @property
    def facet_off_step(self):
        """Base facet offset; all facet offsets are multiples of it."""
        return self.N // self.xM_size

    def __repr__(self):
        return (
            f"{self.__class__.__name__}(W={self.W}, N={self.N}, "
            f"xM_size={self.xM_size}, yN_size={self.yN_size})"
        )

    def check_params(self):
        """Re-validate parameters (kept for reference API parity)."""
        check_swiftly_params(self.N, self.xM_size, self.yN_size)

    # Pickle support: re-derive device constants on the receiving side.
    def __getstate__(self):
        return {
            "W": self.W,
            "N": self.N,
            "xM_size": self.xM_size,
            "yN_size": self.yN_size,
            "dtype": str(self.dtype),
        }

    def __setstate__(self, state):
        dtype = state.pop("dtype")
        self.__init__(dtype=jnp.dtype(dtype), **state)

    # -- helpers -----------------------------------------------------------

    def _as_complex(self, a):
        a = jnp.asarray(a)
        if not jnp.issubdtype(a.dtype, jnp.complexfloating):
            a = a.astype(self.dtype)
        return a

    @staticmethod
    def _merge_out(result, out, add_mode=False):
        """Functional analogue of the reference ``out=`` protocol
        (core.py:152-186)."""
        if out is None:
            return result
        if out.shape != result.shape:
            raise ValueError(
                f"Output shape is {out.shape}, expected {result.shape}!"
            )
        if add_mode:
            return out + result
        return result

    @staticmethod
    def _offs_list(off, ndim, what):
        if isinstance(off, (list, tuple)):
            offs = list(off)
        else:
            offs = [off]
        if len(offs) != ndim:
            raise ValueError(
                f"{what} offset must be given for every dimension!"
            )
        return offs

    # -- facet -> subgrid chain ---------------------------------------------

    def prepare_facet(self, facet, facet_off, axis, out=None):
        """Prepare facet for contribution extraction (-> BF, size yN).

        Expensive (yN-scale ifft); reuse across all subgrids.
        """
        result = _prepare_facet_jit(
            self._as_complex(facet), facet_off, axis, self._Fb, self.yN_size
        )
        return self._merge_out(result, out)

    def extract_from_facet(self, prep_facet, subgrid_off, axis, out=None):
        """Extract compact facet contribution to a subgrid (-> NMBF)."""
        result = _extract_from_facet_jit(
            self._as_complex(prep_facet),
            subgrid_off,
            axis,
            self.N,
            self.yN_size,
            self.xM_yN_size,
        )
        return self._merge_out(result, out)

    def add_to_subgrid(self, facet_contrib, facet_off, axis, out=None):
        """Transform facet contribution and accumulate into subgrid term."""
        result = _add_to_subgrid_jit(
            self._as_complex(facet_contrib),
            facet_off,
            axis,
            self.N,
            self.xM_size,
            self._Fn,
        )
        if out is None:
            return result
        return self._merge_out(result, out, add_mode=True)

    def add_to_subgrid_2d(self, facet_contrib, facet_off0, facet_off1,
                          out=None):
        """Fused two-axis :meth:`add_to_subgrid` (native-backend parity,
        reference core.py:752-778)."""
        result = _add_to_subgrid_2d_jit(
            self._as_complex(facet_contrib),
            facet_off0,
            facet_off1,
            self.N,
            self.xM_size,
            self._Fn,
        )
        if out is None:
            return result
        return self._merge_out(result, out, add_mode=True)

    def finish_subgrid(self, summed_contribs, subgrid_off, subgrid_size,
                       out=None):
        """Finish subgrid across all axes (-> approximate subgrid, xA)."""
        summed_contribs = self._as_complex(summed_contribs)
        offs = self._offs_list(subgrid_off, summed_contribs.ndim, "Subgrid")
        result = _finish_subgrid_jit(
            summed_contribs, tuple(offs), subgrid_size
        )
        return self._merge_out(result, out)

    # -- subgrid -> facet chain ---------------------------------------------

    def prepare_subgrid(self, subgrid, subgrid_off, out=None):
        """Pad + FFT subgrid into image space across all axes (-> FS, xM)."""
        subgrid = self._as_complex(subgrid)
        offs = self._offs_list(subgrid_off, subgrid.ndim, "Subgrid")
        result = _prepare_subgrid_jit(subgrid, tuple(offs), self.xM_size)
        return self._merge_out(result, out)

    def extract_from_subgrid(self, FSi, facet_off, axis, out=None):
        """Extract subgrid's contribution to a facet (-> NAF)."""
        result = _extract_from_subgrid_jit(
            self._as_complex(FSi),
            facet_off,
            axis,
            self.N,
            self.xM_size,
            self.xM_yN_size,
            self._Fn,
        )
        return self._merge_out(result, out)

    def add_to_facet(self, subgrid_contrib, subgrid_off, axis, out=None):
        """Accumulate subgrid contribution into padded facet term."""
        result = _add_to_facet_jit(
            self._as_complex(subgrid_contrib),
            subgrid_off,
            axis,
            self.N,
            self.yN_size,
        )
        if out is None:
            return result
        return self._merge_out(result, out, add_mode=True)

    def finish_facet(self, MiNjSi_sum, facet_off, facet_size, axis, out=None):
        """Finish facet along one axis (-> approximate facet, yB)."""
        result = _finish_facet_jit(
            self._as_complex(MiNjSi_sum),
            facet_off,
            facet_size,
            axis,
            self._Fb,
        )
        return self._merge_out(result, out)


# ---------------------------------------------------------------------------
# jit wrappers: static structure (axis/sizes), traced offsets. Offsets are
# normalised to int32 arrays inside so Python-int and traced calls share a
# single compilation per shape.
# ---------------------------------------------------------------------------


def _off32(off):
    return jnp.asarray(off, dtype=jnp.int32)


@functools.partial(jax.jit, static_argnames=("axis", "yN_size"))
def _prepare_facet_jit(facet, facet_off, axis, Fb, yN_size):
    return prepare_facet_op(facet, _off32(facet_off), axis, Fb, yN_size)


@functools.partial(
    jax.jit, static_argnames=("axis", "N", "yN_size", "xM_yN_size")
)
def _extract_from_facet_jit(prep_facet, subgrid_off, axis, N, yN_size,
                            xM_yN_size):
    return extract_from_facet_fn(
        prep_facet, _off32(subgrid_off), axis, N, yN_size, xM_yN_size
    )


@functools.partial(jax.jit, static_argnames=("axis", "N", "xM_size"))
def _add_to_subgrid_jit(facet_contrib, facet_off, axis, N, xM_size, Fn):
    return add_to_subgrid_fn(
        facet_contrib, _off32(facet_off), axis, N, xM_size, Fn
    )


@functools.partial(jax.jit, static_argnames=("N", "xM_size"))
def _add_to_subgrid_2d_jit(facet_contrib, off0, off1, N, xM_size, Fn):
    tmp = add_to_subgrid_fn(facet_contrib, _off32(off0), 0, N, xM_size, Fn)
    return add_to_subgrid_fn(tmp, _off32(off1), 1, N, xM_size, Fn)


@functools.partial(jax.jit, static_argnames=("subgrid_size",))
def _finish_subgrid_jit(summed_contribs, subgrid_offs, subgrid_size):
    offs = [_off32(o) for o in subgrid_offs]
    return finish_subgrid_fn(summed_contribs, offs, subgrid_size)


@functools.partial(jax.jit, static_argnames=("xM_size",))
def _prepare_subgrid_jit(subgrid, subgrid_offs, xM_size):
    offs = [_off32(o) for o in subgrid_offs]
    return prepare_subgrid_fn(subgrid, offs, xM_size)


@functools.partial(
    jax.jit, static_argnames=("axis", "N", "xM_size", "xM_yN_size")
)
def _extract_from_subgrid_jit(FSi, facet_off, axis, N, xM_size, xM_yN_size,
                              Fn):
    return extract_from_subgrid_fn(
        FSi, _off32(facet_off), axis, N, xM_size, xM_yN_size, Fn
    )


@functools.partial(jax.jit, static_argnames=("axis", "N", "yN_size"))
def _add_to_facet_jit(subgrid_contrib, subgrid_off, axis, N, yN_size):
    return add_to_facet_fn(
        subgrid_contrib, _off32(subgrid_off), axis, N, yN_size
    )


@functools.partial(jax.jit, static_argnames=("axis", "facet_size"))
def _finish_facet_jit(MiNjSi_sum, facet_off, facet_size, axis, Fb):
    return finish_facet_fn(MiNjSi_sum, _off32(facet_off), facet_size, axis,
                           Fb)
