"""Native (C++) SwiFTly backend: :class:`SwiftlyCoreFunc`.

The TPU framework's equivalent of the reference's external `ska_sdp_func`
native library (reference core.py:487-929 delegates to
``ska_sdp_func.fourier_transforms.swiftly.Swiftly``): the ten processing
functions implemented in C++ (`csrc/swiftly.cpp`) as single fused
gather/FFT/scatter passes over complex128 arrays, bound via ctypes.

Role in this framework: the JAX/XLA core (:class:`.core.SwiftlyCore`) is
the TPU compute path; this backend is the *host* runtime component — the
oracle-grade double-precision engine used for CPU execution, accuracy
cross-checks against the XLA path (the reference's dual-backend test
pattern), and host-side pre/post-processing where data starts or ends on
the host anyway.

The shared library is built on demand with ``g++ -O3 -fopenmp`` the first
time it is needed (and rebuilt whenever the source is newer), so the repo
needs no install step.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

from .core import check_swiftly_params
from .pswf import make_window_constants

__all__ = ["SwiftlyCoreFunc", "load_library", "native_available"]

_REPO_ROOT = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
_SRC = os.path.join(_REPO_ROOT, "csrc", "swiftly.cpp")
_LIB = os.path.join(_REPO_ROOT, "csrc", "build", "libswiftly.so")

_lib = None
_lib_lock = threading.Lock()
_c128_p = ctypes.POINTER(ctypes.c_double)  # complex128 passed as double*


def _build_library():
    os.makedirs(os.path.dirname(_LIB), exist_ok=True)
    cmd = [
        "g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-fopenmp",
        "-march=native", _SRC, "-o", _LIB,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, text=True)
    except (subprocess.CalledProcessError, FileNotFoundError):
        # -march=native or -fopenmp may be unsupported; retry conservative
        cmd = [
            "g++", "-O3", "-std=c++17", "-shared", "-fPIC", _SRC, "-o",
            _LIB,
        ]
        subprocess.run(cmd, check=True, capture_output=True, text=True)


def load_library():
    """Load (building if needed) the native library; returns the ctypes CDLL."""
    global _lib
    with _lib_lock:
        if _lib is not None:
            return _lib
        if not os.path.exists(_LIB) or (
            os.path.exists(_SRC)
            and os.path.getmtime(_SRC) > os.path.getmtime(_LIB)
        ):
            _build_library()
        lib = ctypes.CDLL(_LIB)

        i64 = ctypes.c_int64
        lib.swiftly_create.restype = ctypes.c_void_p
        lib.swiftly_create.argtypes = [
            i64, i64, i64, ctypes.c_double, _c128_p, _c128_p,
        ]
        lib.swiftly_free.argtypes = [ctypes.c_void_p]
        lib.swiftly_num_threads.restype = ctypes.c_int

        axis_op = [ctypes.c_void_p, _c128_p, i64, i64, _c128_p, i64, i64,
                   i64, i64]
        sized_op = axis_op + [i64]
        for name, argtypes in [
            ("swiftly_prepare_facet", sized_op),
            ("swiftly_extract_from_facet", axis_op),
            ("swiftly_add_to_subgrid", axis_op),
            ("swiftly_finish_subgrid", sized_op),
            ("swiftly_prepare_subgrid", sized_op),
            ("swiftly_extract_from_subgrid", axis_op),
            ("swiftly_add_to_facet", axis_op),
            ("swiftly_finish_facet", sized_op),
            ("swiftly_add_to_subgrid_2d",
             [ctypes.c_void_p, _c128_p, i64, i64, _c128_p, i64, i64, i64,
              i64]),
            ("swiftly_prepare_subgrid_2d",
             [ctypes.c_void_p, _c128_p, i64, i64, _c128_p, i64, i64, i64,
              i64, i64]),
            ("swiftly_fft_shifted",
             [ctypes.c_void_p, _c128_p, i64, i64, i64, i64, ctypes.c_int]),
        ]:
            fn = getattr(lib, name)
            fn.restype = ctypes.c_int
            fn.argtypes = argtypes
        _lib = lib
        return _lib


def native_available() -> bool:
    """True when the native backend can be built/loaded on this machine."""
    try:
        load_library()
        return True
    except Exception:
        return False


def _ptr(a: np.ndarray):
    return a.ctypes.data_as(_c128_p)


def _strides(a: np.ndarray):
    """(row, element) strides in complex128 elements for a 2-D array."""
    itm = a.itemsize
    return a.strides[0] // itm, a.strides[1] // itm


class SwiftlyCoreFunc:
    """Streaming distributed Fourier transform core — native C++ backend.

    Method-surface parity with :class:`.core.SwiftlyCore` and with the
    reference's ``SwiftlyCoreFunc`` (core.py:487-929): the ten ops plus the
    fused native-only 2-D variants (``add_to_subgrid_2d``,
    ``prepare_subgrid_inplace(_2d)``). Inputs/outputs are NumPy complex128
    arrays; 1-D inputs and axis-0 calls are adapted with views, not copies
    (the C++ kernels are stride-aware — unlike the reference, which
    transposes onto last-axis-only native kernels, core.py:577-630).
    """

    def __init__(self, W, N, xM_size, yN_size, dtype=None):
        check_swiftly_params(N, xM_size, yN_size)
        self.W = W
        self.N = N
        self.xM_size = xM_size
        self.yN_size = yN_size
        self.xM_yN_size = xM_size * yN_size // N
        self.dtype = np.dtype(dtype or np.complex128)
        if self.dtype != np.complex128:
            raise ValueError("Native backend is complex128-only")
        self.real_dtype = np.dtype(np.float64)

        lib = load_library()
        pswf, Fb, Fn = make_window_constants(W, N, xM_size, yN_size)
        self.pswf = pswf
        self._Fb = np.ascontiguousarray(Fb, dtype=np.float64)
        self._Fn = np.ascontiguousarray(Fn, dtype=np.float64)
        self._lib = lib
        self._handle = lib.swiftly_create(
            N, yN_size, xM_size, float(W),
            self._Fb.ctypes.data_as(_c128_p),
            self._Fn.ctypes.data_as(_c128_p),
        )
        if not self._handle:
            raise ValueError("Invalid SwiFTly parameters for native backend")

    def __del__(self):
        handle = getattr(self, "_handle", None)
        if handle:
            self._lib.swiftly_free(handle)
            self._handle = None

    # -- bookkeeping (parity with SwiftlyCore) ------------------------------

    @property
    def subgrid_off_step(self):
        """Base subgrid offset; all subgrid offsets are multiples of it."""
        return self.N // self.yN_size

    @property
    def facet_off_step(self):
        """Base facet offset; all facet offsets are multiples of it."""
        return self.N // self.xM_size

    def check_params(self):
        """Re-validate parameters (kept for reference API parity)."""
        check_swiftly_params(self.N, self.xM_size, self.yN_size)

    def __repr__(self):
        return (
            f"{self.__class__.__name__}(W={self.W}, N={self.N}, "
            f"xM_size={self.xM_size}, yN_size={self.yN_size})"
        )

    # Pickle: re-create the native handle on the receiving side (the
    # reference does the same — core.py:513-525).
    def __getstate__(self):
        return {
            "W": self.W, "N": self.N, "xM_size": self.xM_size,
            "yN_size": self.yN_size,
        }

    def __setstate__(self, state):
        self.__init__(**state)

    # -- call adaptation -----------------------------------------------------

    @staticmethod
    def _as_c128(a):
        a = np.asarray(a)
        if a.dtype != np.complex128:
            a = a.astype(np.complex128)
        return a

    def _axis_call(self, fn, inp, axis, out_n, off, extra=()):
        """Run a last-axis native kernel along ``axis`` of a 1-D/2-D array.

        Returns (out, squeeze) — axis-0 handled by swapping strides, 1-D by
        a newaxis view (reference's `_auto_broadcast_create`,
        core.py:577-630, minus the copies).
        """
        inp = self._as_c128(inp)
        squeeze = inp.ndim == 1
        if squeeze:
            inp = inp[np.newaxis, :]
            axis = 1
        if inp.ndim != 2:
            raise ValueError("Native backend supports 1-D/2-D arrays only")
        if axis not in (0, 1):
            raise ValueError(f"Invalid axis {axis}")

        if not inp.flags.c_contiguous and not inp.flags.f_contiguous:
            inp = np.ascontiguousarray(inp)
        in_rs, in_es = _strides(inp)
        if axis == 0:
            in_rs, in_es = in_es, in_rs
            rows = inp.shape[1]
            out_shape = (out_n, inp.shape[1])
            out = np.empty(out_shape, dtype=np.complex128)
            o_rs, o_es = _strides(out)
            o_rs, o_es = o_es, o_rs
        else:
            rows = inp.shape[0]
            out = np.empty((inp.shape[0], out_n), dtype=np.complex128)
            o_rs, o_es = _strides(out)

        rc = fn(self._handle, _ptr(inp), in_rs, in_es, _ptr(out), o_rs,
                o_es, rows, *extra, off)
        if rc != 0:
            raise ValueError(f"native kernel failed (rc={rc})")
        return out[0] if squeeze else out

    def _accum_axis_call(self, fn, inp, axis, out_n, off, out=None):
        """Accumulating last-axis kernel (+= into ``out``)."""
        inp = self._as_c128(inp)
        squeeze = inp.ndim == 1
        if squeeze:
            inp = inp[np.newaxis, :]
            axis = 1
        if not inp.flags.c_contiguous and not inp.flags.f_contiguous:
            inp = np.ascontiguousarray(inp)
        in_rs, in_es = _strides(inp)
        if axis == 0:
            in_rs, in_es = in_es, in_rs
            rows = inp.shape[1]
            out_shape = (out_n, inp.shape[1])
        else:
            rows = inp.shape[0]
            out_shape = (inp.shape[0], out_n)

        if out is None:
            res = np.zeros(out_shape, dtype=np.complex128)
        else:
            want = out_shape[1:] if squeeze else out_shape
            if out.shape != want:
                raise ValueError(
                    f"Output shape is {out.shape}, expected {want}!"
                )
            res = out if not squeeze else out[np.newaxis, :]
            if res.dtype != np.complex128 or not (
                res.flags.c_contiguous or res.flags.f_contiguous
            ):
                raise ValueError(
                    "accumulator must be contiguous complex128"
                )
        o_rs, o_es = _strides(res)
        if axis == 0:
            o_rs, o_es = o_es, o_rs
        rc = fn(self._handle, _ptr(inp), in_rs, in_es, _ptr(res), o_rs,
                o_es, rows, off)
        if rc != 0:
            raise ValueError(f"native kernel failed (rc={rc})")
        return res[0] if squeeze else res

    @staticmethod
    def _offs_list(off, ndim, what):
        offs = list(off) if isinstance(off, (list, tuple)) else [off]
        if len(offs) != ndim:
            raise ValueError(
                f"{what} offset must be given for every dimension!"
            )
        return offs

    # -- facet -> subgrid chain ----------------------------------------------

    def prepare_facet(self, facet, facet_off, axis, out=None):
        """Prepare facet for contribution extraction (-> BF, size yN)."""
        facet = np.asarray(facet)
        yB = facet.shape[axis if facet.ndim > 1 else 0]
        res = self._axis_call(
            self._lib.swiftly_prepare_facet, facet, axis, self.yN_size,
            int(facet_off), extra=(yB,),
        )
        return self._merge_out(res, out)

    def extract_from_facet(self, prep_facet, subgrid_off, axis, out=None):
        """Extract compact facet contribution to a subgrid (-> NMBF)."""
        res = self._axis_call(
            self._lib.swiftly_extract_from_facet, prep_facet, axis,
            self.xM_yN_size, int(subgrid_off),
        )
        return self._merge_out(res, out)

    def add_to_subgrid(self, facet_contrib, facet_off, axis, out=None):
        """Transform facet contribution and accumulate into subgrid term."""
        return self._accum_axis_call(
            self._lib.swiftly_add_to_subgrid, facet_contrib, axis,
            self.xM_size, int(facet_off), out=out,
        )

    def add_to_subgrid_2d(self, facet_contrib, facet_off0, facet_off1,
                          out=None):
        """Fused two-axis :meth:`add_to_subgrid` (reference core.py:752-778)."""
        inp = self._as_c128(np.ascontiguousarray(facet_contrib))
        if out is None:
            out = np.zeros((self.xM_size, self.xM_size), dtype=np.complex128)
        elif out.shape != (self.xM_size, self.xM_size):
            raise ValueError(
                f"Output shape is {out.shape}, expected "
                f"{(self.xM_size, self.xM_size)}!"
            )
        in_rs, in_es = _strides(inp)
        o_rs, o_es = _strides(out)
        rc = self._lib.swiftly_add_to_subgrid_2d(
            self._handle, _ptr(inp), in_rs, in_es, _ptr(out), o_rs, o_es,
            int(facet_off0), int(facet_off1),
        )
        if rc != 0:
            raise ValueError(f"native kernel failed (rc={rc})")
        return out

    def finish_subgrid(self, summed_contribs, subgrid_off, subgrid_size,
                       out=None):
        """Finish subgrid across all axes (-> approximate subgrid, xA)."""
        a = self._as_c128(summed_contribs)
        offs = self._offs_list(subgrid_off, a.ndim, "Subgrid")
        for axis, off in enumerate(offs):
            a = self._axis_call(
                self._lib.swiftly_finish_subgrid, a,
                axis if a.ndim > 1 else 0, subgrid_size, int(off),
                extra=(subgrid_size,),
            )
        return self._merge_out(a, out)

    # -- subgrid -> facet chain ----------------------------------------------

    def prepare_subgrid(self, subgrid, subgrid_off, out=None):
        """Pad + FFT subgrid into image space across all axes (-> FS, xM)."""
        a = self._as_c128(subgrid)
        offs = self._offs_list(subgrid_off, a.ndim, "Subgrid")
        if a.ndim == 2:
            a = np.ascontiguousarray(a)
            out_arr = np.empty((self.xM_size, self.xM_size),
                               dtype=np.complex128)
            in_rs, in_es = _strides(a)
            o_rs, o_es = _strides(out_arr)
            rc = self._lib.swiftly_prepare_subgrid_2d(
                self._handle, _ptr(a), in_rs, in_es, _ptr(out_arr), o_rs,
                o_es, a.shape[0], int(offs[0]), int(offs[1]),
            )
            if rc != 0:
                raise ValueError(f"native kernel failed (rc={rc})")
            return self._merge_out(out_arr, out)
        xA = a.shape[0]
        res = self._axis_call(
            self._lib.swiftly_prepare_subgrid, a, 0, self.xM_size,
            int(offs[0]), extra=(xA,),
        )
        return self._merge_out(res, out)

    def prepare_subgrid_inplace(self, subgrid, subgrid_off, out=None):
        """Reference-parity alias (core.py:837-846): same as
        :meth:`prepare_subgrid` but named for the native in-place entry."""
        return self.prepare_subgrid(subgrid, subgrid_off, out=out)

    def prepare_subgrid_inplace_2d(self, subgrid, subgrid_offs, out=None):
        """Reference-parity alias (core.py:848-855)."""
        return self.prepare_subgrid(subgrid, subgrid_offs, out=out)

    def extract_from_subgrid(self, FSi, facet_off, axis, out=None):
        """Extract subgrid's contribution to a facet (-> NAF)."""
        res = self._axis_call(
            self._lib.swiftly_extract_from_subgrid, FSi, axis,
            self.xM_yN_size, int(facet_off),
        )
        return self._merge_out(res, out)

    def add_to_facet(self, subgrid_contrib, subgrid_off, axis, out=None):
        """Accumulate subgrid contribution into padded facet term."""
        return self._accum_axis_call(
            self._lib.swiftly_add_to_facet, subgrid_contrib, axis,
            self.yN_size, int(subgrid_off), out=out,
        )

    def finish_facet(self, MiNjSi_sum, facet_off, facet_size, axis,
                     out=None):
        """Finish facet along one axis (-> approximate facet, yB)."""
        res = self._axis_call(
            self._lib.swiftly_finish_facet, MiNjSi_sum, axis, facet_size,
            int(facet_off), extra=(facet_size,),
        )
        return self._merge_out(res, out)

    # -- out= protocol ---------------------------------------------------------

    @staticmethod
    def _merge_out(result, out):
        if out is None:
            return result
        if out.shape != result.shape:
            raise ValueError(
                f"Output shape is {out.shape}, expected {result.shape}!"
            )
        out[...] = result
        return out
