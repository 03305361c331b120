"""Numerical ops: array primitives, PSWF window constants, the ten SwiFTly
processing functions (JAX backend), the native C++ backend, and the MXU
operator-algebra backend."""

from .core import SwiftlyCore, check_swiftly_params
from .fft_mxu import factor_pair, fft_mxu
from .native import SwiftlyCoreFunc, native_available
from .primitives import (
    broadcast,
    coordinates,
    create_slice,
    extract_mid,
    fft,
    ifft,
    pad_mid,
    roll_and_extract_mid,
    roll_and_extract_mid_axis,
)
from .pswf import make_window_constants, pswf_values

__all__ = [
    "SwiftlyCore",
    "fft_mxu",
    "factor_pair",
    "SwiftlyCoreFunc",
    "native_available",
    "check_swiftly_params",
    "broadcast",
    "coordinates",
    "create_slice",
    "extract_mid",
    "fft",
    "ifft",
    "pad_mid",
    "roll_and_extract_mid",
    "roll_and_extract_mid_axis",
    "make_window_constants",
    "pswf_values",
]
