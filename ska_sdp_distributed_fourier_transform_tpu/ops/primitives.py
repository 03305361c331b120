"""Array primitives for the TPU-native SwiFTly engine.

These are the shift-aware pad/extract/FFT helpers that everything else is
built on. Semantics match the reference implementation
(`/root/reference/src/ska_sdp_exec_swiftly/fourier_transform/fourier_algorithm.py`,
see e.g. pad_mid :53-73, extract_mid :76-93, fft :96-107) but are implemented
as pure, statically-shaped JAX functions so they trace cleanly under `jit` /
`vmap` / `shard_map`:

* all pad/extract slice arithmetic happens at *trace time* (Python ints), so
  XLA sees static shapes;
* rolls take *traced* offsets, so a single compiled program serves every
  facet/subgrid offset (the offsets only enter through `jnp.roll` and the
  engine's phase-multiply fast paths);
* the FFT convention is centre-zero everywhere:
  ``fft = fftshift . FFT . ifftshift`` per axis. This convention is
  load-bearing for every SwiFTly op.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = [
    "create_slice",
    "broadcast",
    "pad_mid",
    "extract_mid",
    "fft",
    "ifft",
    "coordinates",
    "roll_and_extract_mid",
    "roll_and_extract_mid_axis",
]


def create_slice(fill_val, axis_val, dims, axis):
    """Build a length-``dims`` tuple with ``axis_val`` in position ``axis``
    and ``fill_val`` everywhere else.

    Used to construct axis-generic index/pad tuples.

    :param fill_val: value used at positions != axis
    :param axis_val: value used at position == axis
    :param dims: number of dimensions (length of the tuple); int
    :param axis: position that receives ``axis_val``; int
    :return: tuple of length ``dims``
    """
    if not isinstance(axis, int) or not isinstance(dims, int):
        raise ValueError(
            "create_slice: axis and dims values have to be integers."
        )
    return tuple(axis_val if d == axis else fill_val for d in range(dims))


def broadcast(a, dims, axis):
    """Reshape a 1-D array so it broadcasts along ``axis`` of a
    ``dims``-dimensional array (insert new axes everywhere else)."""
    return a[create_slice(jnp.newaxis, slice(None), dims, axis)]


def pad_mid(a, n, axis):
    """Zero-pad ``a`` around its centre along ``axis`` up to size ``n``.

    The centre convention places the existing data so that index
    ``old_size // 2`` lands on ``n // 2``.
    """
    a = jnp.asarray(a)
    n0 = a.shape[axis]
    if n == n0:
        return a
    pad_width = create_slice(
        (0, 0),
        (n // 2 - n0 // 2, (n + 1) // 2 - (n0 + 1) // 2),
        a.ndim,
        axis,
    )
    return jnp.pad(a, pad_width, mode="constant", constant_values=0.0)


def extract_mid(a, n, axis):
    """Extract the centred length-``n`` section of ``a`` along ``axis``.

    Inverse of :func:`pad_mid`. For odd ``n`` the extra element is taken
    *after* the centre index ``a.shape[axis] // 2`` (i.e. the slice is
    ``[cx - n//2, cx + n//2 + 1)``), matching the reference's odd-size rule.
    """
    a = jnp.asarray(a)
    assert n <= a.shape[axis]
    cx = a.shape[axis] // 2
    if n % 2 != 0:
        slc = slice(cx - n // 2, cx + n // 2 + 1)
    else:
        slc = slice(cx - n // 2, cx + n // 2)
    return a[create_slice(slice(None), slc, a.ndim, axis)]


def fft(a, axis):
    """Centre-zero Fourier transform (image -> grid space) along ``axis``."""
    a = jnp.asarray(a)
    return jnp.fft.fftshift(
        jnp.fft.fft(jnp.fft.ifftshift(a, axes=axis), axis=axis), axes=axis
    )


def ifft(a, axis):
    """Centre-zero inverse Fourier transform (grid -> image) along ``axis``."""
    a = jnp.asarray(a)
    return jnp.fft.fftshift(
        jnp.fft.ifft(jnp.fft.ifftshift(a, axes=axis), axis=axis), axes=axis
    )


def coordinates(n):
    """Length-``n`` coordinate vector spanning [-0.5, 0.5) with 0 at ``n//2``.

    Returned as a float64 JAX array only when x64 is enabled; dtype follows
    the default float. (Constant-building code paths use the numpy twin in
    :mod:`..ops.pswf` for full precision regardless of the JAX x64 mode.)
    """
    n2 = n // 2
    if n % 2 == 0:
        return jnp.arange(-n2, n2) / n
    return jnp.arange(-n2, n2 + 1) / n


def roll_and_extract_mid(shape, offset, true_usable_size):
    """Compute the 1-2 wrap-aware slices equivalent to
    ``extract_mid(roll(x, -offset), true_usable_size)`` on a length-``shape``
    axis, without materialising the roll.

    :param shape: full axis size (int)
    :param offset: roll offset (int)
    :param true_usable_size: extraction size (int)
    :return: list of 1 or 2 ``slice`` objects into the *unrolled* array
    """
    centre = shape // 2
    start = centre + offset - true_usable_size // 2
    if true_usable_size % 2 != 0:
        end = centre + offset + true_usable_size // 2 + 1
    else:
        end = centre + offset + true_usable_size // 2

    if end <= 0:
        slices = [slice(start + shape, end + shape)]
    elif start < 0 < end:
        slices = [slice(0, end), slice(start + shape, shape)]
    elif end <= shape and start >= 0:
        slices = [slice(start, end)]
    elif start < shape < end:
        slices = [slice(start, shape), slice(0, end - shape)]
    elif start >= shape:
        slices = [slice(start - shape, end - shape)]
    else:
        raise ValueError("unsupported slice")
    return slices


def roll_and_extract_mid_axis(data, offset, true_usable_size, axis):
    """Apply :func:`roll_and_extract_mid` along ``axis`` of ``data``.

    Assembles the 1-2 contiguous source ranges in slice-list order (the
    reference's assembly convention) instead of materialising
    ``jnp.roll(data, -offset, axis)``; for the covering offsets used by the
    engine (0 <= offset < axis size) this equals roll-then-extract.
    """
    data = jnp.asarray(data)
    slice_list = roll_and_extract_mid(
        data.shape[axis], offset, true_usable_size
    )
    pieces = [
        data[create_slice(slice(None), slc, data.ndim, axis)]
        for slc in slice_list
    ]
    if len(pieces) == 1:
        out = pieces[0]
    else:
        out = jnp.concatenate(pieces, axis=axis)
    assert out.shape[axis] == true_usable_size
    return out
