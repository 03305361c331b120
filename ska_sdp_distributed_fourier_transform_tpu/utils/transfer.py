"""Host<->device transfer helpers that avoid complex-typed transfers.

Some TPU attachment paths (notably tunnelled single-chip setups) implement
float transfers but not complex ones — any host<->device movement of a
complex array raises ``UNIMPLEMENTED``. Compute with complex on device is
fine. These helpers route all transfers through real/imag float pairs and
(re)combine on the device/host, so the rest of the framework can stay
complex end-to-end.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "put_complex",
    "get_complex",
    "put_complex_local",
    "get_complex_local_shards",
    "device_rmse",
]


@functools.lru_cache(maxsize=None)
def _combine_fn(sharding, cdtype):
    @functools.partial(jax.jit, out_shardings=sharding)
    def combine(re, im):
        return (re + 1j * im).astype(cdtype)

    return combine


@functools.lru_cache(maxsize=None)
def _split_fn():
    @jax.jit
    def split(x):
        return jnp.real(x), jnp.imag(x)

    return split


def put_complex(arr, sharding=None, dtype=jnp.complex64):
    """Place a host complex array on device(s) via float transfers.

    :param arr: host numpy array (complex or real)
    :param sharding: optional `jax.sharding.Sharding` for the result
    :param dtype: target complex dtype
    :return: complex device array
    """
    arr = np.asarray(arr)
    rdtype = jnp.finfo(jnp.dtype(dtype)).dtype
    re = jax.device_put(np.ascontiguousarray(arr.real, dtype=rdtype))
    im = jax.device_put(np.ascontiguousarray(arr.imag, dtype=rdtype))
    return _combine_fn(sharding, jnp.dtype(dtype))(re, im)


def get_complex(x) -> np.ndarray:
    """Fetch a complex device array to host via float transfers."""
    re, im = _split_fn()(x)
    return np.asarray(re) + 1j * np.asarray(im)


@functools.lru_cache(maxsize=None)
def _combine_global_fn(sharding, cdtype):
    @functools.partial(
        jax.jit,
        in_shardings=(sharding, sharding),
        out_shardings=sharding,
    )
    def combine(re, im):
        return (re + 1j * im).astype(cdtype)

    return combine


def put_complex_local(local_arr, sharding, dtype=jnp.complex64):
    """Assemble a *global* sharded complex array from this process's
    local shard data (multi-process SPMD: each process passes only the
    rows its addressable devices own under ``sharding``), via float
    transfers. Single-process it is equivalent to :func:`put_complex`.
    """
    local_arr = np.asarray(local_arr)
    rdtype = jnp.finfo(jnp.dtype(dtype)).dtype
    re = jax.make_array_from_process_local_data(
        sharding, np.ascontiguousarray(local_arr.real, dtype=rdtype)
    )
    im = jax.make_array_from_process_local_data(
        sharding, np.ascontiguousarray(local_arr.imag, dtype=rdtype)
    )
    return _combine_global_fn(sharding, jnp.dtype(dtype))(re, im)


@functools.lru_cache(maxsize=None)
def _split_keep_fn(sharding):
    @functools.partial(
        jax.jit, out_shardings=(sharding, sharding)
    )
    def split(x):
        return jnp.real(x), jnp.imag(x)

    return split


def get_complex_local_shards(x):
    """Fetch only this process's addressable shards of a global complex
    array, via float transfers.

    :return: list of ``(index, np_complex)`` — ``index`` is the global
        slice tuple of the shard (as in ``Array.addressable_shards``)
    """
    re, im = _split_keep_fn(x.sharding)(x)
    out = []
    im_by_dev = {s.device: s for s in im.addressable_shards}
    for sre in re.addressable_shards:
        sim = im_by_dev[sre.device]
        out.append(
            (sre.index, np.asarray(sre.data) + 1j * np.asarray(sim.data))
        )
    return out


@jax.jit
def device_rmse(a, b):
    """Root-mean-square difference, computed on device, returned as a real
    scalar (safe to transfer)."""
    d = a - b
    return jnp.sqrt(jnp.mean(jnp.real(d) ** 2 + jnp.imag(d) ** 2))
