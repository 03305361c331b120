"""Checkpoint / resume for streaming runs.

The reference declares h5py and its pre-1.0 drivers wrote produced
subgrids to HDF5, but v1.0 dropped the capability (reference
pyproject.toml:28, scripts/README.md:14-19). Here it is a first-class
subsystem: persist tile arrays and mid-stream engine state so a long
facet->subgrid->facet run can resume after preemption — the normal
operating mode on large TPU pods.

Complex device arrays are pulled/pushed through the float-pair transfer
path (complex host<->device transfers are unimplemented on some TPU
attachments). HDF5 when h5py is importable, ``.npz`` otherwise.
"""

from __future__ import annotations

import json
import os

import numpy as np

from .transfer import get_complex, put_complex

__all__ = [
    "save_checkpoint",
    "load_checkpoint",
    "StreamCheckpointer",
]


def _has_h5py():
    try:
        import h5py  # noqa: F401

        return True
    except Exception:
        return False


def save_checkpoint(path, arrays, meta=None):
    """Write named arrays + a JSON-serialisable meta dict atomically.

    :param path: target file (``.h5`` via h5py when available, else
        ``.npz`` semantics regardless of suffix)
    :param arrays: dict name -> array (numpy or jax, complex fine)
    :param meta: dict of JSON-serialisable run state
    """
    host = {}
    for name, arr in arrays.items():
        if arr is None:
            continue
        if hasattr(arr, "addressable_shards"):  # jax array
            if not getattr(arr, "is_fully_addressable", True):
                # Multi-host (pod) case: shards live on devices of other
                # processes — np.asarray would raise. Gather the global
                # array to every host first.
                from jax.experimental.multihost_utils import (
                    process_allgather,
                )

                if np.issubdtype(
                    np.dtype(arr.dtype), np.complexfloating
                ):
                    import jax.numpy as jnp

                    re = process_allgather(jnp.real(arr), tiled=True)
                    im = process_allgather(jnp.imag(arr), tiled=True)
                    host[name] = np.asarray(re) + 1j * np.asarray(im)
                else:
                    host[name] = np.asarray(
                        process_allgather(arr, tiled=True)
                    )
            elif np.issubdtype(
                np.dtype(arr.dtype), np.complexfloating
            ):
                host[name] = get_complex(arr)
            else:
                host[name] = np.asarray(arr)
        else:
            host[name] = np.asarray(arr)
    meta_json = json.dumps(meta or {})

    tmp = f"{path}.tmp"
    if _has_h5py():
        import h5py

        with h5py.File(tmp, "w") as fh:
            for name, arr in host.items():
                fh.create_dataset(name, data=arr)
            fh.attrs["meta"] = meta_json
    else:
        np.savez(tmp, __meta__=meta_json, **host)
        if os.path.exists(tmp + ".npz"):  # np.savez appends suffix
            os.replace(tmp + ".npz", tmp)
    os.replace(tmp, path)


def input_digest(arrays, max_samples=1 << 20):
    """Cheap deterministic digest of input arrays for checkpoint
    identity checks: shapes/dtypes plus a strided value sample (bounded
    work even for 128k-scale facets). Guards against resuming an
    accumulator computed from *different* inputs — geometry fingerprints
    alone cannot tell two source lists apart."""
    import hashlib

    h = hashlib.sha256()
    for a in arrays:
        a = np.asarray(a)
        h.update(repr((a.shape, str(a.dtype))).encode())
        flat = a.reshape(-1)
        step = max(1, flat.size // max_samples)
        h.update(np.ascontiguousarray(flat[::step]).tobytes())
    return h.hexdigest()


def load_checkpoint(path):
    """Read a checkpoint written by :func:`save_checkpoint`.

    :return: ``(arrays, meta)`` — host numpy arrays and the meta dict
    """
    if _has_h5py():
        import h5py

        try:
            with h5py.File(path, "r") as fh:
                arrays = {name: np.asarray(fh[name]) for name in fh}
                meta = json.loads(fh.attrs.get("meta", "{}"))
                return arrays, meta
        except OSError:
            pass  # not an HDF5 file — fall through to npz
    with np.load(path, allow_pickle=False) as data:
        meta = json.loads(str(data["__meta__"]))
        arrays = {k: data[k] for k in data.files if k != "__meta__"}
        return arrays, meta


class StreamCheckpointer:
    """Periodic checkpointing for a :class:`..parallel.ShardedSwiftly`
    stream.

    The sharded stream's entire mutable state is the facet accumulator
    plus the next column index, so checkpointing is one array + one int:

    >>> ckpt = StreamCheckpointer(engine, "/path/run.h5", every=8)
    >>> accum, start = ckpt.resume()          # fresh or restored
    >>> for ci in range(start, engine.plan.n_columns):
    ...     sg = engine.forward_column(BF_F, ci)
    ...     accum = engine.backward_column(sg, ci, accum)
    ...     accum = ckpt.step(accum, ci)
    """

    def __init__(self, engine, path, every=8, extra=None):
        self.engine = engine
        self.path = path
        self.every = every
        #: JSON-serialisable run identity (sources, engine mode, input
        #: digest, ...) — the geometry fingerprint cannot distinguish
        #: two runs of the same config on different inputs. Compared
        #: tolerantly: checkpoints written before this field existed
        #: are still accepted.
        self.extra = extra

    def _fingerprint(self):
        core = self.engine.core
        return {
            "N": core.N, "yN_size": core.yN_size,
            "xM_size": core.xM_size, "W": core.W,
            "F_pad": self.engine.F_pad,
            "n_columns": self.engine.plan.n_columns,
            # bump when the accumulator carry layout changes (v2 = the
            # c-row padded pair layout for the DUS fold)
            "acc_layout": 2,
        }

    def _extra_matches(self, meta):
        if self.extra is None:
            return True
        saved = meta.get("extra_fingerprint")
        if saved is None:
            return True  # pre-field checkpoint — accept
        norm = json.loads(json.dumps(self.extra))
        return saved == norm

    def resume(self):
        """Return ``(accumulator, next_column)`` — restored from the
        checkpoint when one exists and matches the engine, else fresh."""
        if os.path.exists(self.path):
            arrays, meta = load_checkpoint(self.path)
            if (meta.get("fingerprint") == self._fingerprint()
                    and self._extra_matches(meta)):
                accum = put_complex(
                    arrays["accum"], self.engine._shard,
                    dtype=self.engine.core.dtype,
                )
                return accum, int(meta["next_column"])
        return self.engine.zero_accumulator(), 0

    def step(self, accum, col_index):
        """Checkpoint after ``col_index`` if due; returns ``accum``."""
        done = col_index + 1
        if done % self.every == 0 or \
                done == self.engine.plan.n_columns:
            save_checkpoint(
                self.path,
                {"accum": accum},
                {
                    "next_column": done,
                    "fingerprint": self._fingerprint(),
                    "extra_fingerprint": self.extra,
                },
            )
        return accum

    # --------------------------------------------- fused-stream (pair) API

    def resume_stream(self, engine):
        """Return ``(acc_pair, next_column)`` for the fused stream's f32
        (re, im) accumulator-pair carry — restored when a matching
        checkpoint exists, else fresh. Used by
        :meth:`..parallel.ShardedSwiftly.roundtrip_checkpointed`."""
        if os.path.exists(self.path):
            arrays, meta = load_checkpoint(self.path)
            if (
                meta.get("fingerprint") == self._fingerprint()
                and self._extra_matches(meta)
                and "accum_pair" in arrays
            ):
                import jax

                acc = jax.device_put(
                    arrays["accum_pair"], engine._pair_shard
                )
                return acc, int(meta["next_column"])
        return engine.zero_accumulator_pair(), 0

    def step_stream(self, acc_pair, columns_done):
        """Checkpoint the accumulator pair after ``columns_done`` columns;
        returns ``acc_pair``. The pair is float, so the save path needs no
        complex transfer support."""
        save_checkpoint(
            self.path,
            {"accum_pair": acc_pair},
            {
                "next_column": int(columns_done),
                "fingerprint": self._fingerprint(),
                "extra_fingerprint": self.extra,
            },
        )
        return acc_pair
