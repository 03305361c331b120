"""Streaming API for the distributed Fourier transform.

Surface parity with the reference
(`/root/reference/src/ska_sdp_exec_swiftly/api.py`): ``FacetConfig``,
``SubgridConfig``, ``SwiftlyConfig``, ``SwiftlyForward``,
``SwiftlyBackward``, ``TaskQueue``, ``LRUCache``, and the full-cover
generators — but the runtime underneath is JAX, not Dask:

* graph construction + scheduler-mediated pulls become *eager async
  dispatch*: every op call enqueues compiled XLA work and returns a future
  (a `jax.Array`); streaming order is the caller's loop order, exactly like
  the reference's task submission order;
* ``client.persist`` becomes device residency (arrays simply stay on
  device); ``client.scatter(core, broadcast=True)`` becomes replicated
  device constants;
* ``TaskQueue`` keeps its role — bounded dispatch-ahead — implemented by
  blocking on the oldest in-flight array instead of ``distributed.wait``;
* the column LRU caches (forward ``NMBF_BF`` reuse, backward eviction-
  driven accumulation) are preserved unchanged — they are the streaming
  flow-control design, not a Dask artefact.

For dense multi-chip execution use :mod:`.parallel` (shard_map engine);
this module is the tile-at-a-time streaming API.
"""

from __future__ import annotations

import logging
from collections import OrderedDict

import jax

from .api_helper import (
    accumulate_column,
    accumulate_facet,
    extract_column,
    finish_facet,
    make_full_cover_config,
    make_mask_from_slice,
    prepare_and_split_subgrid,
    sum_and_finish_subgrid,
)
from .ops import SwiftlyCore

__all__ = [
    "FacetConfig",
    "SubgridConfig",
    "SwiftlyConfig",
    "SwiftlyForward",
    "SwiftlyBackward",
    "TaskQueue",
    "LRUCache",
    "make_full_facet_cover",
    "make_full_subgrid_cover",
]

log = logging.getLogger("fourier-logger")
log.setLevel(logging.INFO)


class _TileConfig:
    """Tile descriptor: offsets, size, lazy boundary masks.

    Masks are stored as ``[slice_list, size]`` and materialised on access —
    cheap to hold in bulk (reference: api.py:39-104)."""

    def __init__(self, off0, off1, size, mask0=None, mask1=None):
        self.off0 = off0
        self.off1 = off1
        self.size = size
        self._mask0 = mask0
        self._mask1 = mask1

    @property
    def mask0(self):
        """Vertical (axis-0) tile mask."""
        if isinstance(self._mask0, list):
            return make_mask_from_slice(self._mask0[0], self._mask0[1])
        return self._mask0

    @property
    def mask1(self):
        """Horizontal (axis-1) tile mask."""
        if isinstance(self._mask1, list):
            return make_mask_from_slice(self._mask1[0], self._mask1[1])
        return self._mask1

    def __repr__(self):
        return (
            f"{self.__class__.__name__}(off0={self.off0}, off1={self.off1}, "
            f"size={self.size})"
        )


class FacetConfig(_TileConfig):
    """Facet (image-plane tile) configuration."""


class SubgridConfig(_TileConfig):
    """Subgrid (uv-plane tile) configuration."""


class SwiftlyConfig:
    """Bundles algorithm parameters with a backend core.

    Accepts the reference's constructor surface (api.py:107-147) including
    legacy/dask-era keyword arguments, which are ignored: there is no
    scheduler to attach to — the "cluster" is the local device set.

    :param backend: "jax" (default) for the XLA core; "native" for the
        C++ backend (:class:`..ops.native.SwiftlyCoreFunc`). The reference
        aliases are accepted: "numpy" maps to the JAX core,
        "ska_sdp_func" to the native one.
    :param dtype: complex dtype override for the core.
    """

    _BACKENDS = ("jax", "numpy", "native", "ska_sdp_func")

    def __init__(
        self,
        W: float,
        fov: float,
        N: int,
        yB_size: int,
        yN_size: int,
        xA_size: int,
        xM_size: int,
        dask_client=None,  # accepted for drop-in compatibility; unused
        backend="jax",
        dtype=None,
        **_other_args,
    ):
        self._W = W
        self._fov = fov
        self._N = N
        self._yB_size = yB_size
        self._yN_size = yN_size
        self._xA_size = xA_size
        self._xM_size = xM_size
        self.dask_client = dask_client

        if backend not in self._BACKENDS:
            raise ValueError(f"Unknown SwiFTly backend: {backend}")
        if backend in ("native", "ska_sdp_func"):
            from .ops.native import SwiftlyCoreFunc

            self._core = SwiftlyCoreFunc(W, N, xM_size, yN_size,
                                         dtype=dtype)
        else:
            self._core = SwiftlyCore(W, N, xM_size, yN_size, dtype=dtype)

        # The reference broadcast-scatters the core to every worker and
        # writes graph nodes as method calls on the scattered handle
        # (api.py:145-147). Here the window constants already live on
        # device and methods dispatch eagerly, so the handle is the core.
        self.core_task = self._core

    @property
    def image_size(self):
        """Size of the entire (virtual) image in pixels."""
        return self._N

    @property
    def max_facet_size(self):
        """Maximum size of a facet in pixels."""
        return self._yB_size

    @property
    def max_subgrid_size(self):
        """Maximum size of a subgrid in pixels."""
        return self._xA_size

    @property
    def pswf_parameter(self):
        """Window-function parameter (accuracy/padding trade-off)."""
        return self._W

    @property
    def internal_facet_size(self):
        """Padded facet size used internally."""
        return self._yN_size

    @property
    def internal_subgrid_size(self):
        """Padded subgrid size used internally."""
        return self._xM_size

    @property
    def facet_off_step(self):
        """Base facet offset; all facet offsets are multiples of it."""
        return self._core.facet_off_step

    @property
    def subgrid_off_step(self):
        """Base subgrid offset; all subgrid offsets are multiples of it."""
        return self._core.subgrid_off_step


class SwiftlyForward:
    """Facet -> subgrid streaming engine.

    Holds per-facet prepared buffers (``BF_F``, computed once), LRU-caches
    per-column intermediates (``NMBF_BF``, keyed by subgrid off0) and emits
    one approximate subgrid per request, throttled by :class:`TaskQueue`
    (reference: api.py:217-324).
    """

    def __init__(self, swiftly_config, facet_tasks, lru_forward=1,
                 queue_size=20, client=None):
        self.config = swiftly_config
        self.facet_tasks = list(facet_tasks)
        self.BF_Fs_persist = None
        self.task_queue = TaskQueue(queue_size)
        self.lru = LRUCache(lru_forward)

    def get_subgrid_task(self, subgrid_config):
        """Produce the approximate subgrid for one subgrid config."""
        BF_Fs = self._get_BF_Fs()
        NMBF_BFs = self.get_NMBF_BFs_off0(subgrid_config.off0, BF_Fs)
        approx_subgrid = self._gen_subgrid(subgrid_config, NMBF_BFs)
        self.task_queue.process([approx_subgrid])
        return approx_subgrid

    def _gen_subgrid(self, subgrid_config, NMBF_BFs_off0):
        core = self.config.core_task
        NMBF_NMBFs = [
            core.extract_from_facet(NMBF_BF, subgrid_config.off1, axis=1)
            for NMBF_BF in NMBF_BFs_off0
        ]
        return sum_and_finish_subgrid(
            core,
            NMBF_NMBFs,
            [cfg for cfg, _ in self.facet_tasks],
            subgrid_config,
        )

    def _get_BF_Fs(self):
        """Prepare per-facet BF_F buffers once; they stay device-resident
        for the whole stream (the reference pins them with persist)."""
        if self.BF_Fs_persist is None:
            core = self.config.core_task
            self.BF_Fs_persist = [
                core.prepare_facet(facet_data, cfg.off0, axis=0)
                for cfg, facet_data in self.facet_tasks
            ]
        return self.BF_Fs_persist

    def get_NMBF_BFs_off0(self, off0, BF_Fs):
        """Column intermediates for subgrid column ``off0`` (LRU-cached:
        the axis-1 re-preparation is the expensive step the cache
        amortises across the subgrids of a column)."""
        NMBF_BFs = self.lru.get(off0)
        if NMBF_BFs is None:
            core = self.config.core_task
            NMBF_BFs = [
                extract_column(core, BF_F, off0, cfg.off1)
                for (cfg, _), BF_F in zip(self.facet_tasks, BF_Fs)
            ]
            self.lru.set(off0, NMBF_BFs)
        return NMBF_BFs


class SwiftlyBackward:
    """Subgrid -> facet streaming engine.

    Accepts subgrids one at a time, splits each into per-facet
    contributions, accumulates per-column buffers in an LRU whose
    *eviction* folds the column into per-facet accumulators;
    :meth:`finish` drains the cache and finishes all facets
    (reference: api.py:327-463).
    """

    def __init__(self, swiftly_config, facets_config_list, lru_backward=1,
                 queue_size=20, client=None):
        self.config = swiftly_config
        self.facets_config_list = list(facets_config_list)
        self.MNAF_BMNAFs_persist = [None] * len(self.facets_config_list)
        self.task_queue = TaskQueue(queue_size)
        self.lru = LRUCache(lru_backward)

    def add_new_subgrid_task(self, subgrid_config, new_subgrid_task):
        """Fold one (approximate) subgrid into the facet accumulators."""
        off0 = subgrid_config.off0
        off1 = subgrid_config.off1
        NAF_NAFs = prepare_and_split_subgrid(
            self.config.core_task,
            new_subgrid_task,
            [off0, off1],
            self.facets_config_list,
        )
        tasks = self.update_off0_NAF_MNAFs(off0, off1, NAF_NAFs)
        self.task_queue.process(tasks)
        return tasks

    def finish(self):
        """Drain the column cache and finish every facet."""
        for oldest_off0, oldest_NAF_MNAFs in self.lru.pop_all():
            done = self.update_MNAF_BMNAFs(oldest_off0, oldest_NAF_MNAFs)
            self.task_queue.process(done)

        approx_facets = [
            finish_facet(self.config.core_task, MNAF_BMNAF, facet_config)
            for facet_config, MNAF_BMNAF in zip(
                self.facets_config_list, self.MNAF_BMNAFs_persist
            )
        ]
        self.task_queue.process(approx_facets)
        self.task_queue.wait_all_done()
        return approx_facets

    def update_off0_NAF_MNAFs(self, off0, off1, new_NAF_NAFs):
        """Accumulate one subgrid into its column buffers; if this evicts
        the least-recently-used column, fold that column into the facet
        accumulators (the eviction return value drives the dataflow)."""
        old = self.lru.get(off0)
        if old is None:
            old = [None] * len(self.facets_config_list)
        new_NAF_MNAFs = [
            accumulate_column(self.config.core_task, new, prev, off1)
            for new, prev in zip(new_NAF_NAFs, old)
        ]
        tasks = [new_NAF_MNAFs]
        oldest_off0, oldest_NAF_MNAFs = self.lru.set(off0, new_NAF_MNAFs)
        if oldest_off0 is not None and oldest_NAF_MNAFs is not None:
            tasks.append(self.update_MNAF_BMNAFs(oldest_off0,
                                                 oldest_NAF_MNAFs))
        return tasks

    def update_MNAF_BMNAFs(self, off0, new_NAF_MNAFs):
        """Fold a finished column into the per-facet accumulators."""
        self.MNAF_BMNAFs_persist = [
            accumulate_facet(
                self.config.core_task,
                new_NAF_MNAF,
                MNAF_BMNAF,
                facet_config,
                off0,
            )
            for facet_config, new_NAF_MNAF, MNAF_BMNAF in zip(
                self.facets_config_list,
                new_NAF_MNAFs,
                self.MNAF_BMNAFs_persist,
            )
        ]
        return self.MNAF_BMNAFs_persist


class TaskQueue:
    """Bounded dispatch-ahead (the streaming flow control).

    JAX dispatch is asynchronous: every op call above returned immediately
    with a future-backed array. This queue bounds how far the Python loop
    may run ahead of the devices — the exact role the reference's
    ``TaskQueue`` + ``distributed.wait(FIRST_COMPLETED)`` plays
    (api.py:466-522) — by blocking on the oldest in-flight array when full.
    """

    def __init__(self, max_task, client=None):
        self.task_queue = []
        self.max_task = max_task

    @staticmethod
    def _leaves(task_list):
        leaves = []
        for task in task_list:
            if isinstance(task, (list, tuple)):
                leaves.extend(TaskQueue._leaves(task))
            elif task is not None:
                leaves.append(task)
        return leaves

    def process(self, task_list):
        """Track new in-flight arrays, blocking while the queue is full."""
        done = []
        new = self._leaves(task_list)
        while len(self.task_queue) + len(new) > self.max_task and \
                self.task_queue:
            oldest = self.task_queue.pop(0)
            jax.block_until_ready(oldest)
            done.append(oldest)
        self.task_queue.extend(new)
        return done

    def wait_all_done(self):
        """Block until every tracked array has materialised."""
        done = self.task_queue
        jax.block_until_ready(done)
        self.task_queue = []
        return done


class LRUCache:
    """Ordered-dict LRU with the eviction-driving contract: ``set``
    returns the evicted ``(key, value)`` when over capacity — the
    backward engine folds the evicted column on that signal (same
    contract as reference api.py:525-590; insertion order in an
    ``OrderedDict`` is the recency queue)."""

    def __init__(self, cache_size):
        self.cache_size = cache_size
        self._entries = OrderedDict()

    def get(self, key):
        """Look up a key, refreshing its recency on hit."""
        if key not in self._entries:
            return None
        self._entries.move_to_end(key)
        return self._entries[key]

    def set(self, key, value):
        """Insert/refresh a key; returns the evicted ``(key, value)``
        pair when the cache overflows, else ``(None, None)``."""
        self._entries[key] = value
        self._entries.move_to_end(key)
        if len(self._entries) <= self.cache_size:
            return None, None
        return self._entries.popitem(last=False)

    def pop_all(self):
        """Drain the cache oldest-first, yielding (key, value) pairs."""
        while self._entries:
            yield self._entries.popitem(last=False)


def make_full_subgrid_cover(swiftlyconfig):
    """Full-image subgrid cover for a configuration."""
    return make_full_cover_config(
        swiftlyconfig.image_size,
        swiftlyconfig.max_subgrid_size,
        SubgridConfig,
    )


def make_full_facet_cover(swiftlyconfig):
    """Full-image facet cover for a configuration."""
    return make_full_cover_config(
        swiftlyconfig.image_size,
        swiftlyconfig.max_facet_size,
        FacetConfig,
    )
