"""End-to-end streaming API test (tier 3): stream every subgrid out of
facets and back, assert facet round-trip RMSE < 3e-10 against the
point-source oracle. Mirrors the reference's tests/test_api.py including
the shuffled-order stress for the LRU/recompute path.
"""

import logging
import random

import pytest

from ska_sdp_distributed_fourier_transform_tpu import (
    SwiftlyBackward,
    SwiftlyConfig,
    SwiftlyForward,
    check_facet,
    check_subgrid,
    make_facet,
    make_full_facet_cover,
    make_full_subgrid_cover,
)

log = logging.getLogger("fourier-logger")
log.setLevel(logging.WARNING)

TEST_PARAMS = {
    "W": 13.5625,
    "fov": 1.0,
    "N": 1024,
    "yB_size": 416,
    "yN_size": 512,
    "xA_size": 228,
    "xM_size": 256,
}


@pytest.mark.parametrize(
    "queue_size,lru_forward,lru_backward,shuffle",
    [
        (100, 1, 1, False),
        (100, 2, 1, False),
        (200, 1, 2, False),
        (100, 1, 1, True),
        (200, 1, 2, True),
    ],
)
@pytest.mark.parametrize("backend", ["jax", "ska_sdp_func"])
def test_swiftly_api(queue_size, lru_forward, lru_backward, shuffle,
                     backend):
    """Full forward+backward streaming round trip."""
    sources = [(1, 1, 0)]
    swiftlyconfig = SwiftlyConfig(backend=backend, **TEST_PARAMS)

    subgrid_config_list = make_full_subgrid_cover(swiftlyconfig)
    facets_config_list = make_full_facet_cover(swiftlyconfig)

    facet_tasks = [
        (
            facet_config,
            make_facet(swiftlyconfig.image_size, facet_config, sources),
        )
        for facet_config in facets_config_list
    ]

    fwd = SwiftlyForward(swiftlyconfig, facet_tasks, lru_forward, queue_size)
    bwd = SwiftlyBackward(
        swiftlyconfig, facets_config_list, lru_backward, queue_size
    )
    if shuffle:
        random.seed(queue_size)
        random.shuffle(subgrid_config_list)

    for subgrid_config in subgrid_config_list:
        subgrid_task = fwd.get_subgrid_task(subgrid_config)
        bwd.add_new_subgrid_task(subgrid_config, subgrid_task)

    new_facet_tasks = bwd.finish()

    for new_facet, facet_config in zip(new_facet_tasks, facets_config_list):
        error = check_facet(
            swiftlyconfig.image_size, facet_config, new_facet, sources
        )
        assert error < 3e-10, f"{facet_config}: {error}"


def test_swiftly_forward_subgrid_accuracy():
    """Forward-only: every produced subgrid matches the DFT oracle."""
    sources = [(1, 1, 0)]
    swiftlyconfig = SwiftlyConfig(**TEST_PARAMS)
    subgrid_config_list = make_full_subgrid_cover(swiftlyconfig)
    facets_config_list = make_full_facet_cover(swiftlyconfig)
    facet_tasks = [
        (cfg, make_facet(swiftlyconfig.image_size, cfg, sources))
        for cfg in facets_config_list
    ]
    fwd = SwiftlyForward(swiftlyconfig, facet_tasks, 1, 50)
    for sg_config in subgrid_config_list:
        subgrid = fwd.get_subgrid_task(sg_config)
        err = check_subgrid(
            swiftlyconfig.image_size, sg_config, subgrid, sources
        )
        assert err < 3e-10, f"{sg_config}: {err}"


def test_config_properties_and_validation():
    cfg = SwiftlyConfig(**TEST_PARAMS)
    assert cfg.image_size == 1024
    assert cfg.max_facet_size == 416
    assert cfg.max_subgrid_size == 228
    assert cfg.internal_facet_size == 512
    assert cfg.internal_subgrid_size == 256
    assert cfg.pswf_parameter == 13.5625
    assert cfg.subgrid_off_step == 2
    assert cfg.facet_off_step == 4
    with pytest.raises(ValueError):
        SwiftlyConfig(backend="nonsense", **TEST_PARAMS)
    # legacy/dask-era keys are swallowed
    SwiftlyConfig(Nx=64, yP_size=512, **TEST_PARAMS)


def test_covers_partition():
    """Every image pixel is owned by exactly one tile of each cover."""
    import numpy as np

    cfg = SwiftlyConfig(**TEST_PARAMS)
    N = cfg.image_size
    for cover, size in [
        (make_full_facet_cover(cfg), cfg.max_facet_size),
        (make_full_subgrid_cover(cfg), cfg.max_subgrid_size),
    ]:
        owner = np.zeros((N, N), dtype=int)
        for tile in cover:
            m0, m1 = tile.mask0, tile.mask1
            idx0 = (tile.off0 - size // 2 + np.arange(size)) % N
            idx1 = (tile.off1 - size // 2 + np.arange(size)) % N
            owner[np.ix_(idx0, idx1)] += (
                m0[:, None] * m1[None, :]
            ).astype(int)
        np.testing.assert_array_equal(owner, 1)


def test_lru_cache():
    from ska_sdp_distributed_fourier_transform_tpu import LRUCache

    lru = LRUCache(2)
    assert lru.set("a", 1) == (None, None)
    assert lru.set("b", 2) == (None, None)
    assert lru.get("a") == 1  # refresh: "b" is now oldest
    assert lru.set("c", 3) == ("b", 2)
    assert lru.get("b") is None
    assert dict(lru.pop_all()) == {"a": 1, "c": 3}
    assert lru.get("a") is None


def test_task_queue_backpressure():
    import jax.numpy as jnp

    from ska_sdp_distributed_fourier_transform_tpu import TaskQueue

    q = TaskQueue(4)
    for i in range(10):
        q.process([jnp.ones(8) * i])
        assert len(q.task_queue) <= 4
    done = q.wait_all_done()
    assert len(done) <= 4
    assert q.task_queue == []


@pytest.mark.parametrize(
    "config_key",
    ["1k[1]-n512-256", "2k[1]-n1k-512", "1k[1]-n512-512"],
)
def test_catalogue_families_round_trip(config_key):
    """End-to-end round trip across catalogue families (different W,
    padding ratios and nfacet counts) meets the reference bound."""
    from ska_sdp_distributed_fourier_transform_tpu.swift_configs import (
        SWIFT_CONFIGS,
    )

    params = SWIFT_CONFIGS[config_key]
    config = SwiftlyConfig(**params)
    sources = [(1, 1, 0)]
    facet_configs = make_full_facet_cover(config)
    subgrid_configs = make_full_subgrid_cover(config)
    facet_tasks = [
        (cfg, make_facet(config.image_size, cfg, sources))
        for cfg in facet_configs
    ]
    fwd = SwiftlyForward(config, facet_tasks, 2, 50)
    bwd = SwiftlyBackward(config, facet_configs, 2, 50)
    for sg_cfg in subgrid_configs:
        bwd.add_new_subgrid_task(sg_cfg, fwd.get_subgrid_task(sg_cfg))
    for cfg, approx in zip(facet_configs, bwd.finish()):
        rmse = check_facet(config.image_size, cfg, approx, sources)
        assert rmse < 3e-10, f"{config_key} {cfg}: {rmse}"
