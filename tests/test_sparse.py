"""Tests for sparse facet covers (circular field of view)."""

import numpy as np
import pytest

from ska_sdp_distributed_fourier_transform_tpu import (
    SwiftlyBackward,
    SwiftlyConfig,
    SwiftlyForward,
    check_facet,
    make_facet,
    make_full_subgrid_cover,
)
from ska_sdp_distributed_fourier_transform_tpu.sparse import (
    calc_nfacet_and_off1,
    calc_off0_per_row,
    fov_sparse_cover_off_mask,
    make_sparse_facet_cover,
)

TEST_PARAMS = dict(
    W=13.5625, fov=1.0, N=1024, yB_size=416, yN_size=512, xA_size=228,
    xM_size=256,
)


@pytest.fixture(scope="module")
def config():
    return SwiftlyConfig(**TEST_PARAMS)


def test_off0_row_layout():
    # odd count: one facet at 0, pairs mirrored mod N
    offs = calc_off0_per_row(416, 3, 1024)
    assert offs == [0, 416, 1024 - 416]
    # even count: straddle the centre at +-yB/2
    offs = calc_off0_per_row(416, 2, 1024)
    assert offs == [208, 1024 - 208]


def test_nfacet_rows_cover_circle():
    rows = calc_nfacet_and_off1(416, int(2.12 * 416), 1024)
    # FoV of 2.12 facets needs 3 rows: centre + one either side
    offs = sorted(o for _, o in rows)
    assert len(rows) == 3
    assert 0 in offs
    # every row's facets span at least the circle's chord at that row
    for nfacet, off1 in rows:
        assert nfacet >= 1


def test_sparse_cover_validates_alignment(config):
    with pytest.raises(ValueError, match="offset step"):
        fov_sparse_cover_off_mask(config, 880, x=1)


def test_sparse_cover_counts(config):
    facets = make_sparse_facet_cover(config, int(2.12 * 416))
    # reference layout: 3 rows of (2, 3, 2) facets = 7
    assert len(facets) == 7
    step = config.facet_off_step
    for cfg in facets:
        assert cfg.off0 % step == 0 and cfg.off1 % step == 0
        assert cfg.size == 416


def test_sparse_round_trip(config):
    """Sources inside the FoV round-trip through a sparse cover below the
    reference accuracy bound."""
    facets_config_list = make_sparse_facet_cover(config, int(2.12 * 416))
    subgrid_configs = make_full_subgrid_cover(config)
    # central sources (the reference demo's layout,
    # demo_sparse_facet.py:247); sparse tiles carry no boundary-blend
    # masks, so edge-adjacent sources would see the scheme's larger
    # tile-edge approximation error
    sources = [(1, i + 1, i) for i in range(3)]

    facet_tasks = [
        (cfg, make_facet(config.image_size, cfg, sources))
        for cfg in facets_config_list
    ]
    fwd = SwiftlyForward(config, facet_tasks, 2, 50)
    bwd = SwiftlyBackward(config, facets_config_list, 2, 50)
    for sg_cfg in subgrid_configs:
        bwd.add_new_subgrid_task(sg_cfg, fwd.get_subgrid_task(sg_cfg))
    approx_facets = bwd.finish()

    # Sparse tiles have no boundary-blend masks, so the scheme's
    # tile-edge error is fully visible (~5e-10 here); the reference demo
    # logs these errors without asserting a bound.
    for cfg, approx in zip(facets_config_list, approx_facets):
        rmse = check_facet(config.image_size, cfg, approx, sources)
        assert rmse < 1e-9, f"{cfg}: {rmse}"


@pytest.mark.parametrize("engine_mode", ["fft", "matmul"])
def test_sparse_round_trip_sharded(config, engine_mode):
    """Sparse facet covers through the dense sharded engine: the masks
    and per-facet offsets make sparse a special case of dense
    (reference equivalent: demo_sparse_facet.py:184-290)."""
    from ska_sdp_distributed_fourier_transform_tpu.parallel import (
        ShardedSwiftly,
        make_tile_mesh,
    )

    facets_config_list = make_sparse_facet_cover(config, int(2.12 * 416))
    subgrid_configs = make_full_subgrid_cover(config)
    sources = [(1, i + 1, i) for i in range(3)]
    facets = [
        make_facet(config.image_size, cfg, sources)
        for cfg in facets_config_list
    ]
    engine = ShardedSwiftly(
        config._core, facets_config_list, subgrid_configs,
        make_tile_mesh(), engine_mode=engine_mode,
    )
    packed = engine.pack_facets(facets)
    out, n = engine.roundtrip(packed)
    assert n == len(subgrid_configs)
    for i, cfg in enumerate(facets_config_list):
        rmse = check_facet(
            config.image_size, cfg, np.asarray(out[i]), sources
        )
        assert rmse < 1e-9, f"{cfg}: {rmse}"


def test_sparse_round_trip_streamed(config):
    """Sparse covers also run through the host-streamed tier."""
    from ska_sdp_distributed_fourier_transform_tpu.parallel import (
        StreamedSwiftly,
    )

    facets_config_list = make_sparse_facet_cover(config, int(2.12 * 416))
    subgrid_configs = make_full_subgrid_cover(config)
    sources = [(1, i + 1, i) for i in range(3)]
    facets = [
        make_facet(config.image_size, cfg, sources)
        for cfg in facets_config_list
    ]
    engine = StreamedSwiftly(
        config._core, facets_config_list, subgrid_configs
    )
    out, n = engine.roundtrip(facets)
    assert n == len(subgrid_configs)
    for i, cfg in enumerate(facets_config_list):
        rmse = check_facet(config.image_size, cfg, out[i], sources)
        assert rmse < 1e-9, f"{cfg}: {rmse}"
