"""Tier-2 tests: the ten processing functions against the point-source
oracle (direct DFT), both 1-D and 2-D, with offset sweeps including
negative and wrap-around offsets, and odd tile sizes.

Mirrors the reference's tests/test_core.py (same canonical parameters and
decimal thresholds), parametrised over backends the way the reference
parametrises numpy vs ska_sdp_func.
"""

import itertools

import numpy as np
import pytest

from ska_sdp_distributed_fourier_transform_tpu.models import (
    make_facet_from_sources,
    make_subgrid_from_sources,
)
from ska_sdp_distributed_fourier_transform_tpu.ops import SwiftlyCore
from ska_sdp_distributed_fourier_transform_tpu.swift_configs import (
    SWIFT_CONFIGS,
)

TEST_PARAMS = {
    "W": 13.5625,
    "N": 1024,
    "yB_size": 416,
    "yN_size": 512,
    "xA_size": 228,
    "xM_size": 256,
}

def _native_available():
    from ska_sdp_distributed_fourier_transform_tpu.ops.native import (
        native_available,
    )

    return native_available()


# Both backends, the reference's dual-backend pattern (its test_core.py
# parametrises over ["numpy", "ska_sdp_func"]).
BACKENDS = ["jax"] + (["native"] if _native_available() else [])


def make_core(pars, backend="jax"):
    if backend == "jax":
        return SwiftlyCore(
            pars["W"], pars["N"], pars["xM_size"], pars["yN_size"]
        )
    if backend == "native":
        from ska_sdp_distributed_fourier_transform_tpu.ops.native import (
            SwiftlyCoreFunc,
        )

        return SwiftlyCoreFunc(
            pars["W"], pars["N"], pars["xM_size"], pars["yN_size"]
        )
    raise ValueError(f"Unknown backend {backend}!")


@pytest.mark.parametrize("backend", BACKENDS)
def test_base_params_fundamental(backend):
    core = make_core(TEST_PARAMS, backend)
    assert core.W == TEST_PARAMS["W"]
    assert core.N == TEST_PARAMS["N"]
    assert core.yN_size == TEST_PARAMS["yN_size"]
    assert core.xM_size == TEST_PARAMS["xM_size"]


@pytest.mark.parametrize("backend", BACKENDS)
def test_base_params_derived(backend):
    core = make_core(TEST_PARAMS, backend)
    assert core.xM_yN_size == 128
    assert core.subgrid_off_step == 2
    assert core.facet_off_step == 4


@pytest.mark.parametrize("backend", BACKENDS)
def test_base_params_check_params(backend):
    bad = dict(TEST_PARAMS, N=1050)
    with pytest.raises(ValueError):
        make_core(bad, backend)


@pytest.mark.parametrize("backend", BACKENDS)
def test_swift_configs_constructible(backend):
    """All catalogue configurations below 4k construct successfully."""
    for config in SWIFT_CONFIGS.values():
        if config["N"] < 4 * 1024:
            make_core(config, backend)


@pytest.mark.parametrize("backend", BACKENDS)
@pytest.mark.parametrize(
    "xA_size", [TEST_PARAMS["xA_size"], TEST_PARAMS["xA_size"] - 1]
)
@pytest.mark.parametrize(
    "yB_size", [TEST_PARAMS["yB_size"], TEST_PARAMS["yB_size"] - 1]
)
def test_facet_to_subgrid_basic(xA_size, yB_size, backend):
    """Constant-value subgrid from a centred unit source; decimal=15."""
    N = TEST_PARAMS["N"]
    dft = make_core(TEST_PARAMS, backend)
    Nx = dft.subgrid_off_step
    Ny = dft.facet_off_step

    for val, facet_off in itertools.product(
        [0, 1, 0.1], np.arange(-5 * Ny, 5 * Ny // 2, Ny)
    ):
        facet = np.zeros(yB_size)
        facet[yB_size // 2 - facet_off] = val
        prepped = dft.prepare_facet(facet, facet_off, axis=0)
        for sg_off in np.arange(0, 10 * Nx, 2 * Nx):
            contrib = dft.extract_from_facet(prepped, sg_off, axis=0)
            acc = dft.add_to_subgrid(contrib, facet_off, axis=0)
            subgrid = np.asarray(dft.finish_subgrid(acc, sg_off, xA_size))
            np.testing.assert_array_almost_equal(
                subgrid, val / N, decimal=15
            )


@pytest.mark.parametrize("backend", BACKENDS)
@pytest.mark.parametrize(
    "xA_size", [TEST_PARAMS["xA_size"], TEST_PARAMS["xA_size"] - 1]
)
@pytest.mark.parametrize(
    "yB_size", [TEST_PARAMS["yB_size"], TEST_PARAMS["yB_size"] - 1]
)
def test_facet_to_subgrid_dft_1d(xA_size, yB_size, backend):
    """Facet->subgrid chain vs direct DFT (decimal=8), offsets swept far
    into wrap-around territory both ways."""
    N = TEST_PARAMS["N"]
    dft = make_core(TEST_PARAMS, backend)
    Nx = dft.subgrid_off_step
    Ny = dft.facet_off_step

    for sources, facet_off in itertools.product(
        [
            [(1, 0)],
            [(2, 1)],
            [(1, -3)],
            [(-0.1, 5)],
            [(1 / 8, 20), (2 / 8, 5), (3 / 8, -4)],
            [(1, -yB_size)],  # border - clamped below
            [(1, yB_size)],  # border - clamped below
            [(1 / 16, i) for i in range(-10, 10)],
        ],
        np.arange(-100 * Ny, 100 * Ny, 40 * Ny),
    ):
        min_x = -(yB_size - 1) // 2 + facet_off
        max_x = min_x + yB_size - 1
        sources = [(i, min(max(x, min_x), max_x)) for i, x in sources]

        facet = make_facet_from_sources(sources, N, yB_size, [facet_off])
        assert np.sum(facet) == sum(src[0] for src in sources)
        prepped = dft.prepare_facet(facet, facet_off, axis=0)

        for sg_off in [0, Nx, -Nx, N]:
            contrib = dft.extract_from_facet(prepped, sg_off, axis=0)
            acc = dft.add_to_subgrid(contrib, facet_off, axis=0)
            subgrid = np.asarray(dft.finish_subgrid(acc, sg_off, xA_size))
            expected = make_subgrid_from_sources(sources, N, xA_size, [sg_off])
            np.testing.assert_array_almost_equal(
                subgrid, expected, decimal=8, err_msg=str(sources)
            )


@pytest.mark.parametrize("backend", BACKENDS)
def test_facet_to_subgrid_dft_2d(backend):
    N = TEST_PARAMS["N"]
    xA_size = TEST_PARAMS["xA_size"]
    yB_size = TEST_PARAMS["yB_size"]
    dft = make_core(TEST_PARAMS, backend)
    Nx = dft.subgrid_off_step
    Ny = dft.facet_off_step

    for sources, facet_offs in itertools.product(
        [
            [(1, 1, 2)],
            [(1 / 8, 20, 4), (2 / 8, 2, 5), (3 / 8, -5, -4)],
        ],
        [[0, 0], [Ny, Ny], [-Ny, Ny], [0, -Ny]],
    ):
        facet = make_facet_from_sources(sources, N, yB_size, facet_offs)
        assert np.sum(facet) == sum(src[0] for src in sources)
        prepped0 = dft.prepare_facet(facet, facet_offs[0], axis=0)
        prepped = dft.prepare_facet(prepped0, facet_offs[1], axis=1)

        for sg_offs in [[0, 0], [0, Nx], [Nx, 0], [-Nx, -Nx]]:
            c0 = dft.extract_from_facet(prepped, sg_offs[0], axis=0)
            c = dft.extract_from_facet(c0, sg_offs[1], axis=1)
            a0 = dft.add_to_subgrid(c, facet_offs[0], axis=0)
            a = dft.add_to_subgrid(a0, facet_offs[1], axis=1)
            subgrid = np.asarray(dft.finish_subgrid(a, sg_offs, xA_size))
            expected = make_subgrid_from_sources(sources, N, xA_size, sg_offs)
            np.testing.assert_array_almost_equal(subgrid, expected, decimal=8)


@pytest.mark.parametrize("backend", BACKENDS)
def test_add_to_subgrid_2d_fused(backend):
    """Fused two-axis add matches two single-axis adds."""
    N = TEST_PARAMS["N"]
    yB_size = TEST_PARAMS["yB_size"]
    dft = make_core(TEST_PARAMS, backend)
    Ny = dft.facet_off_step
    sources = [(1, 3, -2)]
    facet = make_facet_from_sources(sources, N, yB_size, [Ny, -Ny])
    prepped0 = dft.prepare_facet(facet, Ny, axis=0)
    prepped = dft.prepare_facet(prepped0, -Ny, axis=1)
    c0 = dft.extract_from_facet(prepped, 0, axis=0)
    c = dft.extract_from_facet(c0, 0, axis=1)
    two_step = dft.add_to_subgrid(
        dft.add_to_subgrid(c, Ny, axis=0), -Ny, axis=1
    )
    fused = dft.add_to_subgrid_2d(c, Ny, -Ny)
    np.testing.assert_allclose(
        np.asarray(fused), np.asarray(two_step), atol=1e-14
    )


@pytest.mark.parametrize("backend", BACKENDS)
@pytest.mark.parametrize(
    "xA_size", [TEST_PARAMS["xA_size"], TEST_PARAMS["xA_size"] - 1]
)
@pytest.mark.parametrize(
    "yB_size", [TEST_PARAMS["yB_size"], TEST_PARAMS["yB_size"] - 1]
)
def test_subgrid_to_facet_basic(xA_size, yB_size, backend):
    """Constant subgrid -> facet value at image centre; decimal=13."""
    dft = make_core(TEST_PARAMS, backend)
    Nx = dft.subgrid_off_step
    Ny = dft.facet_off_step
    sg_offs = Nx * np.arange(-9, 8, 3)
    facet_offs = Ny * np.arange(-9, 8, 3)

    for val, sg_off in itertools.product([0, 1, 0.1], sg_offs):
        prepped = dft.prepare_subgrid(
            (val / xA_size) * np.ones(xA_size), sg_off
        )
        for facet_off in facet_offs:
            extracted = dft.extract_from_subgrid(prepped, facet_off, axis=0)
            accumulated = dft.add_to_facet(extracted, sg_off, axis=0)
            facet = np.asarray(
                dft.finish_facet(accumulated, facet_off, yB_size, axis=0)
            )
            np.testing.assert_array_almost_equal(
                facet[yB_size // 2 - facet_off], val, decimal=13
            )


@pytest.mark.parametrize("backend", BACKENDS)
@pytest.mark.parametrize(
    "xA_size", [TEST_PARAMS["xA_size"], TEST_PARAMS["xA_size"] - 1]
)
@pytest.mark.parametrize(
    "yB_size", [TEST_PARAMS["yB_size"], TEST_PARAMS["yB_size"] - 1]
)
def test_subgrid_to_facet_dft(xA_size, yB_size, backend):
    """Subgrid->facet chain vs source placement (decimal=11 at source
    pixels, bounded leakage elsewhere)."""
    N = TEST_PARAMS["N"]
    dft = make_core(TEST_PARAMS, backend)
    Nx = dft.subgrid_off_step
    Ny = dft.facet_off_step

    source_lists = [[(1, 0)], [(2, 1)], [(1, -3)], [(-0.1, 5)]]
    sg_offs = Nx * np.arange(-9, 8, 4)
    facet_offs = Ny * np.arange(-9, 8, 4)

    for sources, sg_off in itertools.product(source_lists, sg_offs):
        subgrid = (
            make_subgrid_from_sources(sources, N, xA_size, [sg_off])
            / xA_size
            * N
        )
        prepped = dft.prepare_subgrid(subgrid, sg_off)
        for facet_off in facet_offs:
            extracted = dft.extract_from_subgrid(prepped, facet_off, axis=0)
            accumulated = dft.add_to_facet(extracted, sg_off, axis=0)
            facet = np.asarray(
                dft.finish_facet(accumulated, facet_off, yB_size, axis=0)
            )
            expected = make_facet_from_sources(sources, N, yB_size,
                                               [facet_off])
            np.testing.assert_array_almost_equal(
                facet[expected != 0], expected[expected != 0], decimal=11
            )
            if sources[0][0] > 0:
                np.testing.assert_array_less(
                    facet[expected == 0], np.max(expected)
                )
            else:
                np.testing.assert_array_less(
                    -facet[expected == 0], np.max(-expected)
                )


@pytest.mark.parametrize("backend", BACKENDS)
def test_subgrid_to_facet_dft_2d(backend):
    N = TEST_PARAMS["N"]
    xA_size = TEST_PARAMS["xA_size"]
    yB_size = TEST_PARAMS["yB_size"]
    dft = make_core(TEST_PARAMS, backend)
    Nx = dft.subgrid_off_step
    Ny = dft.facet_off_step

    source_lists = [[(1, 0, 0)], [(1, 20, 4)], [(3, -5, 4)]]
    sg_offs = [[0, 0], [0, Nx], [Nx, 0], [-Nx, -Nx]]
    facet_offs = [[0, 0], [Ny, Ny], [-Ny, Ny], [0, -Ny]]

    for sources, sg_off in itertools.product(source_lists, sg_offs):
        subgrid = (
            make_subgrid_from_sources(sources, N, xA_size, sg_off)
            / xA_size
            / xA_size
            * N
            * N
        )
        prepped = dft.prepare_subgrid(subgrid, sg_off)
        for facet_off in facet_offs:
            e0 = dft.extract_from_subgrid(prepped, facet_off[0], axis=0)
            e1 = dft.extract_from_subgrid(e0, facet_off[1], axis=1)
            a0 = dft.add_to_facet(e1, sg_off[0], axis=0)
            a1 = dft.add_to_facet(a0, sg_off[1], axis=1)
            f0 = dft.finish_facet(a1, facet_off[0], yB_size, axis=0)
            f1 = np.asarray(
                dft.finish_facet(f0, facet_off[1], yB_size, axis=1)
            )
            expected = make_facet_from_sources(sources, N, yB_size, facet_off)
            np.testing.assert_array_almost_equal(
                f1[expected != 0], expected[expected != 0], decimal=11
            )
            np.testing.assert_array_less(
                f1[expected == 0], np.max(expected)
            )


@pytest.mark.parametrize("backend", BACKENDS)
def test_out_protocol(backend):
    """out=/add-mode protocol: accumulating ops add, others overwrite."""
    dft = make_core(TEST_PARAMS, backend)
    c = np.ones(dft.xM_yN_size, dtype=complex)
    first = dft.add_to_subgrid(c, 0, axis=0)
    # snapshot: the native backend accumulates into `out` in place (the
    # reference's "do not reuse the parameter" semantics), the JAX
    # backend returns a fresh array
    base = np.array(np.asarray(first))
    second = dft.add_to_subgrid(c, 0, axis=0, out=first)
    np.testing.assert_allclose(np.asarray(second), 2 * base, atol=1e-14)
    with pytest.raises(ValueError):
        dft.add_to_subgrid(c, 0, axis=0, out=np.zeros(3, dtype=complex))


def test_pickle_roundtrip():
    import pickle

    dft = make_core(TEST_PARAMS)
    clone = pickle.loads(pickle.dumps(dft))
    assert repr(clone) == repr(dft)
    np.testing.assert_array_equal(
        np.asarray(clone._Fn), np.asarray(dft._Fn)
    )


def test_wrap_take_slices_matches_gather():
    """The slice-based wrap window equals the gather-based one for all
    wrap positions (both sides of the clamp) and both axes."""
    import jax.numpy as jnp

    from ska_sdp_distributed_fourier_transform_tpu.ops.core import (
        _wrap_take,
        _wrap_take_slices,
    )

    rng = np.random.default_rng(3)
    a = jnp.asarray(rng.normal(size=(12, 17)))
    for axis, n in ((0, 12), (1, 17)):
        size = 5
        for start in range(-n, 2 * n):
            got = np.asarray(_wrap_take_slices(a, start, size, axis))
            want = np.asarray(_wrap_take(a, start, size, axis))
            np.testing.assert_array_equal(got, want, err_msg=f"{axis},{start}")
