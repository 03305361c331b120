"""Unit tests for the array primitives (tier 1 of the reference's test
strategy — hand-written tiny-array expectations plus oracle
self-consistency; reference: tests/test_fourier_algorithm.py)."""

import jax.numpy as jnp
import numpy as np
import pytest

from ska_sdp_distributed_fourier_transform_tpu.models import (
    generate_masks,
    make_facet_from_sources,
    make_subgrid_from_sources,
)
from ska_sdp_distributed_fourier_transform_tpu.ops import (
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


# ---------------------------------------------------------------- pad_mid


@pytest.mark.parametrize(
    "n, expected",
    [
        (3, [1, 2, 3]),  # no-op
        (5, [0, 1, 2, 3, 0]),
        (6, [0, 0, 1, 2, 3, 0]),  # odd source in even target: extra on left
        (7, [0, 0, 1, 2, 3, 0, 0]),
    ],
)
def test_pad_mid_1d(n, expected):
    a = np.array([1, 2, 3])
    np.testing.assert_array_equal(np.asarray(pad_mid(a, n, 0)), expected)


def test_pad_mid_2d():
    a = np.ones((3, 3))
    padded0 = np.asarray(pad_mid(a, 5, 0))
    assert padded0.shape == (5, 3)
    np.testing.assert_array_equal(padded0[1:4, :], a)
    assert padded0[0].sum() == padded0[4].sum() == 0
    padded = np.asarray(pad_mid(pad_mid(a, 5, 0), 5, 1))
    assert padded.shape == (5, 5)
    np.testing.assert_array_equal(padded[1:4, 1:4], a)


# ------------------------------------------------------------ extract_mid


@pytest.mark.parametrize(
    "n, expected",
    [
        (5, [1, 2, 3, 4, 5]),
        (4, [1, 2, 3, 4]),  # even from odd: element before middle kept
        (3, [2, 3, 4]),
        (2, [2, 3]),
        (1, [3]),
    ],
)
def test_extract_mid_1d_odd_source(n, expected):
    a = np.array([1, 2, 3, 4, 5])
    np.testing.assert_array_equal(np.asarray(extract_mid(a, n, 0)), expected)


@pytest.mark.parametrize(
    "n, expected",
    [
        (4, [1, 2, 3, 4]),
        (3, [2, 3, 4]),  # odd from even: extra element *after* centre
        (2, [2, 3]),
        (1, [3]),
    ],
)
def test_extract_mid_1d_even_source(n, expected):
    a = np.array([1, 2, 3, 4])
    np.testing.assert_array_equal(np.asarray(extract_mid(a, n, 0)), expected)


def test_extract_mid_inverse_of_pad_mid():
    for n0 in [4, 5, 6, 7]:
        a = np.arange(n0) + 1.0
        for n in range(n0, 2 * n0 + 3):
            np.testing.assert_array_equal(
                np.asarray(extract_mid(pad_mid(a, n, 0), n0, 0)), a
            )


def test_extract_mid_2d():
    a = np.arange(25).reshape(5, 5)
    out = np.asarray(extract_mid(extract_mid(a, 3, 0), 3, 1))
    np.testing.assert_array_equal(out, a[1:4, 1:4])


# ---------------------------------------------------------------- fft/ifft


def test_fft_delta_is_constant():
    # Centre-zero convention: delta at centre -> all-ones spectrum
    a = np.zeros(8, dtype=complex)
    a[4] = 1.0
    np.testing.assert_allclose(np.asarray(fft(a, 0)), np.ones(8), atol=1e-14)


def test_fft_ifft_roundtrip():
    rng = np.random.default_rng(0)
    a = rng.normal(size=(8, 6)) + 1j * rng.normal(size=(8, 6))
    out = np.asarray(ifft(fft(a, 0), 0))
    np.testing.assert_allclose(out, a, atol=1e-13)
    out = np.asarray(ifft(fft(a, 1), 1))
    np.testing.assert_allclose(out, a, atol=1e-13)


def test_fft_2d_matches_numpy_shifted():
    rng = np.random.default_rng(1)
    a = rng.normal(size=(8, 8))
    mine = np.asarray(fft(fft(a, 0), 1))
    ref = np.fft.fftshift(np.fft.fft2(np.fft.ifftshift(a)))
    np.testing.assert_allclose(mine, ref, atol=1e-12)


# -------------------------------------------------------------- coordinates


@pytest.mark.parametrize("n", [8, 9, 10, 1024, 1025])
def test_coordinates(n):
    c = np.asarray(coordinates(n))
    assert len(c) == n
    assert c[n // 2] == 0.0
    if n % 2 == 0:
        assert c.min() == -0.5
        assert c.max() < 0.5
    else:
        assert c.min() == -(n // 2) / n
        assert c.max() == (n // 2) / n


# ------------------------------------------------- create_slice / broadcast


def test_create_slice():
    assert create_slice(0, 5, 4, 2) == (0, 0, 5, 0)
    assert create_slice(None, slice(2), 3, 0) == (slice(2), None, None)


def test_create_slice_errors():
    with pytest.raises(ValueError):
        create_slice(0, 1, 2.5, 0)
    with pytest.raises(ValueError):
        create_slice(0, 1, 2, "x")


def test_broadcast():
    a = np.arange(4.0)
    assert broadcast(a, 2, 0).shape == (4, 1)
    assert broadcast(a, 2, 1).shape == (1, 4)
    assert broadcast(a, 3, 1).shape == (1, 4, 1)


# ----------------------------------------------------- roll_and_extract_mid


def test_roll_and_extract_mid_covering_grid():
    """Slice method equals literal roll+extract for covering offsets
    (reference: test_fourier_algorithm.py:499-549, reduced grid)."""
    N = 256
    ch = 30
    data = np.arange(N * N).reshape(N, N)
    offsets = ch * np.arange(int(np.ceil(N / ch)))
    for offx in offsets:
        for offy in offsets:
            rolled = np.roll(data, (-offx, -offy), axis=(0, 1))
            true = np.asarray(
                extract_mid(extract_mid(rolled, ch, 0), ch, 1)
            )
            test = np.asarray(
                roll_and_extract_mid_axis(
                    roll_and_extract_mid_axis(data, offx, ch, 0),
                    offy,
                    ch,
                    1,
                )
            )
            np.testing.assert_array_equal(test, true)


def test_roll_and_extract_mid_slices():
    # single slice, no wrap
    assert roll_and_extract_mid(16, 0, 4) == [slice(6, 10)]
    # wrap at the high edge
    assert roll_and_extract_mid(16, 7, 4) == [slice(13, 16), slice(0, 1)]


def test_roll_and_extract_mid_axis_edges():
    data = np.arange(25).reshape(5, 5)
    out = np.asarray(roll_and_extract_mid_axis(data, 3, 2, 0))
    np.testing.assert_array_equal(
        out, [[20, 21, 22, 23, 24], [0, 1, 2, 3, 4]]
    )
    out = np.asarray(roll_and_extract_mid_axis(data, 3, 2, 1))
    np.testing.assert_array_equal(
        out, [[4, 0], [9, 5], [14, 10], [19, 15], [24, 20]]
    )


# ------------------------------------------------------------------ oracles


def test_make_facet_from_sources_basic():
    facet = make_facet_from_sources([(1, 0)], 16, 8, [0])
    expected = np.zeros(8)
    expected[4] = 1
    np.testing.assert_array_equal(facet, expected)

    # offset moves the source within the facet
    facet = make_facet_from_sources([(1, 2)], 16, 8, [4])
    expected = np.zeros(8)
    expected[2] = 1
    np.testing.assert_array_equal(facet, expected)

    # source off the facet is dropped
    facet = make_facet_from_sources([(1, 7)], 16, 8, [0])
    np.testing.assert_array_equal(facet, np.zeros(8))

    # wrap-around
    facet = make_facet_from_sources([(1, -8)], 16, 8, [8])
    assert facet.sum() == 1


def test_make_facet_from_sources_masks():
    mask = np.array([0, 1, 1, 1, 1, 1, 1, 0])
    facet = make_facet_from_sources([(1, -4), (1, 3)], 16, 8, [0], [mask])
    expected = np.zeros(8)
    expected[7] = 0  # masked away
    np.testing.assert_array_equal(facet, expected)


@pytest.mark.parametrize("dims", [1, 2])
def test_oracle_self_consistency(dims):
    """fft(subgrid oracle) == facet oracle when tile size == image size
    (reference: test_fourier_algorithm.py:679-769), offsets removed by
    rolling; plus the 1/N^dims normalisation for a unit centre source."""
    N = 32
    src_sets = [
        [],
        [(1.0,) + (0,) * dims],
        [(1.0,) + (2,) * dims, (-0.5,) + (-3,) * dims],
        [(1.0,) + (10000,) * dims],
    ]
    for sources in src_sets:
        for sg_off, facet_off in [(0, 0), (5, 2), (-7, -3)]:
            subgrid = make_subgrid_from_sources(
                sources, N, N, [sg_off] * dims
            )
            facet = make_facet_from_sources(sources, N, N, [facet_off] * dims)
            assert np.sum(facet) == pytest.approx(
                sum(s[0] for s in sources)
            )
            subgrid = np.roll(
                subgrid, [sg_off] * dims, axis=tuple(range(dims))
            )
            facet = np.roll(
                facet, [facet_off] * dims, axis=tuple(range(dims))
            )
            g = np.asarray(subgrid)
            for axis in range(dims):
                g = np.asarray(fft(g, axis))
            np.testing.assert_allclose(g, facet, atol=1e-12)
            if sources == [(1.0,) + (0,) * dims]:
                np.testing.assert_allclose(subgrid, 1 / N**dims, atol=1e-13)


def test_generate_masks_partition_of_unity():
    N = 64
    size = 20
    offsets = size * np.arange(int(np.ceil(N / size)))
    masks = generate_masks(N, size, offsets)
    assert masks.shape == (len(offsets), size)
    # every image pixel owned by exactly one tile
    owner = np.zeros(N, dtype=int)
    for off, mask in zip(offsets, masks):
        for i in range(size):
            if mask[i]:
                owner[(off - size // 2 + i) % N] += 1
    np.testing.assert_array_equal(owner, np.ones(N, dtype=int))


# ----------------------------------------------------- widened tier-1 sweeps


@pytest.mark.parametrize(
    "dims, axis",
    [
        (1, (0, 1)),
        (2, (0, 2)),
        (3, (1, 1)),
        ((2, 4), 4),
        ("str", (3, 4)),
    ],
)
def test_broadcast_rejects_non_int(dims, axis):
    """Non-integer dims/axis are rejected (reference
    test_fourier_algorithm.py:450-456 contract)."""
    with pytest.raises(ValueError):
        broadcast(jnp.ones((10, 10)), dims, axis)


@pytest.mark.parametrize(
    "dims, axis",
    [(5, (0, 2)), ((2, 3), 4), ((2, 2), (0, 1)), ("bla", 5), (3, "bla")],
)
def test_create_slice_rejects_non_int(dims, axis):
    with pytest.raises(ValueError):
        create_slice(2, 6, dims, axis)


@pytest.mark.parametrize(
    "dims, axis, expected",
    [
        (0, 0, ()),
        (1, 0, (6,)),
        (1, 1, (2,)),
        (3, 2, (2, 2, 6)),
        (6, 3, (2, 2, 2, 6, 2, 2)),
    ],
)
def test_create_slice_sweep(dims, axis, expected):
    assert create_slice(2, 6, dims, axis) == expected


def test_roll_and_extract_mid_full_offset_grid():
    """Wrap-aware slices equal literal roll+extract over the covering
    2-D offset grid of a non-dividing chunk size (the reference's full
    sweep, test_fourier_algorithm.py:499-551): N=256, chunk=118 leaves a
    wrap-around remainder tile in each axis."""
    N, ch = 256, 118
    data = np.arange(N * N).reshape(N, N)
    offsets = ch * np.arange(int(np.ceil(N / ch)))
    for offx in offsets:
        for offy in offsets:
            rolled = np.roll(data, (-offx, -offy), axis=(0, 1))
            want = np.asarray(
                extract_mid(extract_mid(jnp.asarray(rolled), ch, 0),
                            ch, 1)
            )
            sx = roll_and_extract_mid(N, int(offx), ch)
            sy = roll_and_extract_mid(N, int(offy), ch)
            # assemble from the (<=2 x <=2) wrap blocks
            got = np.concatenate(
                [
                    np.concatenate([data[s0, s1] for s1 in sy], axis=1)
                    for s0 in sx
                ],
                axis=0,
            )
            np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("offset", [-5, -1, 0, 1, 3, 5, 7, 11])
@pytest.mark.parametrize("size", [3, 4, 5])
def test_roll_and_extract_mid_negative_offsets(offset, size):
    """Slice lists reproduce literal roll+extract for negative and
    wrap-around offsets (1-D, both parities of extraction size).

    Slice-list order is "ascending source position" (the reference
    convention, verified against reference fourier_algorithm.py:141-175
    directly): for the window-wraps-below-zero branch the value order is
    the rotation starting at the high block, so some rotation of the
    block list must equal the rolled order."""
    n = 12
    data = np.arange(n)
    want = np.asarray(
        extract_mid(jnp.roll(jnp.asarray(data), -offset), size, 0)
    )
    slices = roll_and_extract_mid(n, offset, size)
    blocks = [data[s] for s in slices]
    rotations = [
        np.concatenate(blocks[i:] + blocks[:i])
        for i in range(len(blocks))
    ]
    assert any(np.array_equal(r, want) for r in rotations), (
        slices, blocks, want
    )


@pytest.mark.parametrize("axis", [0, 1])
@pytest.mark.parametrize("offset", [0, 2, 5, 7])
def test_roll_and_extract_mid_axis_offset_sweep(axis, offset):
    data = jnp.arange(63.0).reshape(7, 9)
    size = 5
    want = np.asarray(
        extract_mid(jnp.roll(data, -offset, axis=axis), size, axis)
    )
    got = np.asarray(
        roll_and_extract_mid_axis(data, offset, size, axis)
    )
    np.testing.assert_array_equal(got, want)
