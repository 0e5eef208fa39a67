"""Unit tests for the planner's radix/factorization math (pure functions)."""

import pytest

from pyfft_tpu.utils.radix import (
    balanced_split,
    fourstep_split,
    ilog2,
    is_power_of_two,
    radix_decompose,
)


def test_is_power_of_two():
    assert all(is_power_of_two(1 << p) for p in range(31))
    assert not any(is_power_of_two(n) for n in [0, -1, 3, 6, 12, 100])


def test_ilog2():
    for p in range(24):
        assert ilog2(1 << p) == p
    with pytest.raises(ValueError):
        ilog2(24)


@pytest.mark.parametrize("n", [2, 4, 8, 1024, 2**21, 2**22])
def test_balanced_split(n):
    a, b = balanced_split(n)
    assert a * b == n and a >= b and a <= 2 * b


@pytest.mark.parametrize("n", [2, 16, 128, 4096, 2**22])
@pytest.mark.parametrize("max_radix", [4, 8, 16, 128])
def test_radix_decompose(n, max_radix):
    rs = radix_decompose(n, max_radix)
    prod = 1
    for r in rs:
        assert 2 <= r <= max_radix
        prod *= r
    assert prod == n
    # no skewed tail like [8, 8, 2-after-128]: last factor within 4x of prior
    if len(rs) >= 2:
        assert rs[-2] <= 4 * rs[-1]


def test_fourstep_split():
    n1, n2 = fourstep_split(2**22, 2048)
    assert n1 * n2 == 2**22 and n2 == 2048
    with pytest.raises(ValueError):
        fourstep_split(64, 128)
