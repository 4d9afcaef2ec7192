"""Property tests (hypothesis) for the two order-sensitive-looking ops
that must be order-INsensitive: the dataset checksum's (xor, mod-sum)
pair and the Morton z-value's per-dimension monotonicity.

Checksum invariants are checked in PYTHON against the same md5-derived
hash the engines compute — these pin the ALGEBRA (permutation
invariance, duplicate sensitivity) that the Spark/DuckDB parity test
can't distinguish from luck on one dataset.
"""

from __future__ import annotations

import hashlib
import random

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SETTINGS = settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)

_P = 2147483647


def _h(row: str) -> int:
    return int(hashlib.md5(row.encode()).hexdigest()[:14], 16)


def _check(rows: list[str]) -> tuple[int, int, int]:
    xor = 0
    tot = 0
    for r in rows:
        v = _h(r)
        xor ^= v
        tot += v
    return len(rows), xor, tot % _P


st_rows = st.lists(st.text(min_size=0, max_size=12), min_size=1, max_size=40)


@SETTINGS
@given(rows=st_rows, seed=st.integers(0, 2**16))
def test_checksum_is_permutation_invariant(rows, seed):
    shuffled = rows[:]
    random.Random(seed).shuffle(shuffled)
    assert _check(rows) == _check(shuffled)


@SETTINGS
@given(rows=st_rows)
def test_checksum_detects_single_duplicate_even_when_xor_cancels(rows):
    """Duplicating one row twice cancels in xor (v ^ v ^ v = v) only in
    PAIRS; count and mod-sum always move, so the triple never matches."""
    dup = rows + [rows[0], rows[0]]
    n0, x0, s0 = _check(rows)
    n1, x1, s1 = _check(dup)
    assert x0 == x1, "xor alone is blind to a duplicated pair"
    assert (n0, s0) != (n1, s1) or _h(rows[0]) % _P == 0


@SETTINGS
@given(
    a=st.integers(0, 255),
    b=st.integers(0, 255),
    delta=st.integers(1, 16),
)
def test_morton_monotone_per_dimension(a, b, delta):
    """With the other coordinate fixed, increasing a coordinate never
    decreases the Morton key (interleave preserves per-dimension
    order), and distinct grid points get distinct keys."""

    def morton(x, y, bits=8):
        z = 0
        for i in range(bits):
            z |= ((x >> i) & 1) << (2 * i) | ((y >> i) & 1) << (2 * i + 1)
        return z

    a2 = min(255, a + delta)
    assert morton(a2, b) >= morton(a, b)
    assert morton(a, min(255, b + delta)) >= morton(a, b)
    if a2 != a:
        assert morton(a2, b) != morton(a, b)
