"""Property test for the distributed-NTILE assignment arithmetic
(queries/windows.py): the closed-form bucket formula must equal the
definitional NTILE for every (total, rank) — hypothesis sweeps the
space far beyond what the fixture tables exercise."""

from __future__ import annotations

from hypothesis import given, strategies as st


def ntile_formula(rank: int, total: int, n: int = 4) -> int:
    s, r = divmod(total, n)
    cut = r * (s + 1)
    if rank <= cut:
        return (rank + s) // (s + 1)
    return r + (rank - cut + s - 1) // s


def ntile_definition(rank: int, total: int, n: int = 4) -> int:
    # NTILE(n): first (total mod n) buckets hold ceil(total/n) rows,
    # the rest floor(total/n); walk the buckets
    s, r = divmod(total, n)
    edge = 0
    for b in range(1, n + 1):
        edge += s + 1 if b <= r else s
        if rank <= edge:
            return b
    raise AssertionError("unreachable")


@given(
    total=st.integers(min_value=4, max_value=5000),
    rank_frac=st.floats(min_value=0.0, max_value=1.0, exclude_max=True),
)
def test_closed_form_matches_definition(total, rank_frac):
    rank = 1 + int(rank_frac * total)
    assert ntile_formula(rank, total) == ntile_definition(rank, total)


def test_exhaustive_small_totals():
    for total in range(4, 200):
        for rank in range(1, total + 1):
            assert ntile_formula(rank, total) == ntile_definition(rank, total), (
                total,
                rank,
            )
