"""Property-based checks for the scalable-rank kernels: the closed-form
NTILE and the bucketed/salted rank formulas must match window semantics
for ARBITRARY row counts, tile counts, duplicate densities, and bucket
boundaries -- not just the fixture shapes.  Pure-Python properties run
per-example; Spark cross-checks run on a handful of drawn cases (session
startup dominates, so examples are bounded)."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st


def _ntile_reference(n: int, k: int) -> list[int]:
    """SQL NTILE semantics: first n % k tiles get n//k + 1 rows."""
    q, r = divmod(n, k)
    out = []
    for tile in range(1, k + 1):
        out.extend([tile] * (q + 1 if tile <= r else q))
    return out


def _ntile_formula(rn: int, n: int, k: int) -> int:
    """Python mirror of ops.scalable_rank.ntile_from_rn's expression."""
    q, r = divmod(n, k)
    head = r * (q + 1)
    if q == 0:
        return rn
    if rn <= head:
        return (rn - 1) // (q + 1) + 1
    return r + (rn - 1 - head) // q + 1


@given(n=st.integers(1, 5000), k=st.integers(1, 100))
@settings(max_examples=300, deadline=None)
def test_ntile_closed_form_matches_sql_semantics(n, k):
    ref = _ntile_reference(n, k)
    got = [_ntile_formula(rn, n, k) for rn in range(1, n + 1)]
    assert got == ref


@given(
    values=st.lists(st.integers(0, 20), min_size=1, max_size=400),
    nbound=st.integers(1, 10),
)
@settings(max_examples=200, deadline=None)
def test_bucket_offset_rank_identity(values, nbound):
    """The rank = local_rank + preceding-bucket-count identity holds for
    ANY monotone bucketing where ties never straddle buckets -- the
    invariant both kernels rely on.  Model: bucket by strict boundary
    comparison, rank locally, offset by earlier-bucket sizes."""
    bounds = sorted(set(values))[:nbound]
    rows = sorted(
        ((v, i) for i, v in enumerate(values))
    )  # total order: (value, original index)
    want = {row: rnk + 1 for rnk, row in enumerate(rows)}
    # bucket: number of boundaries strictly below the value
    buckets: dict[int, list] = {}
    for row in rows:
        pid = sum(1 for b in bounds if b < row[0])
        buckets.setdefault(pid, []).append(row)
    got = {}
    offset = 0
    for pid in sorted(buckets):
        members = sorted(buckets[pid])
        for local, row in enumerate(members, start=1):
            got[row] = local + offset
        offset += len(members)
    assert got == want


@given(
    values=st.lists(st.integers(0, 5), min_size=1, max_size=300),
    nbuckets=st.integers(1, 8),
)
@settings(max_examples=200, deadline=None)
def test_tiefree_rank_range_identity(values, nbuckets):
    """Salted tie-free ranks occupy exactly each value group's global
    rank range regardless of how ties scatter across buckets."""
    rows = [(v, i) for i, v in enumerate(values)]
    # model the kernel: pid = hash(salt) % nbuckets (use index directly)
    start_of: dict[int, int] = {}
    acc = 0
    for v in sorted({v for v, _ in rows}):
        start_of[v] = acc
        acc += sum(1 for w, _ in rows if w == v)
    got_ranks = []
    for v in sorted({v for v, _ in rows}):
        group = [r for r in rows if r[0] == v]
        by_pid: dict[int, list] = {}
        for r in group:
            by_pid.setdefault(r[1] % nbuckets, []).append(r)
        poff = 0
        ranks = []
        for pid in sorted(by_pid):
            members = sorted(by_pid[pid], key=lambda r: r[1])
            ranks.extend(
                start_of[v] + poff + j for j in range(1, len(members) + 1)
            )
            poff += len(members)
        assert sorted(ranks) == list(
            range(start_of[v] + 1, start_of[v] + len(group) + 1)
        )
        got_ranks.extend(ranks)
    assert sorted(got_ranks) == list(range(1, len(rows) + 1))
