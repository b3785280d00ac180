"""Rollup operator micro-tests (FIXTURES.md §4, mirroring the reference's
tests/test_rollup.py + tests/test_threshold_edges.py fixtures)."""

from __future__ import annotations

import pytest

from sparkclone.config import Thresholds


def _edge(
    ua="f1.py:a:1:10",
    ub="f2.py:b:1:10",
    pa="f1.py",
    pb="f2.py",
    usa=1,
    uea=10,
    usb=1,
    ueb=10,
    ka="FUNC",
    kb="FUNC",
    sa=1,
    ea=10,
    sb=1,
    eb=10,
    j=0.95,
    ia="idA",
    ib="idB",
):
    return (
        ia, ib, ua, pa, usa, uea, ka, sa, ea, ub, pb, usb, ueb, kb, sb, eb,
        j, 0, None, None,
    )


_COLS = [
    "id_a", "id_b",
    "unit_id_a", "path_a", "unit_start_a", "unit_end_a", "kind_a", "start_line_a", "end_line_a",
    "unit_id_b", "path_b", "unit_start_b", "unit_end_b", "kind_b", "start_line_b", "end_line_b",
    "jaccard", "hamming", "lcs_chars", "near_verbatim",
]

_SCHEMA = (
    "id_a string, id_b string, "
    "unit_id_a string, path_a string, unit_start_a int, unit_end_a int, kind_a string, start_line_a int, end_line_a int, "
    "unit_id_b string, path_b string, unit_start_b int, unit_end_b int, kind_b string, start_line_b int, end_line_b int, "
    "jaccard double, hamming int, lcs_chars int, near_verbatim boolean"
)


def _df(spark, edges):
    return spark.createDataFrame(edges, schema=_SCHEMA)


def _run(spark, edges, th=None):
    from sparkclone.rollup import rollup_findings

    return rollup_findings(_df(spark, edges), th or Thresholds()).collect()


def test_func_threshold_boundary(spark):
    """Exact >= compare at the threshold (test_threshold_edges.py:43-123
    pattern: 0.92 passes, 0.9199 does not)."""
    out = _run(spark, [_edge(j=0.92)])
    assert len(out) == 1 and out[0]["reasons"] == ["func_threshold"]
    out = _run(spark, [_edge(j=0.9199)])
    assert out == []


def test_min_window_hits(spark):
    th = Thresholds(min_window_hits=2)
    one_win = [_edge(ka="WIN", kb="WIN", j=0.95)]
    assert _run(spark, one_win, th) == []
    two_wins = [
        _edge(ka="WIN", kb="WIN", j=0.95, sa=1, ea=5, sb=1, eb=5, ia="w1", ib="w2"),
        _edge(ka="WIN", kb="WIN", j=0.93, sa=6, ea=9, sb=6, eb=9, ia="w3", ib="w4"),
    ]
    out = _run(spark, two_wins, th)
    assert len(out) == 1 and out[0]["reasons"] == ["min_window_hits"]
    assert out[0]["score"] == 0.95


def test_self_clone_requires_disjoint_spans(spark):
    same = dict(ua="f.py:a:1:30", ub="f.py:a:1:30", pa="f.py", pb="f.py", usa=1, uea=30, usb=1, ueb=30)
    overlapping = [_edge(**same, sa=1, ea=12, sb=7, eb=18, ka="WIN", kb="WIN")]
    assert _run(spark, overlapping) == []
    disjoint = [_edge(**same, sa=1, ea=10, sb=15, eb=24, ka="WIN", kb="WIN")]
    out = _run(spark, disjoint)
    assert len(out) == 1


def test_same_file_containment_dropped(spark):
    """Nested/overlapping units in one file are containment, not dup
    (rollup.py:103-110)."""
    nested = [
        _edge(
            ua="f.py:outer:1:30", ub="f.py:outer.inner:5:15",
            pa="f.py", pb="f.py", usa=1, uea=30, usb=5, ueb=15,
        )
    ]
    assert _run(spark, nested) == []
    # same file but disjoint units => legit duplication
    disjoint_units = [
        _edge(
            ua="f.py:a:1:10", ub="f.py:b:20:30",
            pa="f.py", pb="f.py", usa=1, uea=10, usb=20, ueb=30,
        )
    ]
    assert len(_run(spark, disjoint_units)) == 1


def test_dedupe_keeps_best_kind_rank(spark):
    """Same span pair seen as WIN/WIN and FUNC/FUNC with equal score —
    FUNC/FUNC wins (rollup.py:55-60 + ranking.py:10-19); match_count
    collapses to 1."""
    edges = [
        _edge(ka="WIN", kb="WIN", j=0.95, ia="w1", ib="w2"),
        _edge(ka="FUNC", kb="FUNC", j=0.95, ia="q1", ib="q2"),
    ]
    out = _run(spark, edges)
    assert len(out) == 1
    assert out[0]["match_count"] == 1
    assert out[0]["reasons"] == ["func_threshold"]


def test_duplicated_lines_interval_merge(spark):
    """Overlapping + adjacent + disjoint spans (rollup.py:144-154):
    a-side spans (1,10) (5,12) (13,20) (30,35) merge to 26 lines;
    b-side identical => duplicated_lines = 26."""
    spans = [(1, 10), (5, 12), (13, 20), (30, 35)]
    edges = [
        _edge(ka="WIN", kb="WIN", j=0.95, sa=s, ea=e, sb=s, eb=e,
              usa=1, uea=60, usb=1, ueb=60, ia=f"x{i}", ib=f"y{i}")
        for i, (s, e) in enumerate(spans)
    ]
    out = _run(spark, edges)
    assert len(out) == 1
    assert out[0]["duplicated_lines"] == 26


def test_orientation_canonicalized(spark):
    """(B, A) input groups with (A, B)."""
    edges = [
        _edge(ia="i1", ib="i2"),
        _edge(
            ua="f2.py:b:1:10", ub="f1.py:a:1:10", pa="f2.py", pb="f1.py",
            ia="i3", ib="i4", j=0.99, sa=2, ea=9, sb=2, eb=9,
        ),
    ]
    out = _run(spark, edges)
    assert len(out) == 1
    assert out[0]["unit_a"] == "f1.py:a:1:10"
    assert out[0]["score"] == 0.99


def test_lcs_and_near_verbatim_aggregate(spark):
    e = list(_edge(j=0.95))
    e[_COLS.index("lcs_chars")] = 123
    e[_COLS.index("near_verbatim")] = True
    out = _run(spark, [tuple(e)])
    assert out[0]["lcs_chars"] == 123
    assert out[0]["near_verbatim"] is True


@pytest.mark.parametrize(
    "a,b,expected",
    [
        ("banana", "ananas", 5),      # "anana"
        ("abc", "xyz", 0),
        ("", "abc", 0),
        ("same", "same", 4),
        ("xabcy", "zabcw", 3),
    ],
)
def test_longest_common_substring(a, b, expected):
    from sparkclone.verify import longest_common_substring_len

    assert longest_common_substring_len(a, b) == expected
