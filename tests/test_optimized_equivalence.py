"""Round-6 optimization equivalence guards: the restructured operators
(score-then-attach verification, min_by span-pair dedupe, aggregation-based
exact collapse) must produce row-identical results to their reference
formulations — these tests pin the old semantics explicitly so future
edits to the optimized forms cannot drift."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def corpus_df(spark, corpus_parquet):
    from sparkclone.pipeline import load_corpus

    return load_corpus(spark, corpus_parquet)


def _canon(df):
    cols = sorted(df.columns)
    return sorted(tuple(str(r[c]) for c in cols) for r in df.collect())


def test_verify_candidates_matches_attach_then_verify(spark, corpus_df):
    """verify_candidates (score-then-attach) == verify_pairs(attach_sides)
    row for row, column set included."""
    from sparkclone.config import benchmark_config
    from sparkclone.extract import extract_snippets
    from sparkclone.lsh import candidate_pairs
    from sparkclone.pipeline import collapse_exact, tokenize_snippets
    from sparkclone.signatures import with_signatures
    from sparkclone.verify import attach_sides, verify_candidates, verify_pairs

    cfg = benchmark_config()
    snips = tokenize_snippets(extract_snippets(corpus_df, cfg.windows), cfg).persist()
    reps, _ = collapse_exact(snips)
    sigs = with_signatures(reps.drop("norm_text", "text_hash"), cfg.signature).persist()
    pairs, _ = candidate_pairs(sigs, cfg.lsh)
    old = verify_pairs(attach_sides(pairs, sigs), cfg)
    new = verify_candidates(pairs, sigs, cfg)
    assert set(old.columns) == set(new.columns)
    assert _canon(old.select(*sorted(old.columns))) == _canon(
        new.select(*sorted(old.columns))
    )
    snips.unpersist()
    sigs.unpersist()


def test_verify_scoring_join_is_slim(spark, corpus_df):
    """The candidate-volume scoring joins must not carry unit_id/path
    strings — only the survivors' metadata joins may (guide §2.3)."""
    from sparkclone.config import benchmark_config
    from sparkclone.extract import extract_snippets
    from sparkclone.lsh import candidate_pairs
    from sparkclone.pipeline import collapse_exact, tokenize_snippets
    from sparkclone.signatures import with_signatures
    from sparkclone.verify import verify_candidates

    cfg = benchmark_config()
    snips = tokenize_snippets(extract_snippets(corpus_df, cfg.windows), cfg)
    reps, _ = collapse_exact(snips)
    sigs = with_signatures(reps.drop("norm_text", "text_hash"), cfg.signature)
    pairs, _ = candidate_pairs(sigs, cfg.lsh)
    plan = (
        verify_candidates(pairs, sigs, cfg)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    # the jaccard scorer must appear BELOW (after, in plan text) any
    # unit_id attachment: the scored survivor frame references
    # token_hashes, and no single join may carry both token_hashes and
    # unit_id on the same side
    for ln in plan.splitlines():
        if "array_intersect" in ln:
            assert "unit_id" not in ln


def test_dedupe_span_pairs_matches_window_reference(spark):
    """min_by dedupe == the windowed row_number()==1 reference on a frame
    with score ties, rank ties, and id tiebreaks."""
    from sparkclone.rollup import dedupe_span_pairs, kind_rank_col

    rows = [
        # same span pair, higher jaccard wins
        ("u1", 1, 5, "u2", 1, 5, "WIN", "WIN", 0.95, "a1", "b1"),
        ("u1", 1, 5, "u2", 1, 5, "WIN", "WIN", 0.91, "a2", "b2"),
        # jaccard tie -> kind rank wins (FUNC/FUNC=3 over WIN/WIN=1)
        ("u3", 2, 6, "u4", 2, 6, "FUNC", "FUNC", 0.93, "a3", "b3"),
        ("u3", 2, 6, "u4", 2, 6, "WIN", "WIN", 0.93, "a4", "b4"),
        # full tie -> min (id_a, id_b) wins
        ("u5", 3, 7, "u6", 3, 7, "WIN", "WIN", 0.92, "a6", "b6"),
        ("u5", 3, 7, "u6", 3, 7, "WIN", "WIN", 0.92, "a5", "b5"),
        # singleton group passes through
        ("u7", 4, 8, "u8", 4, 8, "EXP", "WIN", 0.97, "a7", "b7"),
    ]
    df = spark.createDataFrame(
        rows,
        "unit_id_a string, start_line_a int, end_line_a int, "
        "unit_id_b string, start_line_b int, end_line_b int, "
        "kind_a string, kind_b string, jaccard double, id_a string, id_b string",
    )
    rank = kind_rank_col(F.col("kind_a"), F.col("kind_b"))
    w = Window.partitionBy(
        "unit_id_a", "start_line_a", "end_line_a",
        "unit_id_b", "start_line_b", "end_line_b",
    ).orderBy(F.col("jaccard").desc(), rank.desc(), F.col("id_a"), F.col("id_b"))
    ref = (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )
    got = dedupe_span_pairs(df)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, ref.collect()))
    assert {r["id_a"] for r in got.collect()} == {"a1", "a3", "a5", "a7"}


def test_collapse_exact_matches_window_reference(spark, corpus_df):
    """Aggregation-based collapse == the windowed min-over-group
    reference: same reps, same star edge rows."""
    from pyspark.sql import Window as W

    from sparkclone.config import benchmark_config
    from sparkclone.extract import extract_snippets
    from sparkclone.pipeline import collapse_exact, tokenize_snippets

    cfg = benchmark_config()
    tok = tokenize_snippets(extract_snippets(corpus_df, cfg.windows), cfg).persist()
    reps, stars = collapse_exact(tok)

    w = W.partitionBy("tokenset_hash")
    with_rep = tok.withColumn("rep_id", F.min("snippet_id").over(w))
    ref_reps = with_rep.where(F.col("snippet_id") == F.col("rep_id")).drop("rep_id")
    assert _canon(reps) == _canon(ref_reps.select(*reps.columns))

    # star edges: one (rep, member) row per non-rep member, jaccard 1.0
    ref_members = with_rep.where(F.col("snippet_id") != F.col("rep_id"))
    assert stars.count() == ref_members.count()
    got_pairs = {(r["id_a"], r["id_b"]) for r in stars.select("id_a", "id_b").collect()}
    ref_pairs = {
        (r["rep_id"], r["snippet_id"])
        for r in ref_members.select("rep_id", "snippet_id").collect()
    }
    assert got_pairs == ref_pairs
    tok.unpersist()
