"""Unicode normalization, exact-substring duplication, and tokenizer
fertility (operators/textnorm.py) — can-fail semantics beyond the
oracle parity suite: pinned NFC transitions per variant, a planted
cross-doc duplicate a broken window slicer would miss, and plan-shape
assertions (the normalizer must stay shuffle-free; the fertility
report must be a single partial-agg exchange)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from simplemapreduceframework_spark.operators.textnorm import (
    _SUB_K,
    _SUB_STRIDE,
    dedup_substring,
    dedup_substring_hashed,
    text_normalize_unicode,
    tokenizer_fertility,
)
from simplemapreduceframework_spark.plans import explain_str, n_exchanges


def test_nfc_variant_transitions_pinned(spark, sf_dir):
    """Each doc_id % 4 variant must shrink (or hold) its codepoint
    count by the UAX #15 amount: combining pair -2+1, singleton 0,
    ligature 0 (NFC-invariant!), reorder-then-compose -3+1. A
    normalizer that skipped composition, decomposed instead, or hit
    NFKC (which splits the ligature) breaks these deltas."""
    rows = (
        text_normalize_unicode(spark, sf_dir)
        .withColumn("variant", F.col("doc_id") % 4)
        .groupBy("variant")
        .agg(
            F.count_distinct(
                F.col("n_cp_raw") - F.col("n_cp_nfc")
            ).alias("n_deltas"),
            F.min(F.col("n_cp_raw") - F.col("n_cp_nfc")).alias("delta"),
            F.min("changed").alias("min_changed"),
            F.max("changed").alias("max_changed"),
        )
        .collect()
    )
    got = {
        r["variant"]: (r["n_deltas"], r["delta"], r["min_changed"], r["max_changed"])
        for r in rows
    }
    # (distinct deltas, delta, changed): ASCII body is NFC-invariant so
    # the suffix fully determines the delta — one distinct value each
    assert got[0] == (1, 1, 1, 1)  # e + U+0301 -> U+00E9
    assert got[1] == (1, 0, 1, 1)  # U+212B -> U+00C5 (same length)
    assert got[2] == (1, 0, 0, 0)  # U+FB01 ligature: NFC-INVARIANT
    assert got[3] == (1, 2, 1, 1)  # o + 2 marks -> U+1ED9


def test_nfc_normalizer_is_shuffle_free(spark, sf_dir):
    df = text_normalize_unicode(spark, sf_dir)
    assert n_exchanges(df) == 0, explain_str(df)


def test_fertility_is_one_partial_agg_shuffle(spark, sf_dir):
    df = tokenizer_fertility(spark, sf_dir)
    assert n_exchanges(df) == 1, explain_str(df)


def test_substring_dedup_finds_planted_boilerplate(spark, tmp_path):
    """Two docs share a 64-char boilerplate run (cross-doc dup), a
    third is unique, a fourth is shorter than one window, a fifth has
    an INTERNAL repeat only (same doc twice — must NOT count: the
    signal is cross-document). Ratios are checked exactly."""
    import os

    from simplemapreduceframework_spark.sources import TABLES, load_table

    boiler = "".join(chr(ord("A") + i % 26) for i in range(64))
    uniq1 = "".join(chr(ord("a") + (i * 7) % 26) for i in range(64))
    uniq2 = "".join(chr(ord("a") + (i * 11 + 3) % 26) for i in range(64))
    internal = uniq2 + uniq2  # same window twice, ONE doc
    nd = str(tmp_path / "sub_fixture")
    os.makedirs(nd, exist_ok=True)
    src = "/root/testdata/sf0.001"
    for t in TABLES:
        df = load_table(spark, src, t)
        if t == "documents":
            df = spark.createDataFrame(
                [
                    (1, boiler + uniq1, "en", "s", None),
                    (2, boiler, "en", "s", None),
                    (3, uniq1[::-1], "en", "s", None),
                    (4, "tiny", "en", "s", None),
                    (5, internal, "en", "s", None),
                ],
                df.schema,
            )
        df.write.parquet(f"{nd}/{t}.parquet")
    got = {
        r["doc_id"]: (r["n_windows"], r["n_dup_windows"], r["dup_ratio"])
        for r in dedup_substring(spark, nd).collect()
    }
    # doc 2 is entirely the boilerplate: every window duplicated
    n2 = (64 - _SUB_K) // _SUB_STRIDE + 1
    assert got[2] == (n2, n2, 1.0)
    # doc 1: windows fully inside the first 64 chars match doc 2's
    n1 = (128 - _SUB_K) // _SUB_STRIDE + 1
    assert got[1][0] == n1
    assert got[1][1] == n2  # same aligned positions as doc 2
    assert got[1][2] == pytest.approx(n2 / n1)
    # unique doc: zero dups; short doc: zero windows, NULL ratio
    assert got[3][1] == 0 and got[3][2] == 0.0
    assert got[4] == (0, 0, None)
    # internal-repeat doc: windows repeat WITHIN the doc only — the
    # cross-doc distinct count stays 1, so nothing is flagged
    assert got[5][1] == 0


def test_substring_hashed_twin_is_row_identical(spark, sf_dir):
    """The xxhash64-keyed scale twin must be BIT-identical to the
    raw-window form on the whole test corpus — every (doc, n_windows,
    n_dup_windows, dup_ratio) row, not just aggregates — proving the
    8-byte shuffle key loses nothing (no collision merges two windows
    here; a collision would inflate some doc's n_dup_windows)."""
    exact = {
        r["doc_id"]: (r["n_windows"], r["n_dup_windows"], r["dup_ratio"])
        for r in dedup_substring(spark, sf_dir).collect()
    }
    hashed = {
        r["doc_id"]: (r["n_windows"], r["n_dup_windows"], r["dup_ratio"])
        for r in dedup_substring_hashed(spark, sf_dir).collect()
    }
    assert exact == hashed


def test_substring_hashed_shuffles_hash_not_window(spark, sf_dir):
    """The raw 32-char window must die BEFORE the first exchange: only
    the 8-byte hash crosses shuffles. Same three-exchange no-self-join
    shape as the exact form."""
    df = dedup_substring_hashed(spark, sf_dir)
    plan = explain_str(df)
    assert "Join" not in plan, plan
    assert n_exchanges(df) == 3, plan
    assert "xxhash64" in plan, plan
    # no Exchange partitions on the raw window column
    import re

    for m in re.finditer(r"Exchange hashpartitioning\(([^)]*)\)", plan):
        assert "win#" not in m.group(1), m.group(0)


def test_substring_dedup_plan_has_no_self_join(spark, sf_dir):
    """The window multiplicity comes from a count window over the
    (win, doc) pre-aggregate — three exchanges total (win+doc, win,
    doc), never a join back to the exploded window set (which would
    rescan and reshuffle the full window corpus a second time)."""
    df = dedup_substring(spark, sf_dir)
    plan = explain_str(df)
    assert "Join" not in plan, plan
    assert n_exchanges(df) == 3, plan


def test_fertility_ratios_exact(spark, tmp_path):
    """chars_per_token divides the group's integer sums (not an average
    of per-doc ratios), NULL text SUM-skips, and a lang whose docs have
    zero tokens yields NULL, not NaN."""
    import os

    from simplemapreduceframework_spark.sources import TABLES, load_table

    nd = str(tmp_path / "fert_fixture")
    os.makedirs(nd, exist_ok=True)
    src = "/root/testdata/sf0.001"
    for t in TABLES:
        df = load_table(spark, src, t)
        if t == "documents":
            df = spark.createDataFrame(
                [
                    (1, "one two three", "en", "s", None),  # 3 tok, 13 ch
                    (2, "four five", "en", "s", None),  # 2 tok, 9 ch
                    (3, None, "en", "s", None),  # NULL text
                    (4, "", "xx", "s", None),  # zero tokens
                ],
                df.schema,
            )
        df.write.parquet(f"{nd}/{t}.parquet")
    got = {
        r["lang"]: r for r in tokenizer_fertility(spark, nd).collect()
    }
    en = got["en"]
    assert en["n_docs"] == 3 and en["n_chars"] == 22 and en["n_tokens"] == 5
    assert en["chars_per_token"] == pytest.approx(22 / 5)
    # tokens_per_doc averages over docs WITH text (2), not all 3
    assert en["tokens_per_doc"] == pytest.approx(5 / 2)
    xx = got["xx"]
    assert xx["n_tokens"] == 0 and xx["chars_per_token"] is None
