"""BPE merge learning: distributed result vs a pure-Python reference
implementation of classic BPE (Sennrich et al. 2016), plus segmentation
invariants. The golden compare is exact — integer pair counts and a
total deterministic tie-break make the merge sequence engine-independent."""

from __future__ import annotations

import pytest

from collections import Counter

from pyspark.sql import functions as F

from opendata_gov_lt_mysql_import_spark.operators.bpe import (
    bpe_segment,
    learn_bpe,
    pair_counts,
    with_symbols,
    word_freqs,
)
from opendata_gov_lt_mysql_import_spark.sources.parquet import load_table

from conftest import SF_SMALL


def _python_bpe(word_freq: dict[str, int], n_merges: int):
    """30-line reference BPE: overlapping pair counts, count-desc then
    lexicographic argmax, greedy non-overlapping left-to-right merge."""
    vocab = {w: list(w) for w in word_freq}
    merges = []
    for rank in range(n_merges):
        pc: Counter = Counter()
        for w, f in word_freq.items():
            s = vocab[w]
            for i in range(len(s) - 1):
                pc[(s[i], s[i + 1])] += f
        if not pc:
            break
        (l, r), c = sorted(pc.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append((rank, l, r, c))
        for w, s in vocab.items():
            out, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == l and s[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            vocab[w] = out
    return merges, vocab


def _corpus_word_freq(spark) -> dict[str, int]:
    d = load_table(spark, SF_SMALL, "documents")
    return {
        r["word"]: r["freq"] for r in word_freqs(d, "text").collect()
    }  # vocabulary-sized collect: fixture corpus has a tiny distinct-word set


def test_learn_bpe_matches_python_reference(spark):
    d = load_table(spark, SF_SMALL, "documents")
    got = [
        (r["rank"], r["left"], r["right"], r["pair_count"])
        for r in learn_bpe(d, "text", 10).orderBy("rank").collect()
    ]
    want, _ = _python_bpe(_corpus_word_freq(spark), 10)
    assert got == want


def test_first_merge_equals_pair_count_argmax(spark):
    d = load_table(spark, SF_SMALL, "documents")
    top = (
        pair_counts(with_symbols(word_freqs(d, "text")))
        .orderBy(F.desc("pair_count"), F.asc("left"), F.asc("right"))
        .limit(1)
        .collect()[0]
    )
    first = learn_bpe(d, "text", 1).collect()[0]
    assert (first["left"], first["right"], first["pair_count"]) == (
        top["left"],
        top["right"],
        top["pair_count"],
    )


def test_overlapping_pair_merge_is_greedy_left_to_right(spark):
    # "aaaa bab" with merge (a,a): counts the overlapping pairs (3 per
    # "aaaa") but merges non-overlapping -> ["aa","aa"], never ["aa","a","a"]
    df = spark.createDataFrame([(1, "aaaa aab")], "id INT, text STRING")
    m = learn_bpe(df, "text", 2).collect()
    assert (m[0]["left"], m[0]["right"], m[0]["pair_count"]) == ("a", "a", 4)
    seg = bpe_segment(df, "text", [("a", "a")]).collect()[0]["bpe_tokens"]
    assert seg == ["aa", "aa", "aa", "b"]


def test_segmentation_reconstructs_text(spark):
    d = load_table(spark, SF_SMALL, "documents").limit(200)
    merges = [
        (r["left"], r["right"])
        for r in learn_bpe(d, "text", 6).orderBy("rank").collect()
    ]
    seg = bpe_segment(d, "text", merges)
    # concat of bpe tokens == concat of whitespace tokens, every doc
    bad = seg.filter(
        F.concat_ws("", F.col("bpe_tokens"))
        != F.concat_ws("", F.split(F.trim("text"), r"\s+"))
    ).count()
    assert bad == 0
    # merges actually fire: token count strictly below char count overall
    n_bpe, n_chars = seg.select(
        F.sum(F.size("bpe_tokens")),
        F.sum(F.length(F.regexp_replace("text", r"\s+", ""))),
    ).collect()[0]
    assert n_bpe < n_chars


def test_learn_bpe_empty_and_saturated(spark):
    empty = spark.createDataFrame([], "id INT, text STRING")
    assert learn_bpe(empty, "text", 3).count() == 0
    # single-char words only: no adjacent pairs -> saturates at 0 merges
    single = spark.createDataFrame([(1, "a b c a")], "id INT, text STRING")
    assert learn_bpe(single, "text", 3).count() == 0


# `full` tier (round-16): see pytest.ini — excluded from the default driver-window run
@pytest.mark.full
def test_arrow_encoder_matches_fold_path(spark):
    from opendata_gov_lt_mysql_import_spark.operators.bpe import (
        bpe_segment_arrow,
    )

    d = load_table(spark, SF_SMALL, "documents").limit(300)
    merges = [
        (r["left"], r["right"])
        for r in learn_bpe(d, "text", 8).orderBy("rank").collect()
    ]
    fold = {
        (r["doc_id"], tuple(r["bpe_tokens"]))
        for r in bpe_segment(d, "text", merges).select(
            "doc_id", "bpe_tokens"
        ).collect()
    }
    arrow = {
        (r["doc_id"], tuple(r["bpe_tokens"]))
        for r in bpe_segment_arrow(d, "text", merges).select(
            "doc_id", "bpe_tokens"
        ).collect()
    }
    assert fold == arrow
    # and the arrow path handles a merge count the fold path cannot:
    # 64 merges still encode (plan stays one Python node, no k-deep tree)
    merges64 = [
        (r["left"], r["right"])
        for r in learn_bpe(d, "text", 64).orderBy("rank").collect()
    ]
    seg = bpe_segment_arrow(d.limit(50), "text", merges64)
    rows = seg.select("doc_id", "bpe_tokens").collect()
    assert len(rows) == 50 and all(len(r["bpe_tokens"]) > 0 for r in rows)


def test_arrow_encoder_nonascii_whitespace_parity(spark):
    """Java regex \\s is ASCII-only while Python \\s is Unicode-aware:
    text containing U+00A0 (NBSP) or U+2028 must tokenize identically on
    the JVM fold path and the Arrow twin — the Arrow path splits on an
    explicit ASCII whitespace class for exactly this reason."""
    from opendata_gov_lt_mysql_import_spark.operators.bpe import (
        bpe_segment_arrow,
    )

    d = spark.createDataFrame(
        [
            (1, "alpha beta gamma"),     # NBSP glues alpha+beta on BOTH paths
            (2, "line sep and\ttabs"),   # U+2028 is not a separator either
            (3, "plain ascii words"),
        ],
        "doc_id INT, text STRING",
    )
    merges = [("a", "l"), ("al", "p")]
    fold = {
        (r["doc_id"], tuple(r["bpe_tokens"]))
        for r in bpe_segment(d, "text", merges).select("doc_id", "bpe_tokens").collect()
    }
    arrow = {
        (r["doc_id"], tuple(r["bpe_tokens"]))
        for r in bpe_segment_arrow(d, "text", merges).select("doc_id", "bpe_tokens").collect()
    }
    assert fold == arrow
