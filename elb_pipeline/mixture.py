"""Deterministic source-mixture sampler — corpus composition to target
weights, the step after dedup/quality screens and before packing.

A pretraining corpus is assembled from S sources with target mixture
weights w_s (fractions of the final token budget). Given the observed
per-source token counts T_s, the largest achievable budget is
``B = min_s(T_s / w_s)`` (the binding source contributes everything it
has), and every other source is downsampled at rate
``r_s = w_s * B / T_s``.

Scale shape (the part that must survive 100 TB):

  pass 1  per-source token totals — a partial-first groupBy down to S
          rows (S = #sources, tiny);
  pass 2  sum/min over the S-row aggregate via unpartitioned windows —
          O(S) single-partition work, the same shape as the shard-prefix
          step of the packing prefix sum (PLANS.md §6d) and AQE's own
          statistics;
  pass 3  rates broadcast-joined back to the corpus; each doc is gated by
          a DETERMINISTIC hash fraction (first 8 hex of md5(doc_id) /
          2^32) — no RNG, so the kept set is reproducible across engines,
          runs, and cluster sizes, and the sample composes with every
          other hash-keyed screen (stratified_sample, replica marking).

No driver-side compute: the budget/rate arithmetic stays in the plan
(window over the S-row agg), not in a .collect() — rates re-derive from
the data on every run, which is what an incremental 100 TB refresh needs.

Cross-engine float contract: the oracle mirrors the exact expression tree
(w = u/sum_u, B = min(T/w), r = w*B/T as doubles); a doc would have to
land within ~1 ULP of its source's rate for the engines to disagree on
the gate, and the output rounds the reported rate only for display.

No reference counterpart (the reference emits one line per input line,
src/main.rs:103-177; mixture targeting is a training-pipeline operator).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from elb_pipeline.packing import n_tokens_expr


def hash_frac(key: Column) -> Column:
    """Uniform-in-[0,1) deterministic fraction of a key: first 8 hex chars
    of md5(key as string) as a uint32, / 2^32. Same value in DuckDB via
    ('0x' || substr(md5(CAST(key AS VARCHAR)), 1, 8))::UBIGINT."""
    return (
        F.conv(F.substring(F.md5(key.cast("string")), 1, 8), 16, 10)
        .cast("double")
        / F.lit(4294967296.0)
    )


def default_weight_expr() -> Column:
    """Data-independent demo weights from the source name: sources cycle
    through raw weights 1/2/3 by suffix mod 3 (mirrors the oracle SQL)."""
    num = F.substring(F.col("source"), 4, 10).cast("int")
    return (num % 3 + 1).cast("long")


def source_rates(docs: DataFrame) -> DataFrame:
    """(source, n_total, tok_total, rate): per-source keep rate for the
    largest budget achievable at the target mixture. The min/sum over the
    S-row aggregate run as unpartitioned windows — O(#sources), the only
    single-partition step."""
    per_src = (
        docs.select(
            "source",
            n_tokens_expr().alias("nt"),
            default_weight_expr().alias("u"),
        )
        .groupBy("source")
        .agg(
            F.count("*").alias("n_total"),
            F.sum("nt").alias("tok_total"),
            F.min("u").alias("u"),
        )
    )
    w_all = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    # w = u/sum_u; B = min(T/w); r = w*B/T  — same tree as the oracle SQL
    w = F.col("u").cast("double") / F.sum("u").over(w_all).cast("double")
    budget = F.min(F.col("tok_total").cast("double") / w).over(w_all)
    rate = F.least(
        F.lit(1.0), w * budget / F.col("tok_total").cast("double")
    )
    return per_src.select("source", "n_total", "tok_total", rate.alias("rate"))


def source_mixture(docs: DataFrame) -> DataFrame:
    """Apply the rates: per-source rollup of the deterministically-kept
    docs — (source, n_total, tok_total, n_kept, tok_kept, rate_6).
    The rates side is S rows → broadcast; the corpus side is one scan."""
    rates = source_rates(docs)
    gated = (
        docs.select(
            "source", "doc_id", n_tokens_expr().alias("nt")
        )
        .join(F.broadcast(rates), "source")
        .withColumn("keep", (hash_frac(F.col("doc_id")) < F.col("rate")))
    )
    return gated.groupBy("source").agg(
        F.min("n_total").alias("n_total"),
        F.min("tok_total").alias("tok_total"),
        F.sum(F.col("keep").cast("int")).alias("n_kept"),
        F.sum(F.when(F.col("keep"), F.col("nt")).otherwise(0)).alias(
            "tok_kept"
        ),
        F.round(F.min("rate"), 6).alias("rate_6"),
    )


QUANTILES = (0.25, 0.5, 0.75)  # curriculum quartile cut points


def bucket_lut(docs: DataFrame) -> DataFrame:
    """(n_chars, bucket): each distinct value's exact-quantile bucket,
    WITHOUT Spark's `percentile` aggregate (whose buffer is O(rows) per
    group — not scale-true) and without any boundary self-join. The
    corpus collapses to its VALUE DISTRIBUTION first (groupBy n_chars —
    bounded cardinality for a length-like measure; bucket a truly
    continuous measure before calling); the CDF walk is a window over the
    O(distinct)-row aggregate — the same shape as the mixture-rate and
    packing-prefix arithmetic. A value v belongs above threshold p
    exactly when the cumulative count BEFORE v (cum − cnt) has already
    reached ceil(p·n), so bucket(v) = Σ_p [cum − cnt ≥ ceil(p·n)] — the
    smallest value reaching a threshold stays in the lower bucket, i.e.
    discrete quantiles with ties kept together."""
    vals = docs.groupBy("n_chars").agg(F.count("*").alias("cnt"))
    w_cdf = Window.orderBy("n_chars").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_all = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cdf = vals.select(
        "n_chars",
        (F.sum("cnt").over(w_cdf) - F.col("cnt")).alias("pre"),
        F.sum("cnt").over(w_all).alias("n"),
    )
    bucket = sum(
        (F.col("pre") >= F.ceil(F.lit(p) * F.col("n"))).cast("int")
        for p in QUANTILES
    )
    return cdf.select("n_chars", bucket.alias("bucket"))


def curriculum_bins(docs: DataFrame) -> DataFrame:
    """Per-quartile curriculum rollup: docs binned by exact n_chars
    quartiles — (bucket, n_docs, chars_total, min_chars, max_chars).
    The bucket lookup table is O(distinct values) rows → broadcast
    equi-join on the REAL key n_chars (no constant-key hack, which
    Catalyst folds into a BroadcastNestedLoopJoin — the suite-wide plan
    assertion forbids those)."""
    lut = bucket_lut(docs)
    return (
        docs.select("doc_id", "n_chars")
        .join(F.broadcast(lut), "n_chars")
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("chars_total"),
            F.min("n_chars").alias("min_chars"),
            F.max("n_chars").alias("max_chars"),
        )
    )


def curriculum_bins_sql() -> str:
    """DuckDB twin — the identical distribution-rollup CTE chain, so the
    oracle shares no engine quantile implementation with either side."""
    hits = " + ".join(
        f"CAST(cum - cnt >= ceil({p} * n) AS INT)" for p in QUANTILES
    )
    return (
        "WITH v AS (SELECT n_chars, count(*) AS cnt FROM documents "
        "GROUP BY n_chars), "
        "c AS (SELECT n_chars, cnt, "
        "CAST(sum(cnt) OVER (ORDER BY n_chars ROWS UNBOUNDED PRECEDING) "
        "AS BIGINT) AS cum, "
        "CAST(sum(cnt) OVER () AS BIGINT) AS n FROM v), "
        f"l AS (SELECT n_chars, CAST({hits} AS INT) AS bucket FROM c) "
        "SELECT bucket, count(*) AS n_docs, "
        "CAST(sum(n_chars) AS BIGINT) AS chars_total, "
        "min(n_chars) AS min_chars, max(n_chars) AS max_chars "
        "FROM documents JOIN l USING (n_chars) GROUP BY bucket"
    )


_SQL_NT = "CAST(length(text) - length(replace(text, ' ', '')) + 1 AS BIGINT)"


def sql_frac(col: str) -> str:
    """DuckDB twin of ``hash_frac`` for any integer column expression."""
    return (
        f"(CAST(('0x' || substr(md5(CAST({col} AS VARCHAR)), 1, 8)) "
        "AS UBIGINT) / 4294967296.0)"
    )


_SQL_FRAC = sql_frac("doc_id")


def source_mixture_sql() -> str:
    """DuckDB twin — the same expression tree, single-stream."""
    return (
        "WITH d AS (SELECT source, doc_id, "
        f"{_SQL_NT} AS nt, "
        "CAST(CAST(substr(source, 4, 10) AS INT) % 3 + 1 AS BIGINT) AS u "
        "FROM documents), "
        "s AS (SELECT source, count(*) AS n_total, "
        "CAST(sum(nt) AS BIGINT) AS tok_total, min(u) AS u FROM d "
        "GROUP BY source), "
        "r0 AS (SELECT source, n_total, tok_total, "
        "CAST(u AS DOUBLE) / CAST(sum(u) OVER () AS DOUBLE) AS w FROM s), "
        "r AS (SELECT source, n_total, tok_total, "
        "least(1.0, w * min(CAST(tok_total AS DOUBLE) / w) OVER () / "
        "CAST(tok_total AS DOUBLE)) AS rate FROM r0) "
        "SELECT d.source AS source, min(r.n_total) AS n_total, "
        "min(r.tok_total) AS tok_total, "
        f"CAST(sum(CASE WHEN {_SQL_FRAC} < r.rate THEN 1 ELSE 0 END) "
        "AS BIGINT) AS n_kept, "
        f"CAST(sum(CASE WHEN {_SQL_FRAC} < r.rate THEN nt ELSE 0 END) "
        "AS BIGINT) AS tok_kept, "
        "round(min(r.rate), 6) AS rate_6 "
        "FROM d JOIN r USING (source) GROUP BY d.source"
    )
