"""Round-5 aggregate batch 4 (SURVEY.md §2.4): a count-min sketch
with a FULL SQL oracle.

a8/a24 (HLL), a20 (KLL), a21 (theta) covered distinct-count,
quantile, and set sketches — all certified by weak/bounded checks
because their binary registers are engine-specific. The count-min
sketch is different: its registers are plain (row, bucket) counters,
so building it from md5-derived bucket indices makes the WHOLE
sketch — and every estimate read from it — bit-identical across
engines. This is the one sketch family where the driver's hash gate
can certify the estimator itself, not just a tolerance band.

Registered past the driver's ~50-entry correctness cap on purpose
(see plans/registry.py) — driver rows come in round 5; until then the
local oracle mirror (tests/test_correctness.py) proves them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from security_master_spark.datasets import load_table
from security_master_spark.plans.registry import register

_DEPTH = 4  # independent hash rows
_WIDTH = 1024  # counters per row (ε ≈ e/1024 ≈ 0.27 %)
_PROBE_MAX = 20  # probe keys: l_partkey 1..20


def _bucket_sql(key_expr: str) -> str:
    return (
        f"CAST(('0x' || substr(md5(CAST(i AS VARCHAR) || ':' || "
        f"CAST({key_expr} AS VARCHAR)), 1, 8)) AS BIGINT) % {_WIDTH}"
    )


def _bucket_col(key):
    return (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.col("i").cast("string"),
                        F.lit(":"),
                        key.cast("string"),
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % _WIDTH
    )


@register(
    "a26_count_min_sketch",
    oracle=f"""
    WITH hashes AS (
        SELECT UNNEST(range({_DEPTH})) AS i
    ), sketch AS (
        SELECT i, {_bucket_sql("l_partkey")} AS bucket, COUNT(*) AS cnt
        FROM lineitem CROSS JOIN hashes
        GROUP BY 1, 2
    ), probe AS (
        SELECT DISTINCT l_partkey AS key FROM lineitem
        WHERE l_partkey <= {_PROBE_MAX}
    ), pb AS (
        SELECT key, i, {_bucket_sql("key")} AS bucket
        FROM probe CROSS JOIN hashes
    ), est AS (
        SELECT key, MIN(cnt) AS est
        FROM pb JOIN sketch USING (i, bucket)
        GROUP BY key
    ), exact AS (
        SELECT l_partkey AS key, COUNT(*) AS exact_cnt
        FROM lineitem WHERE l_partkey <= {_PROBE_MAX}
        GROUP BY l_partkey
    )
    SELECT exact.key AS l_partkey,
           CAST(exact.exact_cnt AS BIGINT) AS exact_count,
           CAST(est.est AS BIGINT) AS cms_estimate,
           CAST(est.est - exact.exact_cnt AS BIGINT) AS overestimate
    FROM exact JOIN est USING (key)
    """,
)
def a26_count_min_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch (Cormode & Muthukrishnan 2005) built with
    md5-derived bucket indices so the estimator is deterministic and
    CROSS-ENGINE REPRODUCIBLE — the oracle recomputes the identical
    sketch in DuckDB and the driver hash-compares the estimates
    themselves. Probes keys 1..20 and reports estimate vs
    exact (CMS can only overestimate; the overestimate column is the
    collision mass, ≤ εN w.h.p. with ε = e/width ≈ 0.27 %).

    Scale shape — the point of the sketch: the build explodes each
    row ×4 map-side, and partial hash aggregation collapses
    every task's stream to ≤ 4·1024 counter rows BEFORE
    the exchange — the shuffle moves sketches, not data, exactly like
    Spark's own partial HLL. The merged sketch (4×1024
    rows) then broadcasts to the probe side; estimates are a MIN over
    depth rows. At 100 TB the wide plan is: scan → per-task sketch →
    one tiny shuffle → broadcast — the canonical mergeable-summary
    posture."""
    li = load_table(spark, sf_dir, "lineitem")
    hashes = F.explode(F.sequence(F.lit(0), F.lit(_DEPTH - 1))).alias("i")
    sketch = (
        li.select(F.col("l_partkey"), hashes)
        .select("i", _bucket_col(F.col("l_partkey")).alias("bucket"))
        .groupBy("i", "bucket")
        .agg(F.count("*").alias("cnt"))
    )
    probe = (
        li.filter(F.col("l_partkey") <= _PROBE_MAX)
        .select(F.col("l_partkey").alias("key"))
        .distinct()
    )
    pb = probe.select(F.col("key"), hashes).select(
        "key", "i", _bucket_col(F.col("key")).alias("bucket")
    )
    est = (
        pb.join(F.broadcast(sketch), ["i", "bucket"])
        .groupBy("key")
        .agg(F.min("cnt").alias("est"))
    )
    exact = (
        li.filter(F.col("l_partkey") <= _PROBE_MAX)
        .groupBy(F.col("l_partkey").alias("key"))
        .agg(F.count("*").alias("exact_cnt"))
    )
    return exact.join(est, "key").select(
        F.col("key").alias("l_partkey"),
        F.col("exact_cnt").cast("bigint").alias("exact_count"),
        F.col("est").cast("bigint").alias("cms_estimate"),
        (F.col("est") - F.col("exact_cnt")).cast("bigint")
        .alias("overestimate"),
    )
