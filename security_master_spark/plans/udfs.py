"""UDF / UDAF / UDTF surface (SURVEY.md §2.13).

Each Python-execution flavor gets one query, and — because every UDF
here computes a deterministic, SQL-expressible function — each gets a
full DuckDB oracle rather than the weak rows-only check: the point is
to prove the Python crossing itself is semantics-preserving.

Scale discipline: all of these cross the JVM↔Python boundary, which is
the slow path (SURVEY.md §2.13). The vectorized forms (pandas_udf,
applyInPandas, mapInPandas) move data as Arrow record batches; the
row-at-a-time form (u1) exists to cover the API surface and is kept on
a small input. In the hot path of a real pipeline, prefer the
equivalent built-in expressions (plans/scalars.py shows most of them).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf, udf
from pyspark.sql.types import IntegerType

from security_master_spark.datasets import load_table
from security_master_spark.functions.rounding import dround, sql_dround
from security_master_spark.plans.registry import register


# --------------------------------------------------------------------------
# u1 — row-at-a-time Python scalar UDF
# --------------------------------------------------------------------------
def _make_py_token_count():
    def token_count(s: str) -> int | None:
        if s is None:
            return None
        # split on single spaces (not .split()) to match the SQL
        # oracle's string_split semantics exactly, empty fields included
        return len(s.split(" "))

    return udf(token_count, IntegerType())


@register(
    "u1_python_scalar_udf",
    oracle="""
    SELECT doc_id,
           LEN(string_split(text, ' ')) AS n_tokens,
           n_chars
    FROM documents
    """,
)
def u1_python_scalar_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-at-a-time Python UDF (token count); the oracle recomputes it
    in SQL, proving the Py4J round-trip preserves values."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", _make_py_token_count()("text").alias("n_tokens"), "n_chars"
    )


# --------------------------------------------------------------------------
# u2 — vectorized (Arrow) scalar pandas UDF
# --------------------------------------------------------------------------
def _make_log_price():
    def log_price(s: pd.Series) -> pd.Series:
        import numpy as np

        return np.log1p(s)

    return pandas_udf(log_price, "double")


@register(
    "u2_pandas_scalar_udf",
    oracle=f"""
    SELECT o_orderkey,
           {sql_dround("LN(1 + o_totalprice)", 6)} AS log_price
    FROM orders
    """,
)
def u2_pandas_scalar_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-vectorized scalar UDF: numpy log1p over batch columns —
    the 10-100× faster Python crossing (SURVEY.md §2.13)."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        dround(_make_log_price()("o_totalprice"), 6).alias("log_price"),
    )


# --------------------------------------------------------------------------
# u3 — grouped-aggregate pandas UDF (UDAF)
# --------------------------------------------------------------------------
def _make_weighted_avg_price():
    def weighted_avg_price(price: pd.Series, qty: pd.Series) -> float:
        return float((price * qty).sum() / qty.sum())

    return pandas_udf(weighted_avg_price, "double")


@register(
    "u3_grouped_agg_udaf",
    oracle=f"""
    SELECT l_returnflag,
           {sql_dround("SUM(l_extendedprice * l_quantity) / SUM(l_quantity)", 2)}
               AS weighted_price
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def u3_grouped_agg_udaf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-agg pandas UDF: quantity-weighted mean price per return
    flag. The whole group is shipped to Python as one Arrow batch (no
    partial aggregation) — fine for bounded group counts, wrong tool
    for high-cardinality keys at 100 TB (use built-in sum/sum there)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        dround(
            _make_weighted_avg_price()("l_extendedprice", "l_quantity"), 2
        ).alias("weighted_price")
    )


# --------------------------------------------------------------------------
# u4 — grouped-map applyInPandas
# --------------------------------------------------------------------------
def _demean_group(pdf: pd.DataFrame) -> pd.DataFrame:
    out = pdf[["event_id", "event_type", "value"]].copy()
    out["value_demeaned"] = pdf["value"] - pdf["value"].mean()
    return out.drop(columns=["value"])


@register(
    "u4_apply_in_pandas",
    oracle=f"""
    SELECT event_id, event_type,
           {sql_dround("value - AVG(value) OVER (PARTITION BY event_type)", 6)}
               AS value_demeaned
    FROM events
    """,
)
def u4_apply_in_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map UDF: per-event-type demeaning. Each group becomes one
    pandas frame on one executor — the custom-per-group-transform shape
    (the oracle shows the window-function equivalent Catalyst would
    keep JVM-side)."""
    events = load_table(spark, sf_dir, "events")
    out = events.groupBy("event_type").applyInPandas(
        _demean_group,
        schema="event_id long, event_type string, value_demeaned double",
    )
    return out.withColumn("value_demeaned", dround(F.col("value_demeaned"), 6))


# --------------------------------------------------------------------------
# u5 — partition-wise mapInPandas
# --------------------------------------------------------------------------
def _flag_large(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        out = pdf[["o_orderkey", "o_totalprice"]].copy()
        out["is_large"] = pdf["o_totalprice"] > 200000.0
        yield out


@register(
    "u5_map_in_pandas",
    oracle="""
    SELECT o_orderkey, o_totalprice,
           o_totalprice > 200000.0 AS is_large
    FROM orders
    """,
)
def u5_map_in_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInPandas: streaming iterator of Arrow batches per partition —
    the shape for stateless record transforms (and for API-ingestion
    sources, SURVEY.md §2.1) that never materializes a whole partition."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.mapInPandas(
        _flag_large, schema="o_orderkey long, o_totalprice double, is_large boolean"
    )


# --------------------------------------------------------------------------
# u6 — table-valued UDTF with LATERAL join
# --------------------------------------------------------------------------
@register(
    "u6_udtf_lateral",
    oracle="""
    SELECT d.doc_id, t.i AS pos,
           string_split(d.text, ' ')[t.i] AS token
    FROM documents d,
         UNNEST(generate_series(1, LEN(string_split(d.text, ' ')))) AS t(i)
    WHERE d.doc_id < 50
    """,
)
def u6_udtf_lateral(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (one row in → N rows out) applied via SQL LATERAL:
    positional tokenizer. 1-based positions to match SQL array
    indexing."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos: int, token: string")
    class PosTokenize:
        def eval(self, text: str):
            if text is None:
                return
            for i, tok in enumerate(text.split(" "), start=1):
                yield i, tok

    spark.udtf.register("pos_tokenize", PosTokenize)
    load_table(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return spark.sql(
        """
        SELECT d.doc_id, t.pos, t.token
        FROM documents d,
             LATERAL pos_tokenize(d.text) AS t
        WHERE d.doc_id < 50
        """
    )
