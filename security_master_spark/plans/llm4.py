"""Round-4 LLM-pipeline candidates (SURVEY.md §2.12): unigram
language-model surprisal scoring.

Registered AFTER the round-3 head block (plans/registry.py): rotates
into the driver's correctness window next round; the local mirror is
its evidence until then.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from security_master_spark.datasets import load_table
from security_master_spark.functions.rounding import dround, sql_dround
from security_master_spark.plans.registry import register


@register(
    "l29_unigram_surprisal",
    oracle=f"""
    WITH tok AS (
        SELECT doc_id, t.token AS token
        FROM documents, UNNEST(string_split(text, ' ')) AS t(token)
    ), tf AS (
        SELECT token, COUNT(*) AS tf FROM tok GROUP BY token
    ), total AS (
        SELECT CAST(SUM(tf) AS BIGINT) AS n FROM tf
    )
    SELECT tok.doc_id,
           COUNT(*) AS n_tokens,
           {sql_dround(
               "AVG(-LOG2(CAST(tf.tf AS DOUBLE) / CAST(total.n AS DOUBLE)))",
               6,
           )} AS avg_surprisal_bits
    FROM tok JOIN tf ON tok.token = tf.token CROSS JOIN total
    GROUP BY tok.doc_id
    """,
)
def l29_unigram_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-LM quality score: mean token surprisal −log2 p(token)
    per document, the cheap stand-in for perplexity filtering (low =
    repetitive boilerplate, high = rare-token noise; mid-band =
    keepable text). The LM *is* the corpus term-frequency table:
    explode → tf agg, 1-row total broadcast, then the token stream
    re-joins the broadcast vocabulary — at 100 TB the vocab is the
    only broadcast state (it is Zipf-bounded, ~millions of rows, far
    under broadcast limits after a min-count floor) and the heavy
    token stream never shuffles twice: surprisal is attached map-side
    and the only wide exchange is the final per-doc aggregation.
    dround(…, 6) absorbs LOG2/summation-order ulps."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.explode(F.split(F.col("text"), " ", -1)).alias("token")
    )
    tf = tok.groupBy("token").agg(F.count("*").alias("tf"))
    total = tf.agg(F.sum("tf").cast("bigint").alias("n"))
    p = F.col("tf").cast("double") / F.col("n").cast("double")
    return (
        tok.join(F.broadcast(tf), "token")
        .crossJoin(F.broadcast(total))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            dround(F.avg(-F.log2(p)), 6).alias("avg_surprisal_bits"),
        )
    )
