"""Similarity search over embedding columns (SURVEY.md §2.12):
brute-force cosine top-k (the exactness baseline) and LSH/IVF-style
bucketed ANN (the scale path).

Scale design: brute-force is a map-side scan + TakeOrderedAndProject
(per-partition top-k then driver merge of k·partitions rows — never a
full sort). The bucketed variant prunes candidates with a coarse
quantizer so each query only scans its probe cells; both sides shuffle
on cell ids only.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from security_master_spark.datasets import fan_out
from security_master_spark.functions.vector import cosine, dot, norm


def cosine_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine against one query vector. Ties broken by
    id for determinism. Plans as scan → project → TakeOrderedAndProject."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    return (
        embeddings.select(
            F.col(id_col),
            cosine(F.col(vec_col), q).alias("cos_sim"),
        )
        .orderBy(F.desc("cos_sim"), F.asc(id_col))
        .limit(k)
    )


def knn_per_group(
    embeddings: DataFrame,
    group_col: str,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """k nearest neighbors for every vector, blocked by ``group_col``
    (label/partition blocking = the trivial IVF: candidates only within
    the same cell). CrossJoin is confined within groups; the window
    top-k shuffles on (group, left id)."""
    embeddings = fan_out(embeddings)  # per-pair cosine folds are the cost
    a = embeddings.select(
        F.col(group_col).alias("__g"),
        F.col(id_col).alias("id_a"),
        F.col(vec_col).alias("vec_a"),
    )
    b = embeddings.select(
        F.col(group_col).alias("__g"),
        F.col(id_col).alias("id_b"),
        F.col(vec_col).alias("vec_b"),
    )
    pairs = a.join(b, "__g").filter(F.col("id_a") != F.col("id_b"))
    scored = pairs.select(
        F.col("__g").alias(group_col),
        "id_a",
        "id_b",
        cosine(F.col("vec_a"), F.col("vec_b")).alias("cos_sim"),
    )
    w = Window.partitionBy(group_col, "id_a").orderBy(
        F.desc("cos_sim"), F.asc("id_b")
    )
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def random_hyperplane_cells(
    vec: Column, n_planes: int = 8, seed: int = 7, dim: int = 64
) -> Column:
    """Sign-LSH cell id: bit b = sign(<v, h_b>) with deterministic
    pseudo-random hyperplanes derived from xxhash64(seed, b, i). Cheap
    JVM-only quantizer for ANN bucketing."""
    def plane_component(b: int, i: Column) -> Column:
        h = F.xxhash64(F.lit(seed), F.lit(b), i)
        # map hash → {-1, +1}
        return F.when(h.bitwiseAND(F.lit(1)) == 1, F.lit(1.0)).otherwise(F.lit(-1.0))

    # closure factory — a default-arg lambda would change the apparent
    # arity PySpark uses to build the higher-order function.
    def project(b: int):
        return lambda x, i: x.cast("double") * plane_component(b, i)

    bits = [
        F.when(
            F.aggregate(
                F.zip_with(vec, F.sequence(F.lit(0), F.lit(dim - 1)), project(b)),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            > 0,
            F.lit(1 << b),
        ).otherwise(F.lit(0))
        for b in range(n_planes)
    ]
    out = bits[0]
    for b in bits[1:]:
        out = out.bitwiseOR(b)
    return out


def _multi_table_cells(
    vec: Column, n_planes: int, n_tables: int, dim: int
) -> Column:
    """Array of (table_id << 32) | cell_id — one sign-LSH cell per hash
    table, each table with independent hyperplanes (seed = table id)."""
    return F.array(
        *[
            F.shiftleft(F.lit(t).cast("long"), 32).bitwiseOR(
                random_hyperplane_cells(vec, n_planes, seed=101 + t, dim=dim)
            )
            for t in range(n_tables)
        ]
    )


def ann_topk_lsh(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_planes: int = 8,
    n_tables: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "q_id",
    query_vec_col: str = "q_vec",
    dim: int = 64,
) -> DataFrame:
    """Approximate top-k: corpus and queries bucketed by sign-LSH cell
    in ``n_tables`` independent hash tables, equi-joined on cell id (no
    corpus crossJoin), candidates deduped across tables, exact cosine
    rank within the candidate set.

    Recall/cost dial: P(candidate) = 1 − (1 − p^planes)^tables with
    p = 1 − θ/π per plane — more tables buys recall linearly in shuffle
    volume, more planes cuts candidates exponentially. Shuffle is
    O((corpus + queries) · tables) cell-id pairs, never vectors²;
    per-bucket exact ranking keeps the whole thing one window + filter.
    """
    corpus = fan_out(embeddings).withColumn(
        "__cell",
        F.explode(_multi_table_cells(F.col(vec_col), n_planes, n_tables, dim)),
    )
    qs = queries.withColumn(
        "__cell",
        F.explode(_multi_table_cells(F.col(query_vec_col), n_planes, n_tables, dim)),
    )
    candidates = (
        qs.join(corpus, "__cell")
        .select(query_id_col, query_vec_col, id_col, vec_col)
        .dropDuplicates([query_id_col, id_col])
    )
    scored = candidates.select(
        query_id_col,
        F.col(id_col),
        cosine(F.col(query_vec_col), F.col(vec_col)).alias("cos_sim"),
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cos_sim"), F.asc(id_col))
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )
