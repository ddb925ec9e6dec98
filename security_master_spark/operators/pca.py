"""Distributed covariance + PCA over an embedding column.

The covariance matrix of an (n × d) embedding table is the canonical
"big data, small model" computation: the data never fits anywhere, the
d×d result always does. The scale-right shape is per-batch partial
outer products — each Arrow batch contributes its local X^T·X (d×d
doubles) and column sums, the shuffle carries only
O(batches · d²) partial rows, and one hash aggregate folds them. The
corpus is scanned exactly once; no O(n·d²) explode ever exists.

PCA then eigendecomposes the d×d matrix DRIVER-SIDE (numpy) — the
same driver-holds-constants discipline as the IVF coarse quantizer
(operators/similarity.py): k×d floats live on the driver, never the
data — and projects distributively through a zip_with/aggregate dot
product in JVM expressions.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from security_master_spark.datasets import fan_out


def _partial_cross_products(
    it: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """Per-batch partial Gram matrices: rows (i, j, sxy, cnt) for i<=j.

    float64 accumulation (float32 inputs widen BEFORE the matmul —
    a float32 X^T·X would lose the low bits the oracle keeps).
    """
    import numpy as np

    for pdf in it:
        if len(pdf) == 0:
            continue
        x = np.vstack(pdf["embedding"].to_numpy()).astype(np.float64)
        gram = x.T @ x
        iu, ju = np.triu_indices(gram.shape[0])
        yield pd.DataFrame(
            {
                "i": iu.astype("int32"),
                "j": ju.astype("int32"),
                "sxy": gram[iu, ju],
                "cnt": np.full(len(iu), len(x), dtype="int64"),
            }
        )


def covariance_matrix(emb: DataFrame, col: str = "embedding") -> DataFrame:
    """Population covariance of an array<float> column → (i, j, cov)
    rows for i <= j. One corpus scan (Arrow-batched partial Gram
    matrices), one shuffle of O(batches·d²) partial rows, plus an
    O(n·d) posexplode branch for the column means (its shuffle carries
    d keys).

    NULL vectors are excluded up front (covariance is over the rows
    that HAVE an embedding): a None in the Arrow batch reaches
    np.vstack as a 1-wide object and kills the worker, and the
    posexplode mean branch would skip the row anyway — filtering makes
    the two passes count the same population."""
    emb = fan_out(
        emb.select(F.col(col).alias("embedding")).filter(
            F.col("embedding").isNotNull()
        )
    )
    partials = emb.mapInPandas(
        _partial_cross_products, schema="i int, j int, sxy double, cnt bigint"
    )
    cross = partials.groupBy("i", "j").agg(
        F.sum("sxy").alias("sxy"), F.sum("cnt").alias("n")
    )
    sums = (
        emb.select(F.posexplode("embedding").alias("k", "xv"))
        .groupBy("k")
        .agg(F.sum(F.col("xv").cast("double")).alias("sx"))
    )
    mi = sums.select(F.col("k").alias("i"), F.col("sx").alias("sx_i"))
    mj = sums.select(F.col("k").alias("j"), F.col("sx").alias("sx_j"))
    n = F.col("n").cast("double")
    return (
        cross.join(F.broadcast(mi), "i")
        .join(F.broadcast(mj), "j")
        .select(
            "i",
            "j",
            (
                F.col("sxy") / n
                - (F.col("sx_i") / n) * (F.col("sx_j") / n)
            ).alias("cov"),
            F.col("n").alias("n"),
        )
    )


def principal_components(
    emb: DataFrame, col: str = "embedding", k: int = 2
) -> tuple[list[list[float]], list[float], float]:
    """Top-k eigenvectors of the embedding covariance (driver-side
    eigh on the collected d×d matrix — the only collect, O(d²)
    scalars). Sign-fixed: each component's largest-|.| coordinate is
    made positive, so the basis is deterministic. Returns
    (components, eigenvalues, total_variance)."""
    import numpy as np

    rows = covariance_matrix(emb, col).collect()
    if not rows:
        # Empty input: no spectrum exists. Return degenerate 1-d zero
        # components so callers' projection expressions still analyze
        # (they will project zero rows anyway) — the empty-partition /
        # fresh-dataset robustness contract (tests/test_robustness.py).
        return [[0.0] for _ in range(k)], [0.0] * k, 0.0
    d = max(r["j"] for r in rows) + 1
    cov = np.zeros((d, d))
    for r in rows:
        cov[r["i"], r["j"]] = r["cov"]
        cov[r["j"], r["i"]] = r["cov"]
    vals, vecs = np.linalg.eigh(cov)
    order = np.argsort(vals)[::-1][:k]
    comps = []
    for idx in order:
        v = vecs[:, idx]
        if v[int(np.argmax(np.abs(v)))] < 0:
            v = -v
        comps.append([float(x) for x in v])
    return comps, [float(vals[i]) for i in order], float(vals.sum())


def project(emb_col: Column, component: list[float]) -> Column:
    """Dot product of an array<float> column with a constant component
    vector, as a JVM zip_with/aggregate fold (no Python in the hot
    path)."""
    comp = F.array(*[F.lit(float(c)) for c in component])
    return F.aggregate(
        F.zip_with(
            emb_col, comp, lambda a, b: a.cast("double") * b
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
