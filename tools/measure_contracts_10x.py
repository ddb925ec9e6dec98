"""Round-9 re-proof of the two oldest weak contracts at current code
(round-8 verdict order #5): l21's IVF recall floor (pinned r02) and
l48's PCA spectral contract (pinned r06), both re-run against the 10×
embeddings stress corpus (tools/gen_stress.py emb → /tmp/stress_emb,
100k × 64, 10 Gaussian clusters vs the fixtures' 10k). Prints the
recall / residual numbers recorded in PLANS.md.

Values here are DETERMINISTIC given the corpus (fixed-seed
hyperplanes, k-means on a fixed frame, exact algebra) — unlike the
timing studies this does not need an exclusive box.

Usage: python tools/measure_contracts_10x.py [emb_dir]
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(emb_dir: str = "/tmp/stress_emb") -> None:
    if not os.path.exists(f"{emb_dir}/embeddings.parquet"):
        from tools.gen_stress import gen_emb

        gen_emb(emb_dir)

    from security_master_spark.session import get_spark

    spark = get_spark()  # engine defaults incl. 16g driver heap
    from security_master_spark.datasets import load_table
    from security_master_spark.operators.pca import (
        covariance_matrix,
        principal_components,
        project,
    )
    from security_master_spark.operators.similarity import (
        cosine_topk,
        ivf_topk,
    )

    emb = load_table(spark, emb_dir, "embeddings")
    n = emb.count()
    print(f"corpus: {n} vectors from {emb_dir}")

    # --- l21 contract: IVF recall vs brute force, l21's exact params
    queries_df = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    approx = ivf_topk(emb, queries_df, k=5, n_cells=16, nprobe=4).collect()
    by_q: dict[int, set[int]] = {}
    for r in approx:
        by_q.setdefault(r.q_id, set()).add(r.vec_id)
    qvecs = {
        r.vec_id: list(r.embedding)
        for r in emb.filter(F.col("vec_id") < 10).collect()
    }
    hits = total = 0
    for q, got in sorted(by_q.items()):
        exact = {
            r.vec_id for r in cosine_topk(emb, qvecs[q], k=5).collect()
        }
        hits += len(got & exact)
        total += len(exact)
    print(
        f"l21 IVF recall@5 (16 cells / probe 4): {hits}/{total} "
        f"= {hits / total:.3f}  (floor 0.45)"
    )

    # --- l48 contract: spectral residuals at 10x
    comps, vals, total_var = principal_components(emb, "embedding", k=2)
    n1 = math.sqrt(sum(x * x for x in comps[0]))
    n2 = math.sqrt(sum(x * x for x in comps[1]))
    dot12 = sum(a * b for a, b in zip(comps[0], comps[1]))
    trace = sum(
        r["cov"]
        for r in covariance_matrix(emb, "embedding").collect()
        if r["i"] == r["j"]
    )
    proj = emb.select(
        project(F.col("embedding"), comps[0]).alias("p1"),
        project(F.col("embedding"), comps[1]).alias("p2"),
    )
    row = proj.agg(
        F.var_pop("p1").alias("v1"), F.var_pop("p2").alias("v2")
    ).collect()[0]
    print(
        "l48 spectral residuals: "
        f"|1-||c1||| = {abs(n1 - 1):.2e}, |1-||c2||| = {abs(n2 - 1):.2e}, "
        f"|c1.c2| = {abs(dot12):.2e}"
    )
    print(
        f"  eigenvalues: {vals[0]:.6f} >= {vals[1]:.6f} >= 0; "
        f"trace - total_var = {abs(trace - total_var):.2e}"
    )
    print(
        "  projection-variance residuals: "
        f"|var(p1)-λ1|/λ1 = {abs(row['v1'] - vals[0]) / vals[0]:.2e}, "
        f"|var(p2)-λ2|/λ2 = {abs(row['v2'] - vals[1]) / vals[1]:.2e} "
        "(contract 1e-9)"
    )
    spark.stop()


if __name__ == "__main__":
    main(*sys.argv[1:2])
