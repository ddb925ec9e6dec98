"""Corpus-scale robustness: every registered query must survive
ALL-EMPTY input tables (schemas intact, zero rows). At 100 TB, empty
partitions, empty date ranges, and freshly-created datasets are
routine — an operator that crashes on them takes the whole job down.

Plus a harness-sensitivity canary: the oracle comparison must FAIL
when a query is genuinely wrong, or every green above it means
nothing.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from security_master_spark.datasets import TABLES
from security_master_spark.plans import registry

_QUERIES = registry.queries()


@pytest.fixture(scope="session")
def empty_sf_dir(tmp_path_factory, sf_dir):
    """All ten fixture tables with their real schemas and ZERO rows."""
    dst = tmp_path_factory.mktemp("empty_sf")
    for t in TABLES:
        schema = pq.read_schema(f"{sf_dir}/{t}.parquet")
        pq.write_table(
            pa.table(
                {f.name: pa.array([], f.type) for f in schema}, schema=schema
            ),
            str(dst / f"{t}.parquet"),
        )
    return str(dst)


@pytest.mark.parametrize("name", sorted(_QUERIES))
def test_query_survives_empty_tables(spark, empty_sf_dir, name):
    # Materializing must not raise; row count is query-specific (io
    # roundtrips and generators may legitimately emit rows from
    # non-table inputs), so only the no-crash contract is asserted.
    n = _QUERIES[name](spark, empty_sf_dir).count()
    assert n >= 0


def test_oracle_compare_has_teeth(spark, sf_dir):
    """Canary: feed the mirror a deliberately wrong query (q1 with a
    perturbed aggregate) against the REAL q1 oracle — compare() must
    fail. If this test ever passes silently, the whole correctness
    gate is decorative."""
    from pyspark.sql import functions as F

    from tests.oracle import compare

    sql = registry.oracle_sql()["q1_pricing_summary"]

    def wrong_q1(spark_, sf):
        df = _QUERIES["q1_pricing_summary"](spark_, sf)
        # same schema, same row count, one value column off by 1
        return df.withColumn("sum_qty", F.col("sum_qty") + 1)

    with pytest.raises(AssertionError):
        compare(spark, wrong_q1, sql, sf_dir)


#: queries that cross into Python (pandas/Arrow/numpy seams) — the
#: only place null payloads can CRASH instead of null-propagating
#: (JVM expressions propagate nulls by construction). Each of these
#: was observed to crash on the all-null sweep before hardening, or
#: shares the seam with one that did.
_PYTHON_SEAM_QUERIES = [
    "m1_multimodal_features",
    "m2_frame_sample",
    "m3_embedding_batch_score",
    "l13_ann_lsh_topk",
    "l20_embedding_near_dup_lsh",
    "l21_ivf_topk",
    "l47_embedding_covariance",
    "l48_pca_project",
    "d37_ewma_exact_distributed",
    "d38_forward_fill_distributed",
    "u2_pandas_scalar_udf",
    "u4_apply_in_pandas",
    "u5_map_in_pandas",
    "io5_api_ingest",
    # round-8 additions: the round-7 operators that cross the Arrow
    # seam joined the sweep once they entered the driver window
    "m7_image_tiling",
    "m8_audio_framing",
    "u14_apply_in_arrow",
    "u15_pandas_udaf_window",
]


@pytest.fixture(scope="session")
def null_payload_sf_dir(tmp_path_factory, sf_dir):
    """All ten fixture tables with key columns intact and every
    payload column NULL — the 'bad upstream extract' shape: rows
    exist, joins key up, but values/text/embeddings are all null."""
    import pyarrow as pa

    keep = {
        "r_regionkey", "n_nationkey", "n_regionkey", "c_custkey",
        "c_nationkey", "s_suppkey", "s_nationkey", "p_partkey",
        "o_orderkey", "o_custkey", "l_orderkey", "l_partkey",
        "l_suppkey", "l_linenumber", "event_id", "user_id", "doc_id",
        "vec_id",
    }
    dst = tmp_path_factory.mktemp("null_payload_sf")
    for t in TABLES:
        tbl = pq.read_table(f"{sf_dir}/{t}.parquet")
        cols = {
            f.name: tbl.column(f.name)
            if f.name in keep
            else pa.nulls(len(tbl), f.type)
            for f in tbl.schema
        }
        pq.write_table(pa.table(cols, schema=tbl.schema), str(dst / f"{t}.parquet"))
    return str(dst)


@pytest.mark.parametrize("name", _PYTHON_SEAM_QUERIES)
def test_python_seam_queries_survive_null_payloads(
    spark, null_payload_sf_dir, name
):
    """Null embeddings hash/probe no cell, unreadable media rows
    quarantine, null-key groups vanish from pandas passes — never a
    worker crash. (A one-off sweep ran ALL registered queries against
    this fixture; pure-JVM queries null-propagate by construction and
    are represented here by the seam list.)"""
    n = _QUERIES[name](spark, null_payload_sf_dir).count()
    assert n >= 0
