"""Driver simulation: foreign SparkSession + __spark_entry__ contract.

Mimics the external harness: a *plain* SparkSession (no engine confs),
imports __spark_entry__ from /root/repo, smoke-checks entry(), then for
every queries()[name] at sf0.01 compares against oracle_sql()[name] run
by DuckDB over the same parquet files. BOTH sides go through pandas
(Spark .toPandas(), DuckDB .df()) and the same canonicalizer as the
repo's tests/oracle.py (floats rounded 9dp with a NaN sentinel and
-0.0 -> 0.0, timestamps -> naive isoformat with midnight-date
normalization), matching observed real-driver behavior across rounds.
"""
import datetime
import hashlib
import math
import sys
import time
from decimal import Decimal

import duckdb
import numpy as np
import pandas as pd

import os as _os

SF_DIR = _os.environ.get("SIM_SF_DIR", "/root/testdata/sf0.01")
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()
FLOAT_DP = 9


def _date_norm(iso):
    return iso[:-9] if iso.endswith("T00:00:00") else iso


def canon(v):
    if v is None or v is pd.NaT:
        return "\0"
    if isinstance(v, (np.ndarray, list, tuple)):
        return "ARRAY_CELL_CRASH"  # the real driver crashes on these
    if isinstance(v, (bool, np.bool_)):
        return str(bool(v))
    if isinstance(v, (float, np.floating, Decimal)):
        f = float(v)
        if math.isnan(f):
            return "NaN"
        if math.isinf(f):
            return "Inf" if f > 0 else "-Inf"
        r = round(f, FLOAT_DP)
        return repr(0.0 if r == 0 else r)
    if isinstance(v, (int, np.integer)):
        return str(int(v))
    if isinstance(v, pd.Timestamp):
        v = v.tz_localize(None) if v.tzinfo is not None else v
        return _date_norm(v.isoformat())
    if hasattr(v, "isoformat"):
        if hasattr(v, "tzinfo") and v.tzinfo is not None:
            v = v.replace(tzinfo=None)
        return _date_norm(v.isoformat())
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).hex()
    return str(v)


def frame_hash(df):
    cols = sorted(df.columns)
    rows = sorted(
        "|".join(canon(df[c].iloc[i]) for c in cols) for i in range(len(df))
    )
    return hashlib.md5("\n".join(rows).encode()).hexdigest()


def parse_argv(argv):
    """``[query ...] [--json PATH]`` → (json_out, only). ``--json``
    must be followed by a path (not another flag): a trailing
    ``--json`` used to raise an uncaught IndexError, and a reordered
    flag silently swallowed the first query name as its value."""
    json_out = None
    if "--json" in argv:
        i = argv.index("--json")
        if i + 1 >= len(argv) or argv[i + 1].startswith("--"):
            sys.exit(
                "usage: driver_sim.py [QUERY ...] [--json PATH] — "
                "--json requires a path argument"
            )
        json_out = argv[i + 1]
        argv = argv[:i] + argv[i + 2:]
    unknown = [a for a in argv if a.startswith("--")]
    if unknown:
        sys.exit(f"usage: driver_sim.py [QUERY ...] [--json PATH] — "
                 f"unknown flag(s): {unknown}")
    return json_out, (argv or None)


def main():
    sys.path.insert(0, "/root/repo")
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("driver_sim")
        .getOrCreate()
    )
    import __spark_entry__ as entrymod

    n = entrymod.entry(spark).count()
    print(f"entry() ok: {n} rows", flush=True)

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    json_out, only = parse_argv(sys.argv[1:])
    ok = weak = bad = 0
    records = {}
    t_start = time.time()
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            spdf = fn(spark, SF_DIR).toPandas()
        except Exception as ex:
            print(f"ERR  {name}: spark-side {type(ex).__name__}: {str(ex)[:300]}", flush=True)
            bad += 1
            records[name] = {
                "rows_match": None, "schema_match": None,
                "hash_match": None, "spark_rows": None,
                "oracle_rows": None,
                "err": f"spark: {type(ex).__name__}: {str(ex)[:200]}",
            }
            continue
        if name not in oracles:
            print(f"WEAK {name}: rows={len(spdf)} ({time.time()-t0:.1f}s)", flush=True)
            weak += 1
            records[name] = {
                "rows_match": None, "schema_match": None,
                "hash_match": None, "spark_rows": len(spdf),
                "oracle_rows": None, "err": "no_oracle",
            }
            continue
        try:
            opdf = con.sql(oracles[name]).df()
        except Exception as ex:
            print(f"ERR  {name}: oracle-side {type(ex).__name__}: {str(ex)[:300]}", flush=True)
            bad += 1
            records[name] = {
                "rows_match": None, "schema_match": None,
                "hash_match": None, "spark_rows": len(spdf),
                "oracle_rows": None,
                "err": f"oracle: {type(ex).__name__}: {str(ex)[:200]}",
            }
            continue
        problems = []
        schema_match = sorted(spdf.columns) == sorted(opdf.columns)
        rows_match = len(spdf) == len(opdf)
        if not schema_match:
            problems.append(f"cols {sorted(spdf.columns)} != {sorted(opdf.columns)}")
        if not rows_match:
            problems.append(f"rows {len(spdf)} != {len(opdf)}")
        hash_match = (
            frame_hash(spdf) == frame_hash(opdf) if not problems else False
        )
        if not problems and not hash_match:
            problems.append("value-hash mismatch")
        records[name] = {
            "rows_match": rows_match, "schema_match": schema_match,
            "hash_match": hash_match, "spark_rows": len(spdf),
            "oracle_rows": len(opdf),
            "err": "; ".join(problems) or None,
        }
        if problems:
            print(f"BAD  {name}: {'; '.join(problems)}", flush=True)
            bad += 1
        else:
            ok += 1
            print(f"ok   {name} rows={len(spdf)} ({time.time()-t0:.1f}s)", flush=True)
    if json_out:
        import json as _json

        with open(json_out, "w", encoding="utf-8") as f:
            _json.dump(records, f, indent=1)
        print(f"wrote {len(records)} records to {json_out}", flush=True)
    print(
        f"\n{'ALL OK' if bad == 0 else 'FAILURES'} ({ok} ok, {weak} weak, {bad} bad) "
        f"in {time.time()-t_start:.0f}s",
        flush=True,
    )
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
