"""Custom Python DataSource (Spark 4 ``pyspark.sql.datasource`` API):
a partition-parallel deterministic tick generator.

This is the V2-style integration path for sources Spark has no
built-in reader for (internal feed protocols, exotic archives): the
source declares its schema and its PARTITIONS up front, so Spark
schedules one task per partition and the generator runs fully
parallel on executors — unlike a driver-side createDataFrame, nothing
materializes on the driver. Rows are produced from a pure function of
the row id, so the output is exactly reproducible cross-engine (the
io11 oracle regenerates it in SQL from generate_series).

The class must live in the shipped package (not a test or __main__)
because executors import it by module path when they deserialize the
read task (session._ship_package handles that).
"""

from __future__ import annotations

from datetime import datetime, timedelta, timezone

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)

#: Knuth multiplicative-hash constant — the deterministic "price" mix.
_MIX = 2654435761
_EPOCH = datetime(2024, 1, 1, tzinfo=timezone.utc)


class SyntheticTicksDataSource(DataSource):
    """``spark.read.format("synthetic_ticks")`` source.

    Options: ``rows`` (total row count), ``partitions`` (task count).
    """

    @classmethod
    def name(cls) -> str:
        return "synthetic_ticks"

    def schema(self) -> str:
        return "tick_id bigint, ts timestamp, price double"

    def reader(self, schema) -> "SyntheticTicksReader":
        return SyntheticTicksReader(
            int(self.options.get("rows", 1000)),
            int(self.options.get("partitions", 8)),
        )


class SyntheticTicksReader(DataSourceReader):
    def __init__(self, rows: int, partitions: int) -> None:
        self._rows = rows
        self._parts = partitions

    def partitions(self):
        # Declare the parallelism: contiguous id ranges, one per task.
        step = (self._rows + self._parts - 1) // self._parts
        return [
            InputPartition((lo, min(lo + step, self._rows)))
            for lo in range(0, self._rows, step)
        ]

    def read(self, partition):
        lo, hi = partition.value
        for i in range(lo, hi):
            # price: integer mix → 2-decimal value in [0, 100); exactly
            # re-expressible in SQL as ((i * MIX) % 10000) / 100.0
            price = ((i * _MIX) % 10000) / 100.0
            yield (i, _EPOCH + timedelta(seconds=i), price)


class SyntheticTicksStreamReader(SimpleDataSourceStreamReader):
    """``SimpleDataSourceStreamReader`` for the same tick stream: the
    Spark 4 Python STREAMING source protocol. Offsets are plain dicts
    checkpointed by the engine (commit() inherits the base no-op —
    nothing upstream to acknowledge); each microbatch materializes the
    id range [start, start + batch) through the same pure row function
    as the batch reader, so replaying any offset range reproduces
    identical rows — exactly the exactly-once replay contract a real
    feed adapter must honor (offsets ≡ positions in the upstream
    log)."""

    def __init__(self, batch_rows: int) -> None:
        self._batch = batch_rows

    def initialOffset(self):
        return {"next_id": 0}

    def read(self, start):
        lo = start["next_id"]
        hi = lo + self._batch
        rows = [
            (i, _EPOCH + timedelta(seconds=i), ((i * _MIX) % 10000) / 100.0)
            for i in range(lo, hi)
        ]
        return iter(rows), {"next_id": hi}

    def readBetweenOffsets(self, start, end):
        return iter(
            (i, _EPOCH + timedelta(seconds=i), ((i * _MIX) % 10000) / 100.0)
            for i in range(start["next_id"], end["next_id"])
        )


def _attach_stream_reader() -> None:
    """Register the stream reader on the DataSource class lazily (kept
    out of the class body so the batch path has no streaming import
    cost on old runtimes)."""

    def simpleStreamReader(self, schema):
        return SyntheticTicksStreamReader(
            int(self.options.get("batch_rows", 100))
        )

    SyntheticTicksDataSource.simpleStreamReader = simpleStreamReader


_attach_stream_reader()


class _JsonlCommitMessage(WriterCommitMessage):
    """Per-partition commit message: the file this task wrote (None
    for empty partitions)."""

    def __init__(self, file):
        self.file = file


class JsonlSinkDataSource(DataSource):
    """``writeStream.format("jsonl_sink")`` — a custom Python streaming
    SINK (Spark 4 ``DataSourceStreamWriter``): each microbatch's
    partitions append newline-JSON files under ``path``, the writer
    returns per-partition commit messages, and ``commit``/``abort``
    give the exactly-once hook (a production sink would publish the
    manifest atomically on commit; this one records the batch's files
    in a ``_commits/<batchId>`` manifest so incomplete batches are
    distinguishable). The write path runs ON EXECUTORS — the fourth
    quadrant of the Python DataSource surface (batch read io11, stream
    read test_python_datasource_stream, batch write = ordinary sinks,
    stream write here)."""

    @classmethod
    def name(cls) -> str:
        return "jsonl_sink"

    def streamWriter(self, schema, overwrite):
        from pyspark.sql.datasource import DataSourceStreamWriter

        path = self.options["path"]
        _Msg = _JsonlCommitMessage

        class _Writer(DataSourceStreamWriter):
            def write(self, iterator):
                import json
                import os
                import uuid

                from pyspark import TaskContext

                os.makedirs(path, exist_ok=True)
                pid = TaskContext.get().partitionId()
                fname = f"{path}/part-{pid}-{uuid.uuid4().hex}.jsonl"
                n = 0
                with open(fname, "w") as fh:
                    for row in iterator:
                        fh.write(json.dumps(row.asDict(), default=str) + "\n")
                        n += 1
                if n == 0:
                    os.remove(fname)
                    return _Msg(None)
                return _Msg(fname)

            def commit(self, messages, batchId):
                import json
                import os

                os.makedirs(f"{path}/_commits", exist_ok=True)
                files = [m.file for m in messages if m and m.file]
                with open(f"{path}/_commits/{batchId}", "w") as fh:
                    json.dump(files, fh)

            def abort(self, messages, batchId):
                import os

                for m in messages:
                    if m and m.file and os.path.exists(m.file):
                        os.remove(m.file)

        return _Writer()
