"""Custom Python Data Source (Spark 4 ``pyspark.sql.datasource`` API) —
the engine's integration point for sources Spark has no native connector
for (REST endpoints, bespoke wire protocols, in-house storage).

The reference's only source is an InfluxDB HTTP client (reference
database_extractor.py:187-205,291); this is the general Spark-4-native
answer: implement ``DataSource``/``DataSourceReader`` in Python, register
it on the session, and every ``spark.read.format(<name>)`` plans a
partition-parallel scan — each partition's ``read()`` runs in a Python
worker, so a real connector would open its own connection per partition
(the JDBC-style parallelism rule applies: no single-connection scans).

``SyntheticEventsDataSource`` here is the deterministic proof fixture: a
pure formula of the row index, so an independent SQL engine can replay the
exact output and the driver's value-hash compare works end-to-end through
the custom-connector path.
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamWriter,
    DataSourceWriter,
    InputPartition,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class SyntheticEventsReader(DataSourceReader):
    def __init__(self, options):
        self.n_rows = int(options.get("rows", 1000))
        self.n_parts = int(options.get("partitions", 8))

    def partitions(self):
        # contiguous row-index ranges — each generated independently in its
        # own Python worker (the distributed part of a custom connector)
        step = max(1, -(-self.n_rows // self.n_parts))
        return [
            _RangePartition(lo, min(lo + step, self.n_rows))
            for lo in range(0, self.n_rows, step)
        ]

    def read(self, partition: _RangePartition):
        # deterministic pure-formula rows: replayable by any SQL engine,
        # so the connector path itself is oracle-checkable
        for i in range(partition.start, partition.end):
            yield (i, f"sensor_{i % 7}", (i * 37 % 1000) / 10.0)


class SyntheticEventsStreamReader(SimpleDataSourceStreamReader):
    """Streaming face of the same connector — the Spark-4 seam for the
    reference's cron-live path (reference main.py:38-41: poll the bucket,
    process what's new, repeat). Offsets are plain row indexes, so the
    source is replayable (``readBetweenOffsets``) and exactly-once under a
    checkpoint; each micro-batch serves at most ``batchRows`` rows. A real
    connector would store a server cursor/timestamp in the offset dict the
    same way."""

    def __init__(self, options):
        self.n_rows = int(options.get("rows", 1000))
        self.batch_rows = int(options.get("batchRows", 250))

    def initialOffset(self) -> dict:
        return {"offset": 0}

    def read(self, start: dict):
        lo = int(start["offset"])
        hi = min(lo + self.batch_rows, self.n_rows)
        return self._rows(lo, hi), {"offset": hi}

    def readBetweenOffsets(self, start: dict, end: dict):
        return self._rows(int(start["offset"]), int(end["offset"]))

    def _rows(self, lo: int, hi: int):
        # a LIST iterator: the wrapper wants an iterator (it next()s it)
        # that is also picklable for the driver-side replay cache — a
        # plain generator fails the pickle, a bare list fails the next()
        return iter(
            [(i, f"sensor_{i % 7}", (i * 37 % 1000) / 10.0) for i in range(lo, hi)]
        )


class SyntheticEventsDataSource(DataSource):
    """``spark.read.format("synthetic_events").option("rows", N).load()``
    (batch) or ``spark.readStream.format("synthetic_events")...`` (stream;
    same schema, same deterministic rows, micro-batched by row index)."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_events"

    def schema(self) -> str:
        return "event_id bigint, sensor string, value double"

    def reader(self, schema):
        return SyntheticEventsReader(self.options)

    def simpleStreamReader(self, schema):
        return SyntheticEventsStreamReader(self.options)


def register_synthetic_source(spark) -> None:
    """Idempotently register the custom source on the session."""
    spark.dataSource.register(SyntheticEventsDataSource)


# ---------------------------------------------------------------------------
# Writer face: the sink half of the custom-connector seam
# ---------------------------------------------------------------------------

class _JsonlCommit(WriterCommitMessage):
    """WriterCommitMessage carrying the partition's staged file."""

    def __init__(self, tmp_path: str, rows: int):
        self.tmp_path = tmp_path
        self.rows = rows


def _stage_partition(path: str, job_id: str, iterator) -> "_JsonlCommit":
    """Shared task-side staging for the batch AND streaming writers:
    write the partition to a job-scoped temp name; only the returned
    commit message makes it visible. A task that dies mid-write must not
    leak its staged file — only files named in a returned commit message
    are seen by commit()/abort(), so unlink on ANY failure before
    re-raising."""
    import json as _json
    import os as _os
    import uuid as _uuid

    _os.makedirs(path, exist_ok=True)
    tmp = _os.path.join(path, f"_staged-{job_id}-{_uuid.uuid4().hex}.jsonl")
    n = 0
    try:
        with open(tmp, "w") as f:
            for row in iterator:
                f.write(_json.dumps(row.asDict()) + "\n")
                n += 1
    except BaseException:
        try:
            _os.remove(tmp)
        except OSError:
            pass
        raise
    return _JsonlCommit(tmp, n)


class JsonlSinkWriter(DataSourceWriter):
    """Per-partition writer for the ``jsonl_sink`` format. Demonstrates
    the full two-phase commit protocol a real connector needs: each task
    STAGES its output under a temp name (so a failed/speculative task
    never corrupts the sink), and the driver-side ``commit`` promotes all
    staged files at once; ``abort`` removes them. The same shape carries
    a real connector's transaction handle in the commit message."""

    def __init__(self, options):
        import uuid as _uuid

        self.path = options.get("path")
        if not self.path:
            raise ValueError("jsonl_sink requires option 'path'")
        # one writer instance exists per WRITE JOB (Spark calls
        # DataSource.writer() at job start and ships this instance to every
        # task), so a job id minted here scopes all of this job's staged
        # files: commit()'s orphan sweep matches only them, and two jobs
        # racing the same directory can no longer delete each other's
        # staged-but-uncommitted output (ADVICE r8)
        self.job_id = _uuid.uuid4().hex[:16]

    def write(self, iterator):
        return _stage_partition(self.path, self.job_id, iterator)

    def commit(self, messages):
        import glob as _glob
        import os as _os

        for m in messages:
            if m is not None:
                # promote on the BASENAME only — a directory component
                # containing "_staged-" must not be rewritten
                d, base = _os.path.split(m.tmp_path)
                _os.rename(m.tmp_path, _os.path.join(d, base.replace("_staged-", "part-", 1)))
        # sweep orphans from failed/speculative task attempts (killed
        # between open() and the unlink above). The glob is scoped to THIS
        # job's id, so a concurrent job writing the same directory keeps
        # its staged-but-uncommitted files (ADVICE r8: the unscoped sweep
        # enforced single-writer by silent data loss); every live file
        # matching this job's prefix was either promoted above or belongs
        # to a task attempt this job abandoned.
        for orphan in _glob.glob(
            _os.path.join(self.path, f"_staged-{self.job_id}-*.jsonl")
        ):
            try:
                _os.remove(orphan)
            except OSError:
                pass

    def abort(self, messages):
        import os as _os

        for m in messages:
            if m is not None and _os.path.exists(m.tmp_path):
                _os.remove(m.tmp_path)


class JsonlSinkStreamWriter(DataSourceStreamWriter):
    """STREAMING face of the jsonl sink (must subclass
    ``DataSourceStreamWriter`` — Spark's writer-init worker isinstance-
    checks it, so sharing code with the batch writer goes through
    ``_stage_partition``, not inheritance): one instance serves the
    whole query, ``write`` stages each micro-batch's partitions exactly
    like the batch writer, and ``commit(messages, batchId)`` promotes
    them under a batch-scoped name (``part-b{batchId}-…``) — so a
    crashed batch that re-runs overwrites nothing and leaves no stale
    visibility, the per-batch transactionality a real streaming
    connector needs. The orphan sweep is job-scoped like the batch
    writer's; a concurrent writer's staged files survive commits here."""

    def __init__(self, options):
        import uuid as _uuid

        self.path = options.get("path")
        if not self.path:
            raise ValueError("jsonl_sink requires option 'path'")
        self.job_id = _uuid.uuid4().hex[:16]

    def write(self, iterator):
        return _stage_partition(self.path, self.job_id, iterator)

    def commit(self, messages, batchId: int):  # noqa: N803 (Spark API name)
        import glob as _glob
        import os as _os

        for m in messages:
            if m is not None:
                d, base = _os.path.split(m.tmp_path)
                _os.rename(
                    m.tmp_path,
                    _os.path.join(
                        d, base.replace("_staged-", f"part-b{batchId}-", 1)
                    ),
                )
        for orphan in _glob.glob(
            _os.path.join(self.path, f"_staged-{self.job_id}-*.jsonl")
        ):
            try:
                _os.remove(orphan)
            except OSError:
                pass

    def abort(self, messages, batchId: int):  # noqa: N803
        import os as _os

        for m in messages:
            if m is not None and _os.path.exists(m.tmp_path):
                _os.remove(m.tmp_path)


class JsonlSinkDataSource(DataSource):
    """``df.write.format("jsonl_sink").option("path", dir).save()`` —
    partition-parallel JSON-lines sink through the Spark 4 Python Data
    Source writer API (the reference's CSV-file sink generalized to the
    custom-connector seam; a REST/bespoke-protocol sink implements the
    same three methods). ``writeStream.format("jsonl_sink")`` resolves
    the streaming face below, completing the connector matrix (batch
    read r04, stream read r06, batch write r07, stream write r09)."""

    @classmethod
    def name(cls) -> str:
        return "jsonl_sink"

    def writer(self, schema, overwrite: bool):
        return JsonlSinkWriter(self.options)

    def streamWriter(self, schema, overwrite: bool):
        return JsonlSinkStreamWriter(self.options)


def register_jsonl_sink(spark) -> None:
    spark.dataSource.register(JsonlSinkDataSource)
