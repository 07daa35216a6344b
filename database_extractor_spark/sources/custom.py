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

    def _jsonable(v):
        # The sink is a general connector face, not just the bigint/
        # string/bool projections the registry feeds it: timestamp/date
        # serialize as ISO-8601, Decimal as its exact string form, and
        # binary as hex — all deterministic, so replay-idempotence (byte-
        # equal files across micro-batch retries) still holds.
        import datetime as _dt
        import decimal as _dec

        if isinstance(v, (_dt.datetime, _dt.date, _dt.time)):
            return v.isoformat()
        if isinstance(v, _dec.Decimal):
            return str(v)
        if isinstance(v, (bytes, bytearray)):
            return bytes(v).hex()
        raise TypeError(f"jsonl_sink cannot serialize {type(v).__name__}")

    _os.makedirs(path, exist_ok=True)
    tmp = _os.path.join(path, f"_staged-{job_id}-{_uuid.uuid4().hex}.jsonl")
    n = 0
    try:
        with open(tmp, "w") as f:
            for row in iterator:
                f.write(_json.dumps(row.asDict(), default=_jsonable) + "\n")
                n += 1
    except BaseException:
        try:
            _os.remove(tmp)
        except OSError:
            pass
        raise
    return _JsonlCommit(tmp, n)


def _mint_sink_state(options) -> tuple[str, str]:
    """Validate sink options and mint the writer's job id. One writer
    instance exists per write job / stream query (Spark constructs it at
    job start and ships it to every task), so the id minted here scopes
    all of that job's staged files: commit()'s orphan sweep matches only
    them, and two jobs racing the same directory can no longer delete
    each other's staged-but-uncommitted output (ADVICE r8)."""
    import uuid as _uuid

    path = options.get("path")
    if not path:
        raise ValueError("jsonl_sink requires option 'path'")
    return path, _uuid.uuid4().hex[:16]


def _promote_and_sweep(path: str, job_id: str, messages, prefix: str) -> None:
    """Driver-side commit shared by the batch and streaming writers:
    rename every staged file named in a commit message to its visible
    ``prefix`` form (on the BASENAME only — a directory component
    containing "_staged-" must not be rewritten), then sweep orphans
    from failed/speculative task attempts. The sweep glob is scoped to
    THIS job's id, so a concurrent job writing the same directory keeps
    its staged files (the r8 unscoped sweep enforced single-writer by
    silent data loss); every live file matching this job's prefix was
    either promoted above or belongs to an abandoned task attempt."""
    import glob as _glob
    import os as _os

    for m in messages:
        if m is not None:
            d, base = _os.path.split(m.tmp_path)
            _os.rename(
                m.tmp_path, _os.path.join(d, base.replace("_staged-", prefix, 1))
            )
    for orphan in _glob.glob(_os.path.join(path, f"_staged-{job_id}-*.jsonl")):
        try:
            _os.remove(orphan)
        except OSError:
            pass


def _remove_staged(messages) -> None:
    import os as _os

    for m in messages:
        if m is not None and _os.path.exists(m.tmp_path):
            _os.remove(m.tmp_path)


def _sweep_committed_prefix(path: str, prefix: str) -> None:
    """Remove files THIS sink family committed under exactly ``prefix``.

    A bare glob of ``f"{prefix}*"`` gets that wrong twice: glob
    metacharacters in a validation-passing prefix (``part-[b1]-``) are
    interpreted instead of matched literally, and a prefix that is a
    proper prefix of another valid prefix (``part-b1-`` vs
    ``part-b1-x-``) crosses the boundary. Matching the full
    committed-file shape — prefix + 16-hex job id + '-' + 32-hex task id
    + '.jsonl' — is structural: the hex job-id field can never continue
    a longer sibling prefix (any extension adds a non-hex char or a
    misplaced '-' within the 16-char window). Shared by the batch
    writer's replace_prefix sweep and the streaming writer's replay
    sweep so both faces honor the same boundary (ADVICE r11)."""
    import os as _os
    import re as _re

    pat = _re.compile(_re.escape(prefix) + r"[0-9a-f]{16}-[0-9a-f]{32}\.jsonl\Z")
    for name in _os.listdir(path):
        if pat.match(name):
            try:
                _os.remove(_os.path.join(path, name))
            except OSError:
                pass


class JsonlSinkWriter(DataSourceWriter):
    """Per-partition writer for the ``jsonl_sink`` format. Demonstrates
    the full two-phase commit protocol a real connector needs: each task
    STAGES its output under a temp name (so a failed/speculative task
    never corrupts the sink), and the driver-side ``commit`` promotes all
    staged files at once; ``abort`` removes them. The same shape carries
    a real connector's transaction handle in the commit message."""

    def __init__(self, options):
        self.path, self.job_id = _mint_sink_state(options)
        # ``replace_prefix``: commit REPLACES any visible files carrying
        # this prefix instead of appending beside them — the batch-scoped
        # transactionality a foreachBatch caller needs (it owns the batch
        # id Spark will replay after a crash-before-offset-commit, so
        # writing batch N with replace_prefix="part-bN-" makes the replay
        # swap in an identical copy rather than duplicate rows). The
        # prefix must stay inside the reader contract (part-*.jsonl glob)
        # and must not collide with the staging namespace.
        self.replace_prefix = options.get("replace_prefix")
        if self.replace_prefix is not None:
            p = self.replace_prefix
            if not p.startswith("part-") or "/" in p or "_staged-" in p:
                raise ValueError(
                    "jsonl_sink replace_prefix must start with 'part-' and "
                    f"contain no '/' or '_staged-': {p!r}"
                )
            # the stale-file sweep at commit time globs f"{prefix}*", so a
            # prefix that is a proper prefix of ANOTHER batch's prefix
            # ('part-b1' matching 'part-b10-…') would silently delete that
            # batch's committed files. Requiring a trailing non-digit
            # delimiter makes prefixes self-terminating: 'part-b1-' can
            # never be a prefix of 'part-b10-'.
            if p[-1].isdigit():
                raise ValueError(
                    "jsonl_sink replace_prefix must end with a non-digit "
                    "delimiter (e.g. 'part-b1-' not 'part-b1') so the "
                    f"replace sweep cannot match a sibling batch: {p!r}"
                )

    def write(self, iterator):
        return _stage_partition(self.path, self.job_id, iterator)

    def commit(self, messages):
        prefix = self.replace_prefix or "part-"
        if self.replace_prefix is not None:
            _sweep_committed_prefix(self.path, self.replace_prefix)
        _promote_and_sweep(self.path, self.job_id, messages, prefix)

    def abort(self, messages):
        _remove_staged(messages)


class JsonlSinkStreamWriter(DataSourceStreamWriter):
    """STREAMING face of the jsonl sink (must subclass
    ``DataSourceStreamWriter`` — Spark's writer-init worker isinstance-
    checks it, so code is shared with the batch writer through the
    module helpers, not inheritance): one instance serves the whole
    query, ``write`` stages each micro-batch's partitions exactly like
    the batch writer, and ``commit(messages, batchId)`` promotes them
    under a batch-scoped name (``part-b{batchId}-…``).

    REPLAY idempotence: Spark re-runs a batch whose commit raced a
    driver crash (files promoted, offset log not yet written), and the
    replay arrives from a NEW writer incarnation with fresh staging
    names — so commit first clears any previously-promoted
    ``part-b{batchId}-*`` files before promoting. A replayed batch
    therefore REPLACES its earlier copy instead of duplicating it,
    which is what makes exactly-once hold across the crash window.
    Staged leftovers of a crashed predecessor (its job id died with it)
    are not touched — they are invisible to readers (``part-*`` glob),
    bounded by one batch, and a maintenance sweep's concern, the same
    trade the job-scoped batch sweep makes for concurrent writers.

    Consequence of batch-keyed names: a STREAMING sink directory is
    coupled to ONE checkpoint lineage (batch ids are per-checkpoint, so
    a fresh query appending to the same directory would treat the old
    run's batch 0 as its own replay) — the same coupling Spark's own
    FileStreamSink has via its metadata log. One directory, one
    checkpoint; batch writers may still share the directory safely."""

    def __init__(self, options):
        self.path, self.job_id = _mint_sink_state(options)

    def write(self, iterator):
        return _stage_partition(self.path, self.job_id, iterator)

    def commit(self, messages, batchId: int):  # noqa: N803 (Spark API name)
        # replay sweep uses the same structural committed-file shape as
        # the batch writer's replace_prefix sweep — a bare glob could
        # cross into a longer sibling prefix's files (ADVICE r11)
        _sweep_committed_prefix(self.path, f"part-b{batchId}-")
        _promote_and_sweep(self.path, self.job_id, messages, f"part-b{batchId}-")

    def abort(self, messages, batchId: int):  # noqa: N803
        _remove_staged(messages)


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
