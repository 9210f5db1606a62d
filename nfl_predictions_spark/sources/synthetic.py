"""Custom Python DataSource (Spark 4 ``pyspark.sql.datasource``) — a
deterministic synthetic event generator.

The reference generates its stream driver-side, one event per NiFi tick
(``NFL_Spark_Model_Scoring.xml:633``, batch size 1). The engine's version
is a first-class *source*: ``spark.read.format("synthetic_events")``,
partitioned generation (each task derives its rows from its partition id
— no driver materialization, no shared RNG), so a 1000-executor cluster
generates in parallel at full width.

Every column is a pure integer function of the global row index, using
only arithmetic both engines have — so a plain SQL ``generate_series``
reproduces the table exactly and the source is oracle-checkable:

    event_id = i
    user_id  = (i * 2654435761) % 1000          (Knuth multiplicative hash)
    event_type = types[(i * 40503) % 31 % 5]
    value    = ((i * 48271) % 65536) / 65536.0  (Lehmer step; exact double)

``value`` has 16 fractional bits, so sums of < 2^37 rows are exact in
IEEE double regardless of accumulation order — aggregate results are
bit-stable across engines and partitionings by construction.
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


def row_at(i: int) -> tuple:
    return (
        i,
        (i * 2654435761) % 1000,
        EVENT_TYPES[(i * 40503) % 31 % 5],
        ((i * 48271) % 65536) / 65536.0,
    )


class SyntheticEventsDataSource(DataSource):
    """Options: ``rows`` (total row count, default 100000) and
    ``partitions`` (generation width, default 32)."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_events"

    def schema(self) -> str:
        return "event_id bigint, user_id bigint, event_type string, value double"

    def reader(self, schema) -> "SyntheticEventsReader":
        return SyntheticEventsReader(
            int(self.options.get("rows", 100_000)),
            int(self.options.get("partitions", 32)),
        )

    def simpleStreamReader(self, schema) -> "SyntheticEventsStreamReader":
        return SyntheticEventsStreamReader(
            int(self.options.get("rows", 100_000)),
            int(self.options.get("batch_rows", 5_000)),
        )


class _Slice(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class SyntheticEventsReader(DataSourceReader):
    def __init__(self, rows: int, partitions: int):
        self._rows = rows
        self._parts = max(1, min(partitions, rows or 1))

    def partitions(self):
        step = -(-self._rows // self._parts)  # ceil
        return [
            _Slice(lo, min(lo + step, self._rows))
            for lo in range(0, self._rows, step)
        ]

    def read(self, partition: _Slice):
        for i in range(partition.start, partition.end):
            yield row_at(i)


try:  # pragma: no cover - import probe
    from pyspark.sql.datasource import SimpleDataSourceStreamReader
except ImportError:  # pragma: no cover
    SimpleDataSourceStreamReader = object  # type: ignore[assignment,misc]


class SyntheticEventsStreamReader(SimpleDataSourceStreamReader):
    """Streaming flavor of the generator: the offset is just the global
    row index, each micro-batch emits the next ``batch_rows`` indices,
    and generation stops advancing at ``rows`` — so a run with
    ``Trigger.AvailableNow`` terminates after ceil(rows/batch_rows)
    batches having produced EXACTLY the same table as the batch reader
    (same ``row_at`` formula, so the same SQL oracle applies).

    Replay contract: ``read`` is driver-side here (the simple-reader
    API); rows between two committed offsets are re-derivable from the
    indices alone, so ``readBetweenOffsets`` regenerates instead of
    caching — recovery needs no state beyond the offset json. The
    partition-parallel path (``DataSourceStreamReader`` with per-batch
    InputPartitions) is the scale-up; the simple reader is the correct
    semantics-first default for a rate-bounded source.
    """

    def __init__(self, rows: int, batch_rows: int):
        self._rows = rows
        self._batch = max(1, batch_rows)

    def initialOffset(self) -> dict:
        return {"i": 0}

    def read(self, start: dict):
        i0 = int(start["i"])
        i1 = min(i0 + self._batch, self._rows)
        # a LIST-iterator, not a generator: the wrapper's prefetch cache
        # needs a true iterator (it calls next() on the empty-batch
        # probe) that is ALSO picklable for replay — generators aren't
        return iter([row_at(i) for i in range(i0, i1)]), {"i": i1}

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter([row_at(i) for i in range(int(start["i"]), int(end["i"]))])


def register(spark) -> None:
    spark.dataSource.register(SyntheticEventsDataSource)
