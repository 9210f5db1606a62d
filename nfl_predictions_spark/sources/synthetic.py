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


def register(spark) -> None:
    spark.dataSource.register(SyntheticEventsDataSource)
