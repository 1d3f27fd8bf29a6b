"""A custom Python DataSource (Spark 4 DataSource V2 API): the
deterministic synthetic event firehose.

Capability demonstration + load-test utility: `spark.read.format(...)`
against a source implemented entirely in Python — partition planning
(`partitions()`) and per-partition row generation (`read()`) — so
benchmarks and soak tests can produce arbitrarily large inputs with
ZERO files landed and perfect reproducibility. Complements the S7
parquet fixture generator (sources/generator.py): that one materializes
tables; this one streams them out of pure arithmetic.

Determinism: every row is a pure function of its global row index via
splitmix64 (public-domain mixer, Steele et al. "Fast Splittable
Pseudorandom Number Generators", OOPSLA 2014) — NOT Spark's
partition-seeded rand() (the trap: per-partition seeding makes output
depend on partitioning). Any partition count yields byte-identical
rows, so downstream oracle comparisons stay exact.

Scale: partitions carry only (start, end) offsets — planning cost is
O(partitions), generation is embarrassingly parallel, and the row
stream never exists on the driver.

Pickling: the classes are defined inside a factory, NOT at module
level, so cloudpickle ships them (and the row function they close
over) BY VALUE to the Python workers — the source works under a bare
driver session whose workers cannot import this package (the same rule
every pandas-UDF body in this repo follows).
"""

from __future__ import annotations


def _build():
    from datetime import datetime, timedelta

    from pyspark.sql.datasource import (
        DataSource,
        DataSourceReader,
        InputPartition,
        SimpleDataSourceStreamReader,
    )

    EVENT_TYPES = ("click", "view", "purchase", "refund")
    BASE = datetime(2024, 1, 1, 0, 0, 0)
    MASK = (1 << 64) - 1

    def splitmix64(x: int) -> int:
        # public-domain splitmix64 finalizer: uniform, machine-independent
        x = (x + 0x9E3779B97F4A7C15) & MASK
        x = ((x ^ (x >> 30)) * 0xBF58476D1CE4E5B9) & MASK
        x = ((x ^ (x >> 27)) * 0x94D049BB133111EB) & MASK
        return x ^ (x >> 31)

    def synth_event(i: int, seed: int, users: int, span_days: int) -> tuple:
        # row i of the firehose — a pure function of (i, options)
        h = splitmix64((seed << 32) ^ i)
        ts = BASE + timedelta(seconds=h % (span_days * 86400))
        h2 = splitmix64(h)
        return (
            i,
            ts,
            h2 % users,
            EVENT_TYPES[(h2 >> 32) % len(EVENT_TYPES)],
            ((splitmix64(h2) % 1_000_000) / 100.0),
        )

    class _RangePartition(InputPartition):
        def __init__(self, start: int, end: int):
            self.start, self.end = start, end

    class SyntheticEventsReader(DataSourceReader):
        def __init__(self, options):
            self.rows = int(options.get("rows", 1000))
            self.num_partitions = int(options.get("numpartitions", 8))
            self.seed = int(options.get("seed", 7))
            self.users = int(options.get("users", 100))
            self.span_days = int(options.get("spandays", 30))

        def partitions(self):
            per = max(1, -(-self.rows // self.num_partitions))  # ceil div
            return [
                _RangePartition(s, min(s + per, self.rows))
                for s in range(0, self.rows, per)
            ]

        def read(self, partition):
            for i in range(partition.start, partition.end):
                yield synth_event(i, self.seed, self.users, self.span_days)

    class SyntheticEventsStreamReader(SimpleDataSourceStreamReader):
        """The streaming half: offset = the next global row index, so a
        micro-batch is just an index range. Because every row is a pure
        function of its index, `readBetweenOffsets` replays any
        committed range bit-identically — the property that makes the
        source exactly-once under checkpoint recovery, with no replay
        log to store."""

        def __init__(self, options):
            self.rows_per_batch = int(options.get("rowsperbatch", 100))
            self.seed = int(options.get("seed", 7))
            self.users = int(options.get("users", 100))
            self.span_days = int(options.get("spandays", 30))

        def initialOffset(self):
            return {"index": 0}

        def _rows(self, start: int, end: int):
            return [
                synth_event(i, self.seed, self.users, self.span_days)
                for i in range(start, end)
            ]

        def read(self, start):
            s = start["index"]
            e = s + self.rows_per_batch
            return iter(self._rows(s, e)), {"index": e}

        def readBetweenOffsets(self, start, end):
            return iter(self._rows(start["index"], end["index"]))

    class SyntheticEventsDataSource(DataSource):
        """format("synthetic_events") — options: rows, numPartitions,
        seed, users, spanDays; streaming adds rowsPerBatch (option keys
        reach the readers lower-cased)."""

        @classmethod
        def name(cls) -> str:
            return "synthetic_events"

        def schema(self) -> str:
            return (
                "event_id long, ts timestamp, user_id long, "
                "event_type string, value double"
            )

        def reader(self, schema):
            return SyntheticEventsReader(self.options)

        def simpleStreamReader(self, schema):
            return SyntheticEventsStreamReader(self.options)

    return synth_event, SyntheticEventsDataSource


synth_event, SyntheticEventsDataSource = _build()


def register_synthetic_events(spark) -> None:
    """Install the source on a session: after this,
    spark.read.format("synthetic_events").option("rows", N).load()."""
    spark.dataSource.register(SyntheticEventsDataSource)
