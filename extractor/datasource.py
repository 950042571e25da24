"""Spark 4 Python Data Source connector for the deterministic transcripts
corpus — the engine's S1 "source" surface expressed through the modern
connector API instead of a pre-materialized table:

    from extractor.datasource import TranscriptsDataSource
    spark.dataSource.register(TranscriptsDataSource)
    df = (spark.read.format("transcripts")
          .option("n_convs", 1000).option("seed", 42).load())

Scale posture: ``partitions()`` plans contiguous conversation ranges, so a
10^12-turn corpus reads as N independent splits with zero driver
materialization (each executor expands only its range — same math as
``extractor.transcripts.transcripts_df``, which remains the mapInPandas
form of the same generator; equality is pytest-asserted).

Partition pruning: ``pushFilters`` accepts ``EqualTo``/``StringStartsWith``
on ``conv_id`` and narrows the planned conversation ranges BEFORE any
generation happens — the connector-level analogue of parquet row-group
pruning (a point lookup plans exactly one single-conversation split).
All other filters are returned to Spark to evaluate post-scan.
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    InputPartition,
    SimpleDataSourceStreamReader,
    StringStartsWith,
)

from .transcripts import TRANSCRIPT_SCHEMA, generate_conversation

_PREFIX = "conv_"


def _conv_index(conv_id: str) -> int | None:
    if (
        isinstance(conv_id, str)
        and conv_id.startswith(_PREFIX)
        and conv_id[len(_PREFIX) :].isdigit()
    ):
        return int(conv_id[len(_PREFIX) :])
    return None


class TranscriptsReader(DataSourceReader):
    def __init__(self, options):
        self.n_convs = int(options.get("n_convs", 200))
        self.mean_turns = int(options.get("mean_turns", 12))
        self.seed = int(options.get("seed", 42))
        self.n_partitions = int(options.get("partitions", 16))
        self.lo = 0
        self.hi = self.n_convs

    def pushFilters(self, filters):  # noqa: N802 (Spark API name)
        for f in filters:
            attr = getattr(f, "attribute", None)
            if attr == ("conv_id",) and isinstance(f, EqualTo):
                idx = _conv_index(f.value)
                if idx is None:
                    # no conversation can match a malformed id
                    self.lo, self.hi = 0, 0
                else:
                    self.lo = max(self.lo, idx)
                    self.hi = min(self.hi, idx + 1)
                # pruning is exact, but hand the filter back anyway (yield
                # = unsupported): Spark re-checks rows post-scan for free,
                # which keeps the connector honest if id formats ever drift
                yield f
            elif attr == ("conv_id",) and isinstance(f, StringStartsWith):
                pref = f.value
                if pref.startswith(_PREFIX):
                    digits = pref[len(_PREFIX) :]
                    if digits and digits.isdigit() and len(digits) <= 8:
                        span = 10 ** (8 - len(digits))
                        base = int(digits) * span
                        self.lo = max(self.lo, base)
                        self.hi = min(self.hi, base + span)
                    elif digits and not digits.isdigit():
                        self.lo, self.hi = 0, 0  # no id can match
                elif not _PREFIX.startswith(pref):
                    self.lo, self.hi = 0, 0  # prefix disjoint from conv_*
                yield f
            else:
                yield f  # unsupported: Spark evaluates it post-scan

    def partitions(self):
        lo, hi = self.lo, min(self.hi, self.n_convs)
        if hi <= lo:
            return [InputPartition((0, 0))]
        n = max(1, min(self.n_partitions, hi - lo))
        step = (hi - lo + n - 1) // n
        return [
            InputPartition((s, min(s + step, hi)))
            for s in range(lo, hi, step)
        ]

    def read(self, partition):
        lo, hi = partition.value
        for c in range(lo, hi):
            yield from generate_conversation(self.seed, c, self.mean_turns)


class TranscriptsStreamReader(SimpleDataSourceStreamReader):
    """Streaming form of the connector: offset = next unread conversation
    index, each micro-batch covers ``batch_convs`` conversations.  The
    offset→rows mapping is a pure function (seeded generator), so
    ``readBetweenOffsets`` replays any committed range bit-for-bit after a
    restart — the property Spark needs for exactly-once on a custom
    source.  The stream is bounded by ``n_convs`` (an unbounded deployment
    would page real arrivals; offsets work identically)."""

    def __init__(self, options):
        self.n_convs = int(options.get("n_convs", 200))
        self.mean_turns = int(options.get("mean_turns", 12))
        self.seed = int(options.get("seed", 42))
        self.batch_convs = int(options.get("batch_convs", 50))

    def initialOffset(self) -> dict:  # noqa: N802
        return {"conv": 0}

    def _rows(self, lo: int, hi: int):
        for c in range(lo, hi):
            yield from generate_conversation(self.seed, c, self.mean_turns)

    def read(self, start: dict):
        lo = int(start["conv"])
        hi = min(lo + self.batch_convs, self.n_convs)
        # a list_iterator, not a generator: Spark's prefetch cache calls
        # next() on it AND copy.copy()s it at plan time — generators
        # support neither.  (SimpleDataSourceStreamReader prefetches
        # driver-side by design — size batch_convs accordingly.)
        return iter(list(self._rows(lo, hi))), {"conv": hi}

    def readBetweenOffsets(self, start: dict, end: dict):  # noqa: N802
        # replay path: consumed directly as an iterator (never pickled)
        return self._rows(int(start["conv"]), int(end["conv"]))


class TranscriptsDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "transcripts"

    def schema(self):
        return TRANSCRIPT_SCHEMA

    def reader(self, schema) -> TranscriptsReader:
        return TranscriptsReader(self.options)

    def simpleStreamReader(self, schema) -> TranscriptsStreamReader:  # noqa: N802
        return TranscriptsStreamReader(self.options)
