"""Custom Python DataSource (Spark 4 DataSource API): a deterministic
synthetic-corpus generator, registered as ``fletcher_corpus``.

SURVEY.md §2.1 covers the reference's sources (parquet + Arrow
interchange); this adds the Spark-native way to expose a NEW source to
the engine — the analog of fletcher registering an ExtensionArray so
pandas machinery can consume it (fletcher/base.py:139-236), but for
table providers: implement ``DataSource``/``DataSourceReader`` and
every consumer (SQL, DataFrame, streaming-ready variants) gets it.

Scale shape: ``partitions()`` splits the id range into ``n_parts``
independent ranges — Spark schedules one task per range, so generation
is executor-parallel and memory-bounded (each task yields rows lazily,
nothing materializes the whole corpus).  This is the same
chunk-offset-to-task mapping SURVEY §1.1 maps FletcherChunkedArray
onto.

Determinism: every value derives from md5(seed:doc_id:slot) — same
rows for any partition count (asserted in tests/test_sources.py), the
property that makes a generated table usable in reproducible tests.
"""

from __future__ import annotations

import hashlib

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import StructType

_WORDS = [
    "arrow", "batch", "buffer", "column", "codegen", "dict", "engine",
    "filter", "graft", "hash", "index", "join", "kernel", "lineage",
    "merge", "null", "offset", "plan", "query", "rowgroup", "shuffle",
    "token", "union", "vector", "window", "yield", "zone",
]
_LANGS = ["en", "de", "fr", "es", "zh"]

_SCHEMA_DDL = "doc_id long, text string, lang string, n_tokens int"


def _h(seed: str, *parts) -> int:
    """Deterministic 64-bit int from md5 — the same engine-portable
    hash family the dedup pipeline uses."""
    key = ":".join([seed, *map(str, parts)])
    return int(hashlib.md5(key.encode()).hexdigest()[:16], 16)


def _make_doc(seed: str, doc_id: int) -> tuple[int, str, str, int]:
    n_tokens = 5 + _h(seed, doc_id, "len") % 28
    words = [
        _WORDS[_h(seed, doc_id, j) % len(_WORDS)] for j in range(n_tokens)
    ]
    lang = _LANGS[_h(seed, doc_id, "lang") % len(_LANGS)]
    return doc_id, " ".join(words), lang, n_tokens


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class CorpusReader(DataSourceReader):
    def __init__(self, options):
        self.n_docs = int(options.get("n_docs", 1000))
        self.n_parts = int(options.get("n_parts", 8))
        self.seed = options.get("seed", "corpus")

    def partitions(self):
        step = max(1, (self.n_docs + self.n_parts - 1) // self.n_parts)
        return [
            _RangePartition(lo, min(lo + step, self.n_docs))
            for lo in range(0, self.n_docs, step)
        ]

    def read(self, partition: _RangePartition):
        for doc_id in range(partition.start, partition.end):
            yield _make_doc(self.seed, doc_id)


class CorpusDataSource(DataSource):
    """``spark.read.format("fletcher_corpus").option("n_docs", N)...``"""

    @classmethod
    def name(cls) -> str:
        return "fletcher_corpus"

    def schema(self) -> str | StructType:
        return _SCHEMA_DDL

    def reader(self, schema: StructType) -> DataSourceReader:
        return CorpusReader(self.options)

    def simpleStreamReader(self, schema: StructType):
        return CorpusStreamReader(self.options)


def register(spark) -> None:
    """Idempotent registration of the corpus source on a session."""
    spark.dataSource.register(CorpusDataSource)


class CorpusStreamReader(SimpleDataSourceStreamReader):
    """Micro-batch stream over the same deterministic corpus: each
    batch advances the doc_id offset by ``batch_size`` until ``n_docs``
    is exhausted.  Offsets are plain dicts checkpointed by the engine —
    restart resumes exactly (same rows for an offset range, because
    generation is offset-pure).

    Scale note: SimpleDataSourceStreamReader reads on the driver —
    right for control-plane-size streams (this generator, change logs).
    A data-plane custom stream implements ``DataSourceStreamReader``
    with ``partitions()`` so batches fan out to executors, exactly like
    the batch reader above.
    """

    def __init__(self, options):
        self.n_docs = int(options.get("n_docs", 1000))
        self.batch_size = int(options.get("batch_size", 100))
        self.seed = options.get("seed", "corpus")

    def initialOffset(self):
        return {"next": 0}

    def read(self, start):
        lo = start["next"]
        hi = min(lo + self.batch_size, self.n_docs)
        rows = [_make_doc(self.seed, i) for i in range(lo, hi)]
        return (iter(rows), {"next": hi})

    def readBetweenOffsets(self, start, end):
        return iter(_make_doc(self.seed, i) for i in range(start["next"], end["next"]))
