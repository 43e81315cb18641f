"""`reclamacoes_poll` — the reference's S3-polling CSV source re-expressed as
a Spark 4 Python DataSource (`pyspark.sql.datasource`), batch + streaming.

This is the one place the engine reproduces the reference's *imperative*
source semantics literally (SURVEY.md §2.1 S1/S2/L1, `app.py:87-139,176-196`)
instead of mapping them onto the built-in file source:

* listing = directory scan filtered to ``*.csv`` keys (`app.py:94-99`);
* parse = per-file ``csv.DictReader`` with ``;`` + ISO-8859-1, header
  sanitize + whitelist + empty→null per row (`app.py:121-131`) — including
  the duplicate-header LAST-WINS behavior DictReader gives for free;
* poll loop = one micro-batch per trigger; with ``replay=true`` every batch
  re-emits EVERY file, reproducing the reference's no-progress-state
  unbounded re-ingestion (`app.py:176-196`) — the default is once-per-file
  via offsets, the corrected semantics SURVEY.md §3 delta 1 chose.

Distribution model: the DRIVER only lists paths (exactly like the
reference's single ListObjectsV2, and like Spark's own FileStreamSource);
each file becomes an InputPartition, so parsing fans out across executors —
files are the parallelism unit at any scale.  The built-in CSV reader in
`csv_source.py` remains the preferred scan (splittable, vectorized,
PERMISSIVE quarantine); this source exists for wire-level parity (DictReader
quirks, replay mode) and as the template for sources Spark has no connector
for.

Registration: ``spark.dataSource.register(ReclamacoesPollDataSource)`` then
``spark.read.format("reclamacoes_poll").option("path", dir).load()`` or
``spark.readStream...``.
"""

from __future__ import annotations

import os
import time
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import StructType

from ..functions.names import sanitize_name
from ..schemas import FIELD_ORDER, PROJECTION_WHITELIST


def _list_csv_files(path: str) -> list[str]:
    """The reference's list_csv_files (`app.py:87-109`): suffix-filtered,
    sorted for determinism, [] when the 'bucket' is missing/unlistable."""
    try:
        return sorted(
            os.path.join(path, f)
            for f in os.listdir(path)
            if f.endswith(".csv") and os.path.isfile(os.path.join(path, f))
        )
    except OSError:
        return []


def _parse_rows(file_path: str) -> Iterator[tuple]:
    """Per-file parse with the reference's exact row pipeline
    (`app.py:121-131`): DictReader(';', ISO-8859-1) -> sanitize header ->
    whitelist -> empty→null, emitted in FIELD_ORDER.  Runs on an EXECUTOR
    (one task per file)."""
    import csv
    import io

    try:
        with open(file_path, encoding="iso-8859-1", newline="") as fh:
            body = fh.read()  # the reference reads whole objects too (app.py:121)
    except OSError:
        return  # NoSuchKey -> skip file (app.py:134-135)
    reader = csv.DictReader(io.StringIO(body), delimiter=";")
    for raw in reader:
        rec: dict[str, str | None] = {}
        for field, value in raw.items():
            if field is None:
                continue  # extra unnamed columns (short header)
            key = sanitize_name(field)
            if key in PROJECTION_WHITELIST:
                rec[key] = value if value else None
        yield tuple(rec.get(name) for name in FIELD_ORDER)


class _FilePartition(InputPartition):
    def __init__(self, file_path: str) -> None:
        self.file_path = file_path


class _BatchReader(DataSourceReader):
    def __init__(self, path: str) -> None:
        self._path = path

    def partitions(self) -> Sequence[InputPartition]:
        return [_FilePartition(f) for f in _list_csv_files(self._path)] or [
            _FilePartition("")
        ]

    def read(self, partition: _FilePartition) -> Iterator[tuple]:
        if partition.file_path:
            yield from _parse_rows(partition.file_path)


def _file_key(path: str) -> tuple[int, str] | None:
    """Total-order key for a landing file: (mtime_ns, path).  None when the
    file vanished between listing and stat (treated as not-present)."""
    try:
        return (os.stat(path).st_mtime_ns, path)
    except OSError:
        return None


class _StreamReader(DataSourceStreamReader):
    """Micro-batch reader.  Offset = a CONSTANT-SIZE high-water mark (default
    mode) or the batch counter (replay mode — every batch is the full
    listing, like the reference's stateless loop).

    Default-mode offsets are the watermark key ``{"t": mtime_ns, "p": path}``
    of the newest file included so far; a batch is every file whose
    ``(mtime_ns, path)`` key falls in ``(start, end]``.  Checkpoint size is
    O(1) regardless of how many files the landing directory accumulates
    (r2's offset serialized the entire seen-file list and grew forever), and
    a restart replays any uncommitted interval deterministically by
    re-listing and re-filtering.  Assumptions — the same ones Spark's own
    FileStreamSource makes for a landing zone: files are immutable once
    placed (mtime never changes), AND files land with a *current* mtime.
    The second assumption is a real loss mode the r2 seen-list did not
    have: a file copied in with its source timestamp preserved
    (``cp -p``, ``rsync -a``, object-store copies that keep the original
    LastModified) can land with a key at-or-below the committed watermark
    and will be silently skipped — it is "before" a boundary the stream
    already passed.  Landing-zone writers must create files with fresh
    mtimes (plain ``cp``/upload, or ``touch`` after placement); pipelines
    that cannot guarantee that should use ``replay=true`` (stateless
    re-list) or the batch reader.  As best-effort diagnostics the reader
    keeps an in-memory set of paths from the previous listing and logs a
    warning when a path FIRST appears with a key already at-or-below the
    watermark — exactly the preserved-mtime signature (the set is not
    checkpointed; after a restart the first listing is treated as already
    seen, so the heuristic never false-positives on restart).

    Two safeguards keep the watermark honest:

    * the watermark NEVER advances past ``now - latency_ms``: a stray file
      with a far-future mtime (clock skew, archive timestamps) cannot
      poison the watermark and shadow every later arrival — it is simply
      ingested when the clock reaches it;
    * ``latency_ms`` (default 2000) holds the watermark behind wall-clock
      by more than the filesystem's mtime granularity, so two files landing
      in the same coarse clock tick cannot race the watermark past each
      other — both are still in the future when the first is listed.
      Tests that fabricate old mtimes may set it to 0 for immediacy.

    Legacy r2 checkpoints (offset = the full ``{"seen": [...]}`` file list)
    are migrated transparently, in BOTH restart shapes: a legacy *start*
    excludes exactly its listed files (first post-upgrade batch continues
    where the old stream stopped), and a legacy *end* — which happens when
    the upgrade restart finds an uncommitted r2 batch already planned in
    the offset WAL — replays that batch with r2 semantics (end's seen-list
    minus start's), so the WAL'd batch commits with the same contents it
    was planned with before watermark offsets take over."""

    def __init__(self, path: str, replay: bool, latency_ms: int = 2000) -> None:
        self._path = path
        self._replay = replay
        self._latency_ns = latency_ms * 1_000_000
        self._epoch = 0
        self._wm: tuple[int, str] = (-1, "")
        self._prev_listing: set[str] | None = None  # preserved-mtime heuristic

    def initialOffset(self) -> dict:
        return {"epoch": 0} if self._replay else {"t": -1, "p": ""}

    def latestOffset(self) -> dict:
        if self._replay:
            self._epoch += 1
            return {"epoch": self._epoch}
        best = self._wm
        cutoff = time.time_ns() - self._latency_ns
        listing = _list_csv_files(self._path)
        for f in listing:
            k = _file_key(f)
            if k is None or k[0] > cutoff:
                continue  # not visible yet; eligible once the clock passes it
            if k > best:
                best = k
            elif (
                self._prev_listing is not None
                and f not in self._prev_listing
                and k <= self._wm
            ):
                # A path that first appears ALREADY behind the watermark is
                # the preserved-mtime loss mode (class docstring): warn —
                # the file will not be ingested by watermark semantics.
                import warnings

                warnings.warn(
                    f"reclamacoes_poll: {f!r} appeared with mtime at-or-"
                    f"below the committed watermark (preserved timestamp?) "
                    f"— it will be skipped; touch files on landing or use "
                    f"replay mode",
                    stacklevel=2,
                )
        self._prev_listing = set(listing)
        self._wm = best  # monotonic even if files are (wrongly) deleted
        return {"t": best[0], "p": best[1]}

    def partitions(self, start: dict, end: dict) -> Sequence[InputPartition]:
        if self._replay:
            files = _list_csv_files(self._path) if end["epoch"] > start["epoch"] else []
        elif "seen" in end:
            # Fully legacy (start, end): the upgrade restart found an
            # UNCOMMITTED r2 batch in the offset WAL.  Replay it with r2
            # semantics — the batch is end's seen-list minus start's (start
            # may be the watermark-format initialOffset if the legacy
            # stream had never committed; treat that as empty).
            import json

            end_seen = set(json.loads(end["seen"]))
            start_seen = (
                set(json.loads(start["seen"])) if "seen" in start else set()
            )
            files = [
                f
                for f in _list_csv_files(self._path)
                if f in end_seen and f not in start_seen
            ]
        elif "seen" in start:
            # Legacy r2 checkpoint: the offset was the full ingested-file
            # list.  Exclude exactly those files for this boundary batch;
            # subsequent offsets are watermark-format.
            import json

            seen = set(json.loads(start["seen"]))
            hi = (end["t"], end["p"])
            files = [
                f
                for f in _list_csv_files(self._path)
                if f not in seen and (k := _file_key(f)) is not None and k <= hi
            ]
        else:
            lo = (start["t"], start["p"])
            hi = (end["t"], end["p"])
            files = [
                f
                for f in _list_csv_files(self._path)
                if (k := _file_key(f)) is not None and lo < k <= hi
            ]
        return [_FilePartition(f) for f in files] or [_FilePartition("")]

    def read(self, partition: _FilePartition) -> Iterator[tuple]:
        if partition.file_path:
            yield from _parse_rows(partition.file_path)

    def commit(self, end: dict) -> None:
        pass  # progress is fully encoded in the offset (checkpointed by Spark)


class ReclamacoesPollDataSource(DataSource):
    """Python DataSource wrapping the reference's poll-parse pipeline.

    Options: ``path`` (the landing directory — the 'bucket'), ``replay``
    ("true" to reproduce the reference's re-ingest-forever loop),
    ``latency_ms`` (hold the default-mode watermark this far behind
    wall-clock so in-flight/same-clock-tick writes land in a later batch;
    default 2000)."""

    @classmethod
    def name(cls) -> str:
        return "reclamacoes_poll"

    def schema(self) -> StructType | str:
        # All-string bronze: exactly the reference's parse output (values
        # stay str-or-None until the silver cast layer, SURVEY.md §1.2).
        return ", ".join(f"{name} string" for name in FIELD_ORDER)

    def reader(self, schema: StructType) -> DataSourceReader:
        return _BatchReader(self.options["path"])

    def streamReader(self, schema: StructType) -> DataSourceStreamReader:
        return _StreamReader(
            self.options["path"],
            str(self.options.get("replay", "false")).lower() == "true",
            latency_ms=int(self.options.get("latency_ms", "2000")),
        )
