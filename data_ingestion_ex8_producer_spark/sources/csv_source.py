"""Reclamacoes CSV source: the reference's scan semantics (S1/S2, SURVEY.md
§2) as declarative reader options, batch and streaming.

Reference behavior being reproduced:
* ``;``-delimited, ISO-8859-1, first row is the header (``app.py:121-124``);
* header names sanitized + lowercased (``app.py:129``);
* only whitelisted columns kept, unknown columns dropped (``app.py:130``);
* empty strings -> NULL in every kept column (``app.py:131``);
* only ``*.csv`` keys are picked up (``app.py:94-99``) -> pathGlobFilter.

Unlike the reference (which re-reads every file forever and materializes
whole objects in memory, ``app.py:121,176-196``), the streaming variant is a
checkpointed file source: once-per-file, incremental listing, splittable
reads.  ``maxFilesPerTrigger`` bounds micro-batch size at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.names import sanitize_name
from ..schemas import BRONZE_SCHEMA, FIELD_ORDER, PROJECTION_WHITELIST  # noqa: F401

_READER_OPTIONS = {
    "sep": ";",
    "encoding": "ISO-8859-1",
    "header": "true",
    # Reference: csv.DictReader default quoting; PERMISSIVE keeps bad rows
    # visible for quarantine instead of failing the file (app.py:136-139
    # abandons the rest of a file on any parse error — we do strictly better).
    "mode": "PERMISSIVE",
}


def read_reclamacoes_batch(spark: SparkSession, path: str) -> DataFrame:
    """Batch scan of a reclamacoes CSV file/directory (bronze).

    The raw header is probed first and column mapping is done positionally:
    Spark's own header handling renames duplicate columns (``Ano``/``ANO`` ->
    ``Ano0``/``ANO1``), which would break the reference's csv.DictReader
    last-wins semantics.  Files under one path must share a header (true for
    the BACEN feed; the reference assumes the same implicitly).
    """
    from pyspark.sql.types import StringType, StructField, StructType

    from pyspark.errors.exceptions.captured import AnalysisException

    try:
        probe = (
            spark.read.options(sep=";", encoding="ISO-8859-1", header="false")
            .csv(path)
            .limit(1)
            .collect()
        )
    except AnalysisException:
        # Empty landing zone: schema inference has nothing to read.  The
        # reference would loop forever doing nothing (app.py:187); batch mode
        # returns an empty bronze frame with the full schema.
        probe = []
    if not probe:
        return spark.createDataFrame([], BRONZE_SCHEMA)
    raw_names = [v if v is not None else "" for v in probe[0]]
    positional = StructType(
        [StructField(f"_pos{i}", StringType(), True) for i in range(len(raw_names))]
    )
    df = (
        spark.read.options(**_READER_OPTIONS)
        .option("enforceSchema", "true")  # discard the header line per file
        .schema(positional)
        .csv(path)
    )
    # sanitize + last-wins on collisions (csv.DictReader semantics)
    keep: dict[str, int] = {}
    for idx, raw in enumerate(raw_names):
        keep[sanitize_name(raw)] = idx
    present = {name: idx for name, idx in keep.items() if name in PROJECTION_WHITELIST}
    # empty string -> NULL on every kept column (reference app.py:131);
    # align to Avro field order; columns missing from the file become NULL
    # (they then fail Avro encode for non-nullable fields, same surface as
    # the reference's DatumWriter error path)
    return df.select(
        *[
            F.nullif(F.col(f"_pos{present[c]}"), F.lit("")).alias(c)
            if c in present
            else F.lit(None).cast("string").alias(c)
            for c in FIELD_ORDER
        ]
    )


def read_reclamacoes_stream(
    spark: SparkSession,
    path: str,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming file-source scan (S1: listing, *.csv filter, new-file
    tracking all handled by FileStreamSource + checkpoint).

    Streaming requires a fixed schema; we read headers as data is discovered
    against the BRONZE schema by position?  No — the reclamacoes feed has a
    stable raw header, so the bronze schema is declared up front and
    ``header=true`` maps columns by name after sanitization is baked into
    the landing convention.  For raw BACEN headers, land the files once
    through the batch normalizer or declare the raw header schema here.
    """
    reader = (
        spark.readStream.options(**_READER_OPTIONS)
        .option("pathGlobFilter", "*.csv")
        .schema(BRONZE_SCHEMA)
    )
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    df = reader.csv(path)
    return df.select(*[F.nullif(F.col(c), F.lit("")).alias(c) for c in FIELD_ORDER])
