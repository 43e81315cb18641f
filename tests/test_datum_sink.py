"""The `avro_datum_dir` Python DataSource writer: batch two-phase commit with
_SUCCESS manifest, streaming epoch directories, and payload round-trip through
the engine's own Avro codec — the sink-side half of the custom-connector
surface (source half: `tests/test_polling_source.py`).
"""

from __future__ import annotations

from pathlib import Path

import pytest

from pyspark.sql import functions as F

from data_ingestion_ex8_producer_spark.functions.avro_codec import (
    decode_record,
    encode_record,
)
from data_ingestion_ex8_producer_spark.sinks.datum_sink import (
    AvroDatumDirDataSource,
    read_datum_file,
)

_ROWS = [
    {"ano": "2024", "trimestre": "1º", "categoria": "Cat", "tipo": "T",
     "cnpj_if": None, "instituicao_financeira": "BANCO A", "indice": "1,23",
     "quantidade_de_reclamacoes_reguladas_procedentes": "1",
     "quantidade_de_reclamacoes_reguladas_outras": None,
     "quantidade_de_reclamacoes_nao_reguladas": "2",
     "quantidade_total_de_reclamacoes": "3",
     "quantidade_total_de_clientes_ccs_e_scr": "10",
     "quantidade_de_clientes_ccs": "5", "quantidade_de_clientes_scr": "5"},
    {"ano": "2023", "trimestre": "4º", "categoria": "Out", "tipo": "U",
     "cnpj_if": "123", "instituicao_financeira": "BANCO B", "indice": "9,99",
     "quantidade_de_reclamacoes_reguladas_procedentes": "7",
     "quantidade_de_reclamacoes_reguladas_outras": "1",
     "quantidade_de_reclamacoes_nao_reguladas": "0",
     "quantidade_total_de_reclamacoes": "8",
     "quantidade_total_de_clientes_ccs_e_scr": "20",
     "quantidade_de_clientes_ccs": "9", "quantidade_de_clientes_scr": "11"},
]


def _collect_datums(root: Path) -> list[bytes]:
    out: list[bytes] = []
    manifest = root / "_SUCCESS"
    assert manifest.exists(), "commit must publish a _SUCCESS manifest"
    for line in manifest.read_text().splitlines():
        name, _n = line.split("\t")
        out.extend(read_datum_file(str(root / name)))
    return out


def test_datum_sink_batch_roundtrip(spark, tmp_path: Path) -> None:
    spark.dataSource.register(AvroDatumDirDataSource)
    values = [(encode_record(r),) for r in _ROWS]
    df = spark.createDataFrame(values, "value binary")
    dest = tmp_path / "datums"
    df.coalesce(2).write.format("avro_datum_dir").option("path", str(dest)).mode(
        "append"
    ).save()

    datums = _collect_datums(dest)
    decoded = sorted(
        (decode_record(d) for d in datums), key=lambda r: r["ano"]
    )
    assert decoded == sorted(_ROWS, key=lambda r: r["ano"])
    # no stray temp files after commit
    assert not list(dest.glob("_tmp_*"))


@pytest.mark.slow
def test_datum_sink_streaming_epochs(spark, tmp_path: Path) -> None:
    spark.dataSource.register(AvroDatumDirDataSource)
    src = tmp_path / "src"
    src.mkdir()
    for i, row in enumerate(_ROWS):
        spark.createDataFrame([(encode_record(row),)], "value binary").coalesce(
            1
        ).write.mode("overwrite").parquet(str(src / f"f{i}"))

    stream = (
        spark.readStream.schema("value binary")
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(str(src))
    )
    dest = tmp_path / "stream_datums"
    q = (
        stream.writeStream.format("avro_datum_dir")
        .option("path", str(dest))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    q.stop()

    epoch_dirs = sorted(p for p in dest.glob("epoch=*") if p.is_dir())
    assert len(epoch_dirs) == 2, f"expected one epoch dir per micro-batch: {epoch_dirs}"
    decoded = []
    for ed in epoch_dirs:
        decoded.extend(decode_record(d) for d in _collect_datums(ed))
    assert sorted(decoded, key=lambda r: r["ano"]) == sorted(
        _ROWS, key=lambda r: r["ano"]
    )


# ---------------------------------------------------------------------------
# Driver-side commit-protocol unit tests (no Spark session needed)
# ---------------------------------------------------------------------------


def _mk_temp(directory: Path, token: str, n_rows: int = 1):
    from data_ingestion_ex8_producer_spark.sinks.datum_sink import _DatumCommit

    directory.mkdir(parents=True, exist_ok=True)
    tmp = directory / f"_tmp_{token}.bin"
    tmp.write_bytes(b"\x00\x00\x00\x01x" * n_rows)
    return _DatumCommit(str(tmp), str(directory / f"part-{token}.bin"), n_rows)


def test_commit_empty_batch_publishes_manifest(tmp_path: Path) -> None:
    """A successful zero-partition batch must still publish an (empty)
    _SUCCESS, so manifest readers can tell 'committed empty' from
    'never committed'."""
    from data_ingestion_ex8_producer_spark.sinks.datum_sink import _commit

    dest = tmp_path / "empty"
    _commit([None, None], str(dest))
    assert (dest / "_SUCCESS").read_text() == ""


def test_stream_recommit_skips_committed_epoch(tmp_path: Path) -> None:
    """A replayed epoch whose _SUCCESS already exists must keep the first
    manifest and discard the replay's temp files."""
    from data_ingestion_ex8_producer_spark.sinks.datum_sink import _StreamWriter

    dest = tmp_path / "sink"
    w = _StreamWriter(str(dest))
    first = _mk_temp(dest, "aaaa")
    w.commit([first], batchId=3)
    manifest_v1 = (dest / "epoch=3" / "_SUCCESS").read_text()
    assert "part-aaaa.bin" in manifest_v1

    replay = _mk_temp(dest, "bbbb")
    w.commit([replay], batchId=3)
    assert (dest / "epoch=3" / "_SUCCESS").read_text() == manifest_v1
    assert not (dest / "epoch=3" / "part-bbbb.bin").exists()
    assert not list(dest.glob("_tmp_*")), "replay temps must be cleaned up"


def test_stream_recommit_clears_orphans_after_crash(tmp_path: Path) -> None:
    """Crash mid-rename (some part files placed, no _SUCCESS): the replayed
    commit must remove the crashed attempt's orphans so glob readers see
    exactly one attempt's files."""
    from data_ingestion_ex8_producer_spark.sinks.datum_sink import _StreamWriter

    dest = tmp_path / "sink"
    epoch_dir = dest / "epoch=7"
    epoch_dir.mkdir(parents=True)
    (epoch_dir / "part-dead.bin").write_bytes(b"orphan")  # crashed attempt

    w = _StreamWriter(str(dest))
    retry = _mk_temp(dest, "cccc")
    w.commit([retry], batchId=7)
    files = sorted(p.name for p in epoch_dir.glob("part-*.bin"))
    assert files == ["part-cccc.bin"]
    manifest = (epoch_dir / "_SUCCESS").read_text()
    assert "part-cccc.bin" in manifest and "part-dead.bin" not in manifest
