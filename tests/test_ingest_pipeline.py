"""End-to-end ingestion parity tests (SURVEY.md §5.2 item 4): ;-delimited
ISO-8859-1 CSV with raw BACEN headers -> scan -> sanitize -> project ->
empty->NULL -> Avro encode -> decode back.
"""

from __future__ import annotations

from pathlib import Path

import pytest

from data_ingestion_ex8_producer_spark.functions.avro_codec import decode_record
from data_ingestion_ex8_producer_spark.schemas import FIELD_ORDER
from data_ingestion_ex8_producer_spark.sinks.encode import avro_value_frame
from data_ingestion_ex8_producer_spark.sources.csv_source import read_reclamacoes_batch
from data_ingestion_ex8_producer_spark.streaming.ingest import replay_all_batch

RAW_HEADER = (
    "Ano;Trimestre;Categoria;Tipo;CNPJ IF;Instituição financeira;Índice;"
    "Quantidade de reclamações reguladas procedentes;"
    "Quantidade de reclamações reguladas - outras;"
    "Quantidade de reclamações não reguladas;"
    "Quantidade total de reclamações;"
    "Quantidade total de clientes  CCS e SCR;"
    "Quantidade de clientes  CCS;"
    "Quantidade de clientes  SCR;"
    "Coluna desconhecida"  # unknown column: must be dropped (app.py:130)
)

ROWS = [
    # full row
    "2024;1º;Bancos e financeiras;Banco Múltiplo;00000000;BANCO ALFA;25,74;10;4;7;21;1000;600;400;lixo",
    # empty nullable fields -> NULL
    "2024;1º;Bancos e financeiras;Banco Comercial;;BANCO BETA;10,00;5;;;5;500;;;x",
    # empty NON-nullable field (indice) -> row fails Avro encode, is skipped
    "2023;2º;Bancos e financeiras;Banco Múltiplo;11111111;BANCO GAMA;;1;1;1;3;100;50;50;y",
]


@pytest.fixture(scope="module")
def fixture_csv(tmp_path_factory) -> str:
    path = tmp_path_factory.mktemp("reclamacoes") / "reclamacoes_2024.csv"
    content = "\n".join([RAW_HEADER, *ROWS]) + "\n"
    path.write_bytes(content.encode("iso-8859-1"))
    return str(path)


def test_bronze_normalization(spark, fixture_csv: str) -> None:
    df = read_reclamacoes_batch(spark, fixture_csv)
    assert df.columns == FIELD_ORDER  # whitelist + avsc order, unknown dropped
    rows = {r["instituicao_financeira"]: r.asDict() for r in df.collect()}
    assert set(rows) == {"BANCO ALFA", "BANCO BETA", "BANCO GAMA"}

    alfa = rows["BANCO ALFA"]
    assert alfa["ano"] == "2024"
    assert alfa["trimestre"] == "1º"  # ISO-8859-1 decoded correctly
    assert alfa["indice"] == "25,74"

    beta = rows["BANCO BETA"]
    assert beta["cnpj_if"] is None  # empty -> NULL (app.py:131)
    assert beta["quantidade_de_reclamacoes_reguladas_outras"] is None
    assert beta["quantidade_de_clientes_scr"] is None

    gama = rows["BANCO GAMA"]
    assert gama["indice"] is None  # empty non-nullable also nulled at bronze


def test_avro_encode_roundtrip(spark, fixture_csv: str) -> None:
    bronze = read_reclamacoes_batch(spark, fixture_csv)
    encoded = avro_value_frame(bronze)
    assert encoded.columns == ["value"]
    datums = [bytes(r["value"]) for r in encoded.collect()]
    # GAMA has NULL in non-nullable 'indice' -> skipped at encode, like the
    # reference's DatumWriter error path (but per-row, not per-chunk).
    assert len(datums) == 2
    decoded = {d["instituicao_financeira"]: d for d in map(decode_record, datums)}
    assert set(decoded) == {"BANCO ALFA", "BANCO BETA"}
    assert decoded["BANCO ALFA"]["indice"] == "25,74"
    assert decoded["BANCO BETA"]["cnpj_if"] is None


def test_replay_all_batch(spark, fixture_csv: str) -> None:
    out = replay_all_batch(spark, fixture_csv)
    assert out.count() == 2


def test_duplicate_header_last_wins(spark, tmp_path: Path) -> None:
    # Two raw headers sanitizing to "ano": DictReader semantics keep the last.
    path = tmp_path / "dup.csv"
    path.write_bytes("Ano;ANO;Índice\n1999;2024;1,0\n".encode("iso-8859-1"))
    df = read_reclamacoes_batch(spark, str(path))
    row = df.collect()[0]
    assert row["ano"] == "2024"
    assert row["indice"] == "1,0"
    assert row["categoria"] is None  # missing column materializes as NULL


def test_empty_landing_dir(spark, tmp_path: Path) -> None:
    """An empty landing zone yields an empty bronze frame with the full
    schema (the reference would just loop forever doing nothing)."""
    empty = tmp_path / "empty_landing"
    empty.mkdir()
    df = read_reclamacoes_batch(spark, str(empty))
    assert df.columns == FIELD_ORDER
    assert df.count() == 0


def test_header_only_file(spark, tmp_path: Path) -> None:
    """A file with only a header row produces zero records, not an error."""
    path = tmp_path / "header_only.csv"
    path.write_bytes((RAW_HEADER + "\n").encode("iso-8859-1"))
    df = read_reclamacoes_batch(spark, str(path))
    assert df.count() == 0


def test_short_rows_pad_with_nulls(spark, tmp_path: Path) -> None:
    """Rows with fewer fields than the header pad with NULLs (PERMISSIVE),
    instead of killing the rest of the file like the reference's
    abandon-on-error policy (app.py:136-139)."""
    path = tmp_path / "short.csv"
    content = RAW_HEADER + "\n2024;1º;Cat\n"
    path.write_bytes(content.encode("iso-8859-1"))
    df = read_reclamacoes_batch(spark, str(path))
    row = df.collect()[0]
    assert row["ano"] == "2024"
    assert row["categoria"] == "Cat"
    assert row["tipo"] is None
