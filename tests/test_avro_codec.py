"""Golden-bytes tests for the Avro binary datum codec (SURVEY.md §5.2 item 2).

The hand-assembled goldens below encode the Avro 1.12 spec by hand —
length-prefixed UTF-8 strings, zig-zag varints, union indexes — pinning the
exact wire format the reference produces per row (raw datum, no container
header, no Confluent framing, ``app.py:147-153``).
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from data_ingestion_ex8_producer_spark.functions.avro_codec import (
    decode_record,
    encode_record,
    encode_string,
    zigzag_varint,
)
from data_ingestion_ex8_producer_spark.schemas import RECLAMACOES_FIELDS

FULL_ROW = {
    "ano": "2024",
    "trimestre": "1º",
    "categoria": "Bancos e financeiras",
    "tipo": "Banco Múltiplo",
    "cnpj_if": "00000000",
    "instituicao_financeira": "BANCO EXEMPLO S.A.",
    "indice": "25,74",
    "quantidade_de_reclamacoes_reguladas_procedentes": "10",
    "quantidade_de_reclamacoes_reguladas_outras": "4",
    "quantidade_de_reclamacoes_nao_reguladas": "7",
    "quantidade_total_de_reclamacoes": "21",
    "quantidade_total_de_clientes_ccs_e_scr": "1000",
    "quantidade_de_clientes_ccs": "600",
    "quantidade_de_clientes_scr": "400",
}


def test_zigzag_varint_spec_values() -> None:
    # Values straight from the Avro spec's varint table.
    assert zigzag_varint(0) == b"\x00"
    assert zigzag_varint(-1) == b"\x01"
    assert zigzag_varint(1) == b"\x02"
    assert zigzag_varint(-2) == b"\x03"
    assert zigzag_varint(64) == b"\x80\x01"
    assert zigzag_varint(-65) == b"\x81\x01"


def test_encode_string_golden() -> None:
    # "2024" -> length 4 (zigzag 8) + ascii bytes
    assert encode_string("2024") == b"\x08" + b"2024"
    # "1º" is 3 UTF-8 bytes -> length prefix 6
    assert encode_string("1º") == b"\x06" + "1º".encode()


def test_record_golden_bytes_prefix() -> None:
    datum = encode_record(FULL_ROW)
    # First field: "2024" with length prefix.
    assert datum.startswith(b"\x082024")
    # Second field follows immediately: "1º".
    assert datum[5:9] == b"\x061\xc2\xba"


def test_nulls_encode_as_union_index_zero() -> None:
    row = dict(FULL_ROW)
    for name, nullable in RECLAMACOES_FIELDS:
        if nullable:
            row[name] = None
    datum = encode_record(row)
    decoded = decode_record(datum)
    for name, nullable in RECLAMACOES_FIELDS:
        assert decoded[name] == (None if nullable else FULL_ROW[name])


def test_non_nullable_none_raises() -> None:
    row = dict(FULL_ROW)
    row["ano"] = None
    try:
        encode_record(row)
    except TypeError as exc:
        assert "ano" in str(exc)
    else:  # pragma: no cover
        raise AssertionError("expected TypeError")


maybe_text = st.one_of(st.none(), st.text(max_size=40))
required_text = st.text(max_size=40)


@settings(max_examples=200)
@given(st.fixed_dictionaries(
    {
        name: (maybe_text if nullable else required_text)
        for name, nullable in RECLAMACOES_FIELDS
    }
))
def test_roundtrip(row: dict) -> None:
    assert decode_record(encode_record(row)) == row


@settings(max_examples=50, deadline=None)
@given(
    st.lists(
        st.fixed_dictionaries(
            {
                name: (maybe_text if nullable else st.one_of(st.none(), required_text))
                for name, nullable in RECLAMACOES_FIELDS
            }
        ),
        max_size=20,
    )
)
def test_column_wise_batch_encoder_equals_per_row(rows: list[dict]) -> None:
    """The shipped mapInPandas kernel (column-wise encode_batches, r10)
    must be byte-identical to per-row encode_record, INCLUDING the
    skip-policy: a row with a null in a non-nullable field is dropped in
    order, exactly as the per-row path's TypeError skip did."""
    import pandas as pd

    from data_ingestion_ex8_producer_spark.functions.avro_codec import (
        encode_batches,
    )

    columns = [name for name, _ in RECLAMACOES_FIELDS]
    pdf = pd.DataFrame(
        {c: [r[c] for r in rows] for c in columns}, dtype=object
    )
    got = list(
        pd.concat(
            list(encode_batches(iter([pdf]), columns)), ignore_index=True
        )["value"]
    ) if rows else []
    want = []
    for r in rows:
        try:
            want.append(encode_record(r))
        except TypeError:
            continue
    assert got == want
