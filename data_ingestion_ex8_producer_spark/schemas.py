"""Schemas for the reclamacoes (BACEN bank-complaints) ingestion surface.

Three artifacts, mirroring the reference's three-layer schema system
(SURVEY.md §1.2):

* ``RECLAMACOES_AVRO_SCHEMA_JSON`` — byte-authoritative output schema; same
  field names/order/nullability as the reference's
  ``src/ex8_producer/schemas/reclamacoes.avsc:5-82`` (14 fields, all string or
  nullable-string, record name ``reclamacoes`` in namespace ``ex7_producer`` —
  the namespace is a reference quirk preserved for wire parity).
* ``BRONZE_SCHEMA`` — StructType equivalent used on read; nullable exactly on
  the 5 Avro union fields.
* ``silver_columns()`` — typed projection realizing the *intent* of the
  reference's dead-code type map (``settings.py:22-37``): int casts for counts,
  decimal-comma parse for ``indice``, a proper quarter date.  Additive engine
  surface, not parity (the reference never casts — SURVEY.md §1.2).
"""

from __future__ import annotations

import json

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

# Field name -> nullable, in authoritative Avro order (reclamacoes.avsc:5-82).
RECLAMACOES_FIELDS: list[tuple[str, bool]] = [
    ("ano", False),
    ("trimestre", False),
    ("categoria", False),
    ("tipo", False),
    ("cnpj_if", True),
    ("instituicao_financeira", False),
    ("indice", False),
    ("quantidade_de_reclamacoes_reguladas_procedentes", False),
    ("quantidade_de_reclamacoes_reguladas_outras", True),
    ("quantidade_de_reclamacoes_nao_reguladas", True),
    ("quantidade_total_de_reclamacoes", False),
    ("quantidade_total_de_clientes_ccs_e_scr", False),
    ("quantidade_de_clientes_ccs", True),
    ("quantidade_de_clientes_scr", True),
]

FIELD_ORDER: list[str] = [name for name, _ in RECLAMACOES_FIELDS]

# The projection whitelist: same membership set the reference checks row fields
# against (settings.py:22-37, consulted only for membership at app.py:130).
PROJECTION_WHITELIST: frozenset[str] = frozenset(FIELD_ORDER)

RECLAMACOES_AVRO_SCHEMA: dict = {
    "type": "record",
    "name": "reclamacoes",
    "namespace": "ex7_producer",
    "fields": [
        {"name": name, "type": "string"}
        if not nullable
        else {"name": name, "type": ["null", "string"], "default": None}
        for name, nullable in RECLAMACOES_FIELDS
    ],
}

RECLAMACOES_AVRO_SCHEMA_JSON: str = json.dumps(RECLAMACOES_AVRO_SCHEMA)

BRONZE_SCHEMA = StructType(
    [StructField(name, StringType(), nullable) for name, nullable in RECLAMACOES_FIELDS]
)

# Count fields whose settings.py type string said "int" (settings.py:23,30-36).
_INT_FIELDS = [
    "ano",
    "quantidade_de_reclamacoes_reguladas_procedentes",
    "quantidade_de_reclamacoes_reguladas_outras",
    "quantidade_de_reclamacoes_nao_reguladas",
    "quantidade_total_de_reclamacoes",
    "quantidade_total_de_clientes_ccs_e_scr",
    "quantidade_de_clientes_ccs",
    "quantidade_de_clientes_scr",
]


def silver_columns() -> list[Column]:
    """Typed view over the bronze columns (engine-only; see module docstring)."""
    cols: list[Column] = []
    for name in FIELD_ORDER:
        if name in _INT_FIELDS:
            cols.append(F.col(name).cast("long").alias(name))
        elif name == "indice":
            # Brazilian decimal comma, e.g. "25,74" -> 25.74.
            cols.append(
                F.regexp_replace(F.col(name), ",", ".").cast("decimal(18,2)").alias(name)
            )
        else:
            cols.append(F.col(name))
    # Derived quarter start date from ano + trimestre ("1º".."4º").
    quarter = F.regexp_extract(F.col("trimestre"), r"(\d)", 1).cast("int")
    cols.append(
        F.make_date(F.col("ano").cast("int"), (quarter - 1) * 3 + 1, F.lit(1)).alias(
            "quarter_start"
        )
    )
    return cols
