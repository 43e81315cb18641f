"""Encode -> decode roundtrip through the Kafka-shaped frame (value: binary),
broker-less: proves the consumer-side decode inverts the producer-side encode
on the same DataFrame surface Kafka would carry.
"""

from __future__ import annotations

from data_ingestion_ex8_producer_spark.schemas import BRONZE_SCHEMA, FIELD_ORDER
from data_ingestion_ex8_producer_spark.sinks.encode import avro_value_frame
from data_ingestion_ex8_producer_spark.sources.kafka_source import decode_value_frame

ROWS = [
    (
        "2024", "1º", "Bancos e financeiras", "Banco Múltiplo", "00000000",
        "BANCO ALFA", "25,74", "10", "4", "7", "21", "1000", "600", "400",
    ),
    (
        "2024", "2º", "Bancos e financeiras", "Banco Comercial", None,
        "BANCO BETA", "10,00", "5", None, None, "5", "500", None, None,
    ),
]


def test_encode_decode_roundtrip(spark) -> None:
    bronze = spark.createDataFrame(ROWS, BRONZE_SCHEMA)
    encoded = avro_value_frame(bronze)
    decoded = decode_value_frame(encoded)
    assert decoded.columns == FIELD_ORDER
    got = sorted(tuple(r) for r in decoded.collect())
    assert got == sorted(ROWS)
