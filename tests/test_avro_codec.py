"""S11 closure: pure-Python Avro binary codec + Confluent framing.

Vectors are hand-computed from the public Apache Avro spec (binary
encoding). The record under test is the reference's RecommendationEvent
(``RecommendationEventSchema.cs:5-19``): {long requestedUserId,
array<long> recommendations, string timestamp} with the producer-side
Confluent wire framing of ``KafkaEventProducer.cs:53-65``.
"""

from __future__ import annotations

import json

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from music_recommendation_service_spark.streaming.avrocodec import (
    decode_long,
    encode_long,
    frame_confluent,
    make_decoder,
    make_encoder,
    unframe_confluent,
)

REC_SCHEMA = json.dumps(
    {
        "type": "record",
        "name": "RecommendationEvent",
        "fields": [
            {"name": "requestedUserId", "type": "long"},
            {"name": "recommendations", "type": {"type": "array", "items": "long"}},
            {"name": "timestamp", "type": "string"},
        ],
    }
)


# -- spec vectors -----------------------------------------------------------


def test_zigzag_varint_spec_vectors():
    # Values straight from the Avro spec's encoding table.
    assert encode_long(0) == b"\x00"
    assert encode_long(-1) == b"\x01"
    assert encode_long(1) == b"\x02"
    assert encode_long(-2) == b"\x03"
    assert encode_long(2) == b"\x04"
    assert encode_long(-64) == b"\x7f"
    assert encode_long(64) == b"\x80\x01"


@given(st.integers(min_value=-(2**63), max_value=2**63 - 1))
@settings(max_examples=300, deadline=None)
def test_long_roundtrip(n):
    v, pos = decode_long(encode_long(n), 0)
    assert v == n and pos == len(encode_long(n))


def test_string_encoding_spec_vector():
    enc = make_encoder("string")
    assert enc("foo") == b"\x06foo"  # length 3 -> zigzag 6


def test_recommendation_event_bytes_hand_computed():
    enc = make_encoder(REC_SCHEMA)
    value = {
        "requestedUserId": 3,
        "recommendations": [1, 2],
        "timestamp": "t",
    }
    # long 3 -> 0x06; array: count 2 -> 0x04, items 0x02 0x04, end 0x00;
    # string "t": len 1 -> 0x02, 0x74
    assert enc(value) == b"\x06\x04\x02\x04\x00\x02t"
    dec = make_decoder(REC_SCHEMA)
    out, pos = dec(enc(value), 0)
    assert out == value and pos == 7


def test_confluent_framing():
    framed = frame_confluent(b"\x06", schema_id=42)
    assert framed == b"\x00\x00\x00\x00\x2a\x06"
    sid, body = unframe_confluent(framed)
    assert sid == 42 and body == b"\x06"
    with pytest.raises(ValueError):
        unframe_confluent(b"\x01zzzzzz")


def test_nullable_union_and_nested():
    schema = json.dumps(
        {
            "type": "record",
            "name": "R",
            "fields": [
                {"name": "a", "type": ["null", "string"]},
                {"name": "b", "type": {"type": "map", "values": "int"}},
                {"name": "c", "type": ["null", "double"]},
                {"name": "d", "type": "boolean"},
                {"name": "e", "type": "bytes"},
            ],
        }
    )
    enc, dec = make_encoder(schema), make_decoder(schema)
    for value in [
        {"a": None, "b": {}, "c": 1.5, "d": True, "e": b"\x00\xff"},
        {"a": "x", "b": {"k": 7, "j": -1}, "c": None, "d": False, "e": b""},
    ]:
        out, pos = dec(enc(value), 0)
        assert out == value and pos == len(enc(value))


@given(
    st.lists(st.integers(min_value=-(2**62), max_value=2**62), max_size=20),
    st.integers(min_value=0, max_value=2**62),
    st.text(max_size=40),
)
@settings(max_examples=100, deadline=None)
def test_record_roundtrip_property(recs, uid, ts):
    enc, dec = make_encoder(REC_SCHEMA), make_decoder(REC_SCHEMA)
    value = {"requestedUserId": uid, "recommendations": recs, "timestamp": ts}
    out, pos = dec(enc(value), 0)
    assert out == value and pos == len(enc(value))


# -- Spark integration ------------------------------------------------------


def test_spark_avro_payload_roundtrip(spark):
    from pyspark.sql import types as T

    from music_recommendation_service_spark.streaming.avrocodec import (
        avro_payload_py,
        parse_avro_payload_py,
    )

    rows = [
        (1, [10, 20, 30], "2024-01-01T00:00:00Z"),
        (2, [], "2024-01-02T12:34:56Z"),
        (3, [7], "2024-02-03T01:02:03Z"),
    ]
    sch = T.StructType(
        [
            T.StructField("requestedUserId", T.LongType()),
            T.StructField("recommendations", T.ArrayType(T.LongType())),
            T.StructField("timestamp", T.StringType()),
        ]
    )
    df = spark.createDataFrame(rows, sch)
    framed = avro_payload_py(df, REC_SCHEMA, schema_id=7)
    assert framed.schema["value"].dataType == T.BinaryType()
    raw = [r.value for r in framed.collect()]
    # every message is Confluent-framed with the registered id
    assert all(unframe_confluent(b)[0] == 7 for b in raw)

    back = parse_avro_payload_py(framed, REC_SCHEMA, sch, framed=True)
    got = sorted(
        (r.requestedUserId, list(r.recommendations), r.timestamp)
        for r in back.collect()
    )
    assert got == sorted((u, list(rs), ts) for u, rs, ts in rows)


def test_spark_avro_matches_jar_when_present(spark):
    """Cross-check the pure-Python writer against spark-avro's to_avro
    byte-for-byte — runs only where the jar exists (same gate discipline as
    tests/test_gated_formats.py)."""
    from pyspark.sql import types as T

    from music_recommendation_service_spark.streaming.avrocodec import avro_payload_py

    sch = T.StructType(
        [
            T.StructField("requestedUserId", T.LongType()),
            T.StructField("recommendations", T.ArrayType(T.LongType())),
            T.StructField("timestamp", T.StringType()),
        ]
    )
    df = spark.createDataFrame([(5, [1, 2, 3], "x")], sch)
    try:
        from pyspark.sql.avro.functions import to_avro
        from pyspark.sql.functions import struct

        jar_bytes = df.select(
            to_avro(struct(*df.columns), REC_SCHEMA).alias("value")
        ).collect()[0].value
    except Exception:
        pytest.skip("spark-avro jar not on classpath (documented: no network)")
    py_bytes = avro_payload_py(df, REC_SCHEMA).collect()[0].value
    assert bytes(jar_bytes) == bytes(py_bytes)
