"""Classpath-gated format tests: Delta Lake (S4/S6/S13 through the real
``format("delta")`` branch of sources/writers.py) and Avro payloads (S11).

Neither module ships in the Spark binary distro, the sandbox has no network
to fetch them (Maven Central unreachable), and delta-spark/spark-avro are
not pip-installed — so HERE these skip. The tests are the executable
contract for any environment that does carry the jars: they must pass
unmodified wherever ``import delta`` / the avro runtime succeeds.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from music_recommendation_service_spark.sources.catalog import load_table


def _delta_available() -> bool:
    try:
        import delta  # noqa: F401

        return True
    except Exception:
        return False


def _avro_available(spark) -> bool:
    """The python wrapper always imports; the implementation classes live in
    the external spark-avro jar — probe by executing a 1-row serialization."""
    try:
        from pyspark.sql.avro.functions import to_avro

        spark.range(1).select(to_avro(F.struct("id"))).collect()
        return True
    except Exception:
        return False


@pytest.mark.skipif(not _delta_available(), reason="delta-spark not importable")
def test_delta_write_append_read_timetravel(spark, sf_dir, tmp_path):
    """Reference parity ``spark_utils.py:51-66`` / ``process_weekly_trends.py:39``
    on the REAL Delta branch: overwrite, strict append, read-back, version
    time travel — mirroring tests/test_snapshots.py semantics."""
    from music_recommendation_service_spark.sources.writers import (
        append_table,
        write_table,
    )

    path = str(tmp_path / "delta_tbl")
    orders = load_table(spark, sf_dir, "orders")
    first = orders.filter(F.col("o_orderkey") % 2 == 0)
    second = orders.filter(F.col("o_orderkey") % 2 == 1)

    write_table(first, path)
    got0 = spark.read.format("delta").load(path)
    assert got0.count() == first.count()

    append_table(second, path)
    assert spark.read.format("delta").load(path).count() == orders.count()
    # time travel to the pre-append version
    v0 = (
        spark.read.format("delta")
        .option("versionAsOf", 0)
        .load(path)
    )
    assert v0.count() == first.count()

    # strict-append contract: schema drift fails loudly
    with pytest.raises(Exception):
        append_table(first.withColumn("extra", F.lit(1)), path)


def test_avro_roundtrip_or_gate(spark, sf_dir, tmp_path):
    """S11: when the avro runtime is present, an events slice must survive
    write->read through the avro file source AND the to_avro payload
    packaging byte-for-byte; without it, the engine's avro entry points
    must fail with a clean ImportError/AnalysisException at CALL time
    (lazy gating — building JSON pipelines never touches avro)."""
    e = (
        load_table(spark, sf_dir, "events")
        .select("event_id", "user_id", "event_type", "value")
        .limit(50)
    )
    if not _avro_available(spark):
        from music_recommendation_service_spark.streaming.pipeline import (
            avro_payload,
            parse_avro_payload,
        )

        # schema-less packaging needs the jar (schema derivation is
        # spark-avro's) -> clean failure at call time
        with pytest.raises(Exception):
            avro_payload(e).collect()
        # schema-PINNED packaging falls back to the pure-Python codec
        # (streaming/avrocodec.py) — full producer->consumer roundtrip
        # must work jarless
        schema_json = (
            '{"type":"record","name":"E","fields":['
            '{"name":"event_id","type":"long"},'
            '{"name":"user_id","type":"long"},'
            '{"name":"event_type","type":"string"},'
            '{"name":"value","type":"double"}]}'
        )
        back = parse_avro_payload(avro_payload(e, schema_json), schema_json)
        assert {tuple(r) for r in back.collect()} == {
            tuple(r) for r in e.collect()
        }
        pytest.skip(
            "spark-avro jar absent — pure-Python codec roundtrip verified; "
            "jar-path byte cross-check runs wherever the jar exists"
        )

    from music_recommendation_service_spark.streaming.pipeline import (
        avro_payload,
        parse_avro_payload,
    )

    # file-source roundtrip pins the schema conversion
    p = str(tmp_path / "avro_out")
    e.write.format("avro").save(p)
    back_file = spark.read.format("avro").load(p)
    assert {tuple(r) for r in back_file.collect()} == {tuple(r) for r in e.collect()}

    # payload roundtrip pins the producer->consumer contract; the declared
    # schema comes from the written file's own metadata (what Schema
    # Registry would hand the consumer in the reference)
    import json as _json
    import os

    avro_files = [f for f in os.listdir(p) if f.endswith(".avro")]
    assert avro_files
    try:
        import fastavro

        with open(os.path.join(p, avro_files[0]), "rb") as fh:
            schema_json = _json.dumps(fastavro.reader(fh).writer_schema)
    except ImportError:
        pytest.skip("no fastavro to extract writer schema")
    back = parse_avro_payload(avro_payload(e), schema_json)
    assert {tuple(r) for r in back.collect()} == {tuple(r) for r in e.collect()}
