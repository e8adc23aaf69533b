"""Unit tests for the pure-Python Avro wire-format codec
(sources/avro_python.py) — spec vectors, container round-trips, and the
header/self-description contract. Pure Python: no SparkSession needed
(the Spark integration is covered by the q_sink_avro_python /
q_scan_avro_python oracle mirror in test_queries.py)."""

import datetime
import os

import pytest

from t_mobile_data_fnt_etl_pipeline_aws_spark.sources.avro_python import (
    AVRO_MAGIC,
    _read_long,
    _write_long,
    read_container,
    read_header,
    spark_ddl_from_avro,
    write_container,
)

SCHEMA = {
    "type": "record",
    "name": "t",
    "fields": [
        {"name": "k", "type": "long"},
        {"name": "s", "type": ["null", "string"]},
        {"name": "x", "type": "double"},
        {"name": "b", "type": "boolean"},
        {"name": "d", "type": {"type": "int", "logicalType": "date"}},
        {
            "name": "ts",
            "type": {"type": "long", "logicalType": "local-timestamp-micros"},
        },
    ],
}


def _rows(n):
    base = datetime.datetime(1995, 6, 17, 12, 30, 45, 123456)
    return [
        (
            i,
            None if i % 3 == 0 else f"row-{i}",
            i * 0.25,
            i % 2 == 0,
            datetime.date(1995, 1, 1) + datetime.timedelta(days=i % 2000),
            base + datetime.timedelta(seconds=i, microseconds=i % 1000),
        )
        for i in range(n)
    ]


def test_zigzag_varint_spec_vectors():
    """The exact byte encodings from the Avro spec's zigzag table."""
    vectors = {
        0: b"\x00",
        -1: b"\x01",
        1: b"\x02",
        -2: b"\x03",
        2: b"\x04",
        -64: b"\x7f",
        64: b"\x80\x01",
    }
    for n, expected in vectors.items():
        out = bytearray()
        _write_long(out, n)
        assert bytes(out) == expected, (n, bytes(out), expected)
        v, pos = _read_long(bytes(out), 0)
        assert v == n and pos == len(out)


def test_varint_64bit_edges():
    for n in (2**62, -(2**62), 2**63 - 1, -(2**63), 12345678901234):
        out = bytearray()
        _write_long(out, n)
        v, pos = _read_long(bytes(out), 0)
        assert v == n and pos == len(out), n


@pytest.mark.parametrize("codec", ["null", "deflate"])
def test_container_roundtrip(tmp_path, codec):
    """Rows survive write->read byte-exact across both required codecs,
    including nulls, dates, wall-clock timestamps, and multi-block files
    (block_rows smaller than the row count forces several blocks)."""
    rows = _rows(5001)
    p = str(tmp_path / f"t_{codec}.avro")
    n = write_container(p, SCHEMA, rows, codec=codec, block_rows=700)
    assert n == 5001
    assert list(read_container(p)) == rows


def test_deflate_actually_compresses(tmp_path):
    rows = _rows(5000)
    p_null = str(tmp_path / "n.avro")
    p_defl = str(tmp_path / "d.avro")
    write_container(p_null, SCHEMA, rows, codec="null")
    write_container(p_defl, SCHEMA, rows, codec="deflate")
    assert os.path.getsize(p_defl) < os.path.getsize(p_null) * 0.8


def test_header_is_self_describing(tmp_path):
    """A reader must recover the writer's schema + codec from the file
    alone (Avro's core property) and the magic must match the spec."""
    p = str(tmp_path / "t.avro")
    write_container(p, SCHEMA, _rows(10), codec="deflate")
    with open(p, "rb") as fh:
        assert fh.read(4) == AVRO_MAGIC == b"Obj\x01"
    schema, codec, sync, pos = read_header(p)
    assert schema == SCHEMA
    assert codec == "deflate"
    assert len(sync) == 16 and pos > 4


def test_sync_marker_corruption_detected(tmp_path):
    p = str(tmp_path / "t.avro")
    write_container(p, SCHEMA, _rows(50), codec="null", block_rows=10)
    raw = bytearray(open(p, "rb").read())
    raw[-1] ^= 0xFF  # clobber the final sync marker
    open(p, "wb").write(raw)
    with pytest.raises(ValueError, match="sync marker"):
        list(read_container(p))


def test_spark_ddl_mapping():
    assert spark_ddl_from_avro(SCHEMA) == (
        "k bigint, s string, x double, b boolean, d date, ts timestamp_ntz"
    )


def test_empty_container(tmp_path):
    p = str(tmp_path / "e.avro")
    assert write_container(p, SCHEMA, []) == 0
    assert list(read_container(p)) == []
