"""Avro OCF cross-validation against the Java Avro library.

The Iceberg layer's manifests are only as real as their Avro encoding,
so these tests check ``ocrs_spark.avro_ocf`` in both directions against
the *independent* Avro implementation bundled with Spark
(``avro-1.12.1.jar``), through the py4j gateway.
"""

from __future__ import annotations

import json
import os
import tempfile

import pytest

from ocrs_spark.avro_ocf import read_ocf, write_ocf

SCHEMA = {
    "type": "record",
    "name": "r1",
    "fields": [
        {"name": "a", "type": "long", "field-id": 1},
        {"name": "b", "type": ["null", "string"], "field-id": 2, "default": None},
        {
            "name": "c",
            "type": {
                "type": "array",
                "items": {
                    "type": "record",
                    "name": "r2",
                    "fields": [
                        {"name": "x", "type": "int"},
                        {"name": "y", "type": "bytes"},
                    ],
                },
            },
        },
        {"name": "d", "type": {"type": "map", "values": "double"}},
        {"name": "e", "type": "boolean"},
        {"name": "f", "type": ["null", {"type": "fixed", "name": "fx", "size": 4}], "default": None},
        {"name": "g", "type": "float"},
    ],
}

RECORDS = [
    {
        "a": -(2**62) + 5,
        "b": None,
        "c": [{"x": 1, "y": b"\x00\xff"}, {"x": -7, "y": b""}],
        "d": {"k1": 1.5, "k2": -2.25},
        "e": True,
        "f": b"ABCD",
        "g": 0.5,
    },
    {"a": 0, "b": "héllo", "c": [], "d": {}, "e": False, "f": None, "g": -1.25},
]


@pytest.mark.parametrize("codec", ["null", "deflate"])
def test_roundtrip(codec, tmp_path):
    path = str(tmp_path / "t.avro")
    write_ocf(path, SCHEMA, RECORDS, codec=codec, metadata={"k": "v"})
    records, meta = read_ocf(path)
    assert records == RECORDS
    assert meta["k"] == b"v"
    assert meta["avro.codec"] == codec.encode()


def test_empty_file_roundtrip(tmp_path):
    path = str(tmp_path / "e.avro")
    write_ocf(path, SCHEMA, [])
    records, _ = read_ocf(path)
    assert records == []


def test_many_records_multiblock_sizes(tmp_path):
    recs = [
        {"a": i, "b": f"s{i}", "c": [], "d": {}, "e": bool(i % 2), "f": None, "g": float(i)}
        for i in range(500)
    ]
    path = str(tmp_path / "m.avro")
    write_ocf(path, SCHEMA, recs)
    out, _ = read_ocf(path)
    assert out == recs


def test_jvm_reads_our_files(spark, tmp_path):
    """Files written here parse field-for-field in the Java Avro library."""
    path = str(tmp_path / "ours.avro")
    write_ocf(path, SCHEMA, RECORDS, codec="deflate")
    jvm = spark._jvm
    reader = jvm.org.apache.avro.generic.GenericDatumReader()
    dfr = jvm.org.apache.avro.file.DataFileReader(jvm.java.io.File(path), reader)
    got = []
    while dfr.hasNext():
        rec = dfr.next()
        got.append(
            {
                "a": rec.get("a"),
                "b": None if rec.get("b") is None else str(rec.get("b").toString()),
                "e": bool(rec.get("e")),
                "g": float(rec.get("g")),
                "c_len": rec.get("c").size(),
                "d_len": rec.get("d").size(),
            }
        )
    dfr.close()
    assert got == [
        {"a": r["a"], "b": r["b"], "e": r["e"], "g": r["g"],
         "c_len": len(r["c"]), "d_len": len(r["d"])}
        for r in RECORDS
    ]


def test_we_read_jvm_files(spark, tmp_path):
    """Files written by the Java Avro library parse here, both codecs."""
    jvm = spark._jvm
    schema_json = json.dumps(
        {
            "type": "record",
            "name": "jrec",
            "fields": [
                {"name": "a", "type": "long"},
                {"name": "b", "type": ["null", "string"], "default": None},
                {"name": "c", "type": {"type": "array", "items": "long"}},
                {"name": "d", "type": "bytes"},
                {"name": "e", "type": "boolean"},
                {"name": "f", "type": "double"},
            ],
        }
    )
    sch = jvm.org.apache.avro.Schema.Parser().parse(schema_json)

    def jrec(a, b, c, d, e, f):
        rec = jvm.org.apache.avro.generic.GenericData.Record(sch)
        rec.put("a", jvm.java.lang.Long(a))
        rec.put("b", b)
        arr = jvm.java.util.ArrayList()
        for v in c:
            arr.add(jvm.java.lang.Long(v))
        rec.put("c", arr)
        rec.put("d", jvm.java.nio.ByteBuffer.wrap(bytearray(d)))
        rec.put("e", e)
        rec.put("f", f)
        return rec

    for codec in ("null", "deflate"):
        path = str(tmp_path / f"jvm-{codec}.avro")
        w = jvm.org.apache.avro.generic.GenericDatumWriter(sch)
        dfw = jvm.org.apache.avro.file.DataFileWriter(w)
        if codec == "deflate":
            dfw.setCodec(jvm.org.apache.avro.file.CodecFactory.deflateCodec(6))
        dfw.create(sch, jvm.java.io.File(path))
        dfw.append(jrec(-(2**40) + 3, "héllo", [1, -5, 2**33], b"\x00\xfeZ", True, -3.5))
        dfw.append(jrec(7, None, [], b"", False, 0.0))
        dfw.close()

        records, meta = read_ocf(path)
        assert records == [
            {
                "a": -(2**40) + 3,
                "b": "héllo",
                "c": [1, -5, 2**33],
                "d": b"\x00\xfeZ",
                "e": True,
                "f": -3.5,
            },
            {"a": 7, "b": None, "c": [], "d": b"", "e": False, "f": 0.0},
        ]
        # the Java writer omits the codec key entirely for "null"
        assert meta.get("avro.codec", b"null").decode() == codec


def test_corrupt_sync_detected(tmp_path):
    path = str(tmp_path / "c.avro")
    write_ocf(path, SCHEMA, RECORDS, codec="null")
    data = bytearray(open(path, "rb").read())
    data[-1] ^= 0xFF  # flip a bit in the trailing sync marker
    open(path, "wb").write(bytes(data))
    with pytest.raises(Exception, match="sync marker"):
        read_ocf(path)
