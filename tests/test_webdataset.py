"""Contracts for WebDataset TAR shard ingestion (ops/webdataset.py):
the written archives must be readable by Python's OWN tarfile module
(independent-implementation proof the ustar headers are conformant),
checksum corruption must trip, and the ingest recomputes through real
bytes.
"""

import io
import tarfile

import pytest

from ocrs_spark.ops.webdataset import (
    _shard,
    parse_tar,
    webdataset_ingest,
)

SF = "/root/testdata/sf0.001"


def test_stdlib_tarfile_reads_our_shards():
    # Independent implementation: if tarfile accepts the archive, the
    # header layout/checksum/padding are genuinely conformant ustar.
    buf = _shard(42, "hello tar world")
    with tarfile.open(fileobj=io.BytesIO(buf)) as tf:
        names = tf.getnames()
        assert names == ["00000042.txt", "00000042.json"]
        assert tf.extractfile(names[0]).read() == b"hello tar world"
        assert tf.extractfile(names[1]).read() == b'{"id": 42}'


def test_parse_tar_roundtrip_and_checksum_trip():
    buf = bytearray(_shard(7, "x" * 700))  # text spans 2 blocks
    members = dict(parse_tar(bytes(buf)))
    assert members["00000007.txt"] == b"x" * 700
    assert members["00000007.json"] == b'{"id": 7}'
    buf[10] ^= 0xFF  # corrupt inside the first header's name field
    with pytest.raises(ValueError, match="checksum"):
        list(parse_tar(bytes(buf)))
    with pytest.raises(ValueError, match="truncated"):
        list(parse_tar(bytes(_shard(7, "x" * 700))[: 512 + 100]))


def test_ingest_accounting_through_bytes(spark):
    rows = webdataset_ingest(spark, SF).collect()
    assert len(rows) == 500
    for r in rows[:40]:
        d = r["doc_id"]
        assert r["sample_key"] == f"{d:08d}"
        assert r["n_members"] == 2
        assert r["json_bytes"] == len(f'{{"id": {d}}}')
        padded = lambda n: ((n + 511) // 512) * 512
        assert r["archive_bytes"] == (
            2 * 512 + padded(r["txt_bytes"]) + padded(r["json_bytes"]) + 1024
        )
