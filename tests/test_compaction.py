"""Contracts for compaction planning (ops/compaction.py): a pure-Python
recompute of the offset-range packing, plus the planner's physical
guarantees — every bin except a partition's last holds >= target
bytes (offset-range packing overfills, never underfills, interior
bins), and bins are contiguous 0..max per partition.
"""

import hashlib
from collections import defaultdict

import pyarrow.parquet as pq

from ocrs_spark.ops.compaction import SIZE_MOD, TARGET_BYTES, _SALT, compaction_plan

SF = "/root/testdata/sf0.001"


def _py_plan():
    t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "source"])
    files = defaultdict(list)
    for doc_id, source in zip(t["doc_id"].to_pylist(), t["source"].to_pylist()):
        h = int(hashlib.md5(f"{doc_id}{_SALT}".encode()).hexdigest()[:8], 16)
        files[source].append((1024 + h % SIZE_MOD, doc_id))
    plan = defaultdict(lambda: [0, 0, 0])  # (source, bin) -> [n, total, max]
    for source, fs in files.items():
        fs.sort(key=lambda x: (-x[0], x[1]))
        cum = 0
        for size, _ in fs:
            b = cum // TARGET_BYTES
            cum += size
            row = plan[(source, b)]
            row[0] += 1
            row[1] += size
            row[2] = max(row[2], size)
    return plan


def test_plan_matches_python_recompute(spark):
    exp = _py_plan()
    got = compaction_plan(spark, SF).collect()
    assert len(got) == len(exp)
    for r in got:
        n, total, mx = exp[(r["source"], r["bin"])]
        assert (r["n_files"], r["total_bytes"], r["max_file_bytes"]) == (n, total, mx)


def test_bins_contiguous_and_interior_bins_full(spark):
    rows = compaction_plan(spark, SF).collect()
    by_source = defaultdict(dict)
    for r in rows:
        by_source[r["source"]][r["bin"]] = r["total_bytes"]
    for source, bins in by_source.items():
        mx = max(bins)
        assert sorted(bins) == list(range(mx + 1))
        # offset-range packing: bin b+1's first file starts at offset
        # sum(bins 0..b), which by construction is >= (b+1)*target —
        # i.e. the prefix through every interior bin crosses its
        # boundary, so no interior bin is underfilled
        cum = 0
        for b in range(mx):
            cum += bins[b]
            assert cum >= (b + 1) * TARGET_BYTES
        # and at least one bin is multi-file (files are < target)
        assert any(v > TARGET_BYTES for v in bins.values()) or mx == 0
