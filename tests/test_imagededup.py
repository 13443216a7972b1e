"""Perceptual image dedup: dHash kernel fixtures (hand-computed bits,
brightness invariance, pigeonhole band guarantee), and full parity of
the distributed pipeline against an independent single-process
reference over the same corpus (the two-implementation oracle)."""

import numpy as np

from ocrs_spark.ops.imagededup import (
    BAND_BITS,
    BANDS,
    HAMMING_MAX,
    _synth_image,
    dhash64,
    image_dhash_pairs,
)

SF = "/root/testdata/sf0.001"


def _gray3(a):
    a = np.asarray(a, dtype=np.uint8)
    return np.repeat(a[:, :, None], 3, axis=2)


def test_dhash_hand_computed():
    # 8x9 image, already at hash resolution (resize = identity):
    # strictly increasing columns -> every adjacent diff positive ->
    # all 64 bits set
    inc = np.tile(np.arange(9, dtype=np.uint8) * 10, (8, 1))
    assert dhash64(_gray3(inc)) == (1 << 64) - 1
    # strictly decreasing -> no bits set
    assert dhash64(_gray3(inc[:, ::-1])) == 0
    # flat -> no strict increase -> 0
    assert dhash64(_gray3(np.full((8, 9), 7))) == 0


def test_dhash_brightness_invariant():
    rng = np.random.default_rng(3)
    img = rng.integers(0, 200, (30, 40), dtype=np.uint8)
    assert dhash64(_gray3(img)) == dhash64(_gray3(img + 20))


def test_dhash_discriminates_noise():
    rng = np.random.default_rng(4)
    a = rng.integers(0, 250, (30, 40), dtype=np.uint8)
    b = rng.integers(0, 250, (30, 40), dtype=np.uint8)
    ham = bin(dhash64(_gray3(a)) ^ dhash64(_gray3(b))).count("1")
    assert ham > HAMMING_MAX


def test_band_pigeonhole():
    # hamming <= BANDS-1 forces at least one untouched band
    h = dhash64(_gray3(np.random.default_rng(5).integers(0, 250, (24, 32), np.uint8)))
    corrupted = h ^ 0b101  # 2 flipped bits < BANDS
    match = any(
        ((h >> (k * BAND_BITS)) & ((1 << BAND_BITS) - 1))
        == ((corrupted >> (k * BAND_BITS)) & ((1 << BAND_BITS) - 1))
        for k in range(BANDS)
    )
    assert match


def test_pipeline_matches_reference_and_recovers_planted(spark):
    import duckdb

    ids = [
        r[0]
        for r in duckdb.sql(
            f"select doc_id from '{SF}/documents.parquet'"
        ).fetchall()
    ]
    hs = {i: dhash64(_synth_image(i)) for i in ids}

    def ham(a, b):
        return bin(a ^ b).count("1")

    def bandmatch(a, b):
        mask = (1 << BAND_BITS) - 1
        return any(
            ((a >> (k * BAND_BITS)) & mask) == ((b >> (k * BAND_BITS)) & mask)
            for k in range(BANDS)
        )

    ref = sorted(
        (a, b, ham(hs[a], hs[b]))
        for i, a in enumerate(ids)
        for b in ids[i + 1 :]
        if bandmatch(hs[a], hs[b]) and ham(hs[a], hs[b]) <= HAMMING_MAX
    )
    got = sorted(
        (r["doc_a"], r["doc_b"], r["hamming"])
        for r in image_dhash_pairs(spark, SF).collect()
    )
    assert got == ref

    id_set = set(ids)
    planted = {
        (g * 5, g * 5 + 1)
        for g in range(max(ids) // 5 + 1)
        if g * 5 in id_set and g * 5 + 1 in id_set
    }
    found = {(a, b) for a, b, _ in got}
    assert planted <= found  # every planted near-dup recovered
    assert found - planted == set()  # and nothing else on this corpus


def test_image_clusters_are_planted_pairs_with_min_canonical(spark):
    """Cluster formation over the verified pair graph must produce
    exactly the planted two-member clusters, canonical = min doc_id —
    a closed-form ground truth (union-find is overkill on pairs that
    are already disjoint, which is itself asserted above)."""
    from ocrs_spark.ops.imagededup import image_dedup_clusters

    rows = image_dedup_clusters(spark, SF).collect()
    by_cluster = {}
    for r in rows:
        by_cluster.setdefault(r.cluster_id, []).append(r)
    assert by_cluster, "no clusters formed"
    for cid, members in by_cluster.items():
        ids = sorted(m.doc_id for m in members)
        assert ids == [cid, cid + 1]  # planted (5g, 5g+1) pairs
        assert cid % 5 == 0
        canon = {m.doc_id: m.is_canonical for m in members}
        assert canon == {cid: True, cid + 1: False}
