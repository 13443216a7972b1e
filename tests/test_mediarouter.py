"""Contracts for heterogeneous media routing (ops/mediarouter.py):
the magic-byte dispatch must route each payload kind to the right
extractor (and reject unknowns), and the unified row recomputes
through real bytes for all three kinds.
"""

import pytest

from ocrs_spark.ops.audio import _rate, _samples, encode_wav
from ocrs_spark.ops.imagemeta import _png_with_text
from ocrs_spark.ops.mediarouter import media_route_meta, route_media
from ocrs_spark.ops.video import _n_frames, _usec_per_frame, encode_avi

SF = "/root/testdata/sf0.001"


def test_dispatch_by_magic_not_position():
    # Any doc_id's bytes route by CONTENT: feed each encoder's output
    # regardless of the doc_id % 3 convention.
    kind, w, h, units, dur, cap = route_media(_png_with_text(9))
    assert kind == "image" and (w, h) == (4 + 9 % 3, 3) and cap == "img 9 cap 9"
    kind, w, h, units, dur, cap = route_media(
        encode_wav(_samples(9), _rate(9))
    )
    assert kind == "audio" and (w, h) == (-1, -1)
    assert units == len(_samples(9)) and cap == ""
    kind, w, h, units, dur, cap = route_media(encode_avi(9))
    assert kind == "video" and units == _n_frames(9)
    assert dur == _n_frames(9) * _usec_per_frame(9) // 1000
    with pytest.raises(ValueError):
        route_media(b"GIF89a not supported here")


def test_router_covers_all_kinds_once_each(spark):
    rows = media_route_meta(spark, SF).collect()
    assert len(rows) == 500
    kinds = {}
    for r in rows:
        kinds.setdefault(r["media_kind"], 0)
        kinds[r["media_kind"]] += 1
        assert r["media_kind"] == ("image", "audio", "video")[r["doc_id"] % 3]
        if r["media_kind"] == "image":
            assert r["duration_ms"] == 0 and r["caption"].startswith("img ")
        else:
            assert r["duration_ms"] > 0 and r["caption"] == ""
    assert set(kinds) == {"image", "audio", "video"}


def test_stream_twin_converges_to_batch(spark):
    from ocrs_spark.ops.mediarouter import stream_media_route

    batch = {
        r["doc_id"]: r for r in media_route_meta(spark, SF).collect()
    }
    stream = stream_media_route(spark, SF).collect()
    assert len(stream) == len(batch)
    for r in stream:
        assert r.asDict() == batch[r["doc_id"]].asDict()
