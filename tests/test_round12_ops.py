"""Round-12 fixes: TIFF-conformant inline EXIF values, JPEG marker-walk
padding/standalone markers, QOI mid-chunk truncation contract, and the
bounded (space-saving) hot-key monitor state."""

import struct

import pytest

from arango_clickhouse_replica_spark.operators.media_codecs import (
    _QOI_END,
    _QOI_MAGIC,
    decode_qoi,
    encode_exif_jpeg_header,
    parse_exif,
)


def test_exif_inline_ascii_make_roundtrip():
    """TIFF 6.0 stores values that fit the 4-byte field INLINE: a short
    Make (<= 3 chars + NUL) must roundtrip in both byte orders, and the
    encoded TIFF must carry no out-of-line Make bytes."""
    for be in (False, True):
        for make in ("", "a", "RIM", "cam"):
            payload = encode_exif_jpeg_header(9, 7, 3, make, big_endian=be)
            d = parse_exif(payload)
            assert (d["width"], d["height"], d["make"]) == (9, 7, make)
        # inline: TIFF block ends exactly at the IFD (8-byte header +
        # count + 4 entries + next-IFD pointer), no appended data area
        inline = encode_exif_jpeg_header(9, 7, 1, "RIM", big_endian=be)
        outline = encode_exif_jpeg_header(9, 7, 1, "pentax", big_endian=be)
        assert len(inline) == len(outline) - len(b"pentax\x00")


def test_exif_marker_walk_padding_and_standalone_markers():
    """Legal 0xFF fill bytes and length-less standalone markers (TEM,
    RSTn) before APP1 must not desync the walk; SOS before any APP1
    reports 'no EXIF APP1' rather than parsing entropy data."""
    good = encode_exif_jpeg_header(33, 44, 6, "leica")
    app1 = good[2:]  # strip SOI, keep the APP1 segment
    # SOI + fill bytes + TEM + RST4 + APP0 + fill + APP1
    app0 = b"\xff\xe0" + struct.pack(">H", 6) + b"JFIF"
    padded = (b"\xff\xd8" + b"\xff\xff\xff\x01" + b"\xff\xd4"
              + app0 + b"\xff" + app1)
    d = parse_exif(padded)
    assert (d["width"], d["height"], d["orientation"]) == (33, 44, 6)
    assert (d["display_w"], d["display_h"]) == (44, 33)
    # SOS terminates the walk: entropy-coded bytes after it must not be
    # scanned for markers
    sos = b"\xff\xda" + struct.pack(">H", 3) + b"\x01" + b"\x12\x34\x00"
    with pytest.raises(ValueError, match="no EXIF APP1"):
        parse_exif(b"\xff\xd8" + app0 + sos)


def _qoi_payload(chunks: bytes, w: int = 2, h: int = 1) -> bytes:
    return (_QOI_MAGIC + struct.pack(">IIBB", w, h, 3, 0)
            + chunks + _QOI_END)


def test_qoi_truncated_mid_chunk_raises_value_error():
    """A stream cut mid-chunk (RGB/RGBA/LUMA operand bytes missing) must
    raise the decoder's documented ValueError, never IndexError."""
    for chunks in (
        b"\xfe\x01\x02",      # OP_RGB with only 2 of 3 operand bytes
        b"\xff\x01\x02\x03",  # OP_RGBA with 3 of 4
        b"\x80",              # OP_LUMA missing its second byte
        b"\xfe\x01\x02\x03\xfe\x09",  # second chunk truncated
    ):
        with pytest.raises(ValueError, match="truncated QOI"):
            decode_qoi(_qoi_payload(chunks))
    # intact streams still decode
    ok = decode_qoi(_qoi_payload(b"\xfe\x05\x05\x05\xc0"))  # RGB + run(1)
    assert list(ok["pixels"]) == [5, 5]


def test_hot_key_monitor_state_bounded_past_cap(spark, tmp_path):
    """With cap=4 and 9 distinct keys on one shard, the monitor must
    track at most 4 keys (bounded state), keep n_changes EXACT, and
    still surface the true hot key with max_key_changes >= truth."""
    import pandas as pd  # noqa: F401

    from arango_clickhouse_replica_spark.streaming.stateful import (
        streaming_hot_key_monitor,
    )

    # key 100 is hot (12 changes); keys 1..8 appear twice each
    rows = [(0, 100)] * 12 + [(0, k) for k in range(1, 9) for _ in (0, 1)]
    df = spark.createDataFrame(rows, "shard long, user_id long")
    src = str(tmp_path / "src")
    df.coalesce(1).write.mode("append").parquet(src)

    q = (
        streaming_hot_key_monitor(
            spark.readStream.schema(df.schema).parquet(src), cap=4
        )
        .writeStream.format("memory")
        .queryName("hotkey_cap_t")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out = spark.sql(
        "SELECT * FROM hotkey_cap_t ORDER BY n_changes DESC LIMIT 1"
    ).collect()[0]
    assert out.n_changes == 12 + 16  # exact under space-saving adds
    assert out.n_keys == 4          # saturated at the cap
    assert out.hot_key == 100       # the true hot key survives
    assert out.max_key_changes >= 12


def test_hot_key_monitor_exact_under_cap(spark, tmp_path):
    """Below the cap the census is exact: same fixture, default cap."""
    from arango_clickhouse_replica_spark.streaming.stateful import (
        streaming_hot_key_monitor,
    )

    rows = [(0, 100)] * 5 + [(0, 7), (0, 7), (0, 9)]
    df = spark.createDataFrame(rows, "shard long, user_id long")
    src = str(tmp_path / "src")
    df.coalesce(1).write.mode("append").parquet(src)
    q = (
        streaming_hot_key_monitor(
            spark.readStream.schema(df.schema).parquet(src)
        )
        .writeStream.format("memory")
        .queryName("hotkey_exact_t")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out = spark.sql(
        "SELECT * FROM hotkey_exact_t ORDER BY n_changes DESC LIMIT 1"
    ).collect()[0]
    assert (out.n_changes, out.n_keys, out.max_key_changes, out.hot_key) == (
        8, 3, 5, 100)
