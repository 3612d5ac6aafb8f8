"""Multimodal decode: real stdlib PNG path + Arrow plumbing.

Builds PNGs with a minimal in-test encoder (struct + zlib, spec-compliant)
so the decoder's scanline-filter branches (None/Sub/Up/Average/Paeth) are
each exercised against known pixel values — no image libraries needed.
"""

from __future__ import annotations

import struct
import zlib

import pytest

from project_bigdata_spark.operators import multimodal as MM


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data))
    )


def _filter_line(filt: int, line: bytes, prev: bytes, ch: int) -> bytes:
    """Forward-apply a PNG filter (spec §9) to produce the stored bytes."""
    out = bytearray(len(line))
    for i in range(len(line)):
        a = line[i - ch] if i >= ch else 0
        b = prev[i]
        c = prev[i - ch] if i >= ch else 0
        if filt == 0:
            pred = 0
        elif filt == 1:
            pred = a
        elif filt == 2:
            pred = b
        elif filt == 3:
            pred = (a + b) >> 1
        else:  # Paeth
            p = a + b - c
            pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
            pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
        out[i] = (line[i] - pred) & 0xFF
    return bytes(out)


def encode_png(
    rows: list[list[int]], color_type: int, filters: list[int] | None = None
) -> bytes:
    """rows = per-scanline flat samples (ch per pixel); returns PNG bytes."""
    ch = {0: 1, 2: 3, 4: 2, 6: 4}[color_type]
    width = len(rows[0]) // ch
    filters = filters or [0] * len(rows)
    raw = bytearray()
    prev = bytes(len(rows[0]))
    for filt, row in zip(filters, rows):
        line = bytes(row)
        raw += bytes([filt]) + _filter_line(filt, line, prev, ch)
        prev = line
    ihdr = struct.pack(">IIBBBBB", width, len(rows), 8, color_type, 0, 0, 0)
    return (
        MM.PNG_MAGIC
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _chunk(b"IEND", b"")
    )


def test_png_decode_grayscale_all_filters():
    # 5 rows x 4 px, one row per filter type; known mean
    rows = [
        [0, 64, 128, 255],
        [10, 20, 30, 40],
        [200, 150, 100, 50],
        [7, 7, 7, 7],
        [255, 0, 255, 0],
    ]
    png = encode_png(rows, color_type=0, filters=[0, 1, 2, 3, 4])
    w, h, luma = MM._png_decode(png)
    assert (w, h) == (4, 5)
    expect = sum(sum(r) for r in rows) / 20 / 255.0
    assert luma == pytest.approx(expect, abs=1e-9)


def test_png_decode_rgb_and_rgba_luma():
    # pure red 2x1 RGB: Rec.601 luma = 0.299
    red = encode_png([[255, 0, 0, 255, 0, 0]], color_type=2, filters=[4])
    assert MM._png_decode(red)[2] == pytest.approx(0.299, abs=1e-9)
    # white RGBA with alpha ignored for luma
    white = encode_png([[255, 255, 255, 0, 255, 255, 255, 0]], color_type=6)
    w, h, luma = MM._png_decode(white)
    assert (w, h, luma) == (2, 1, pytest.approx(1.0, abs=1e-9))


def test_png_decode_rejects_unsupported():
    with pytest.raises(ValueError):
        MM._png_decode(b"JFIF not a png")
    bad_depth = (
        MM.PNG_MAGIC
        + _chunk(b"IHDR", struct.pack(">IIBBBBB", 1, 1, 16, 0, 0, 0, 0))
        + _chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError):
        MM._png_decode(bad_depth)


def test_real_decode_spark_path(spark):
    # use_real=True must run end-to-end through mapInPandas on workers
    # (module registered for by-value pickling — no package import there)
    pngs = [
        (1, encode_png([[0, 0, 0, 0], [0, 0, 0, 0]], color_type=0)),
        (2, encode_png([[255, 255], [255, 255]], color_type=0, filters=[0, 2])),
    ]
    df = spark.createDataFrame(pngs, ["media_id", "payload"])
    media = MM.to_media_table(df, "media_id", "payload", "image")
    out = {
        r.media_id: r
        for r in MM.decode_features(media, use_real=True).collect()
    }
    assert (out[1].width, out[1].height, out[1].mean_luma) == (4, 2, 0.0)
    assert (out[2].width, out[2].height, out[2].mean_luma) == (2, 2, 1.0)


def test_fake_decode_deterministic(spark):
    df = spark.createDataFrame([(1, b"payload")], ["media_id", "payload"])
    media = MM.to_media_table(df, "media_id", "payload", "image")
    a = MM.decode_features(media).collect()[0]
    b = MM.decode_features(media).collect()[0]
    assert (a.width, a.height, a.mean_luma) == (b.width, b.height, b.mean_luma)
    assert 64 <= a.width < 256 and 0.0 <= a.mean_luma <= 1.0


def test_frame_sample_every_n_and_min_one_frame(spark):
    from project_bigdata_spark.operators import multimodal as MM

    df = spark.createDataFrame(
        [(1, b"x" * 25_000), (2, b"y" * 100)], ["doc_id", "payload"]
    )
    media = MM.to_media_table(df, "doc_id", "payload", "video")
    got = {}
    for r in MM.frame_sample_plan(media, every_n=10).collect():
        got.setdefault(r.media_id, []).append(r.frame_idx)
    # 25 frames -> sampled 0,10,20; tiny payload still yields frame 0
    assert sorted(got[1]) == [0, 10, 20]
    assert got[2] == [0]


def test_audio_segments_cover_all_samples_once(spark):
    from project_bigdata_spark.operators import multimodal as MM

    # 600 bytes -> 300 samples -> segments of 256: [0,256) + [256,300)
    df = spark.createDataFrame([(1, b"\x00" * 600)], ["doc_id", "payload"])
    media = MM.to_media_table(df, "doc_id", "payload", "audio")
    rows = sorted(
        MM.audio_segment_plan(media, window_samples=256).collect(),
        key=lambda r: r.seg_idx,
    )
    assert [(r.seg_idx, r.start_sample, r.n_samples, r.byte_off, r.n_bytes)
            for r in rows] == [(0, 0, 256, 0, 512), (1, 256, 44, 512, 88)]
    assert sum(r.n_samples for r in rows) == 300


def test_audio_segments_empty_payload_single_empty_segment(spark):
    from project_bigdata_spark.operators import multimodal as MM

    df = spark.createDataFrame([(1, b"")], ["doc_id", "payload"])
    media = MM.to_media_table(df, "doc_id", "payload", "audio")
    rows = MM.audio_segment_plan(media).collect()
    assert len(rows) == 1 and rows[0].n_samples == 0


def test_audio_rms_constant_signal(spark):
    import struct

    from project_bigdata_spark.operators import multimodal as MM

    # 100 samples of constant amplitude 1000 -> RMS exactly 1000.0
    pcm = struct.pack("<100h", *([1000] * 100))
    df = spark.createDataFrame([(7, pcm)], ["doc_id", "payload"])
    media = MM.to_media_table(df, "doc_id", "payload", "audio")
    row = MM.audio_rms_features(media).collect()[0]
    assert (row.media_id, row.n_samples) == (7, 100)
    assert abs(row.rms - 1000.0) < 1e-9


def test_audio_rms_truncates_odd_trailing_byte(spark):
    from project_bigdata_spark.operators import multimodal as MM

    df = spark.createDataFrame([(1, b"\x00\x00\xff")], ["doc_id", "payload"])
    media = MM.to_media_table(df, "doc_id", "payload", "audio")
    row = MM.audio_rms_features(media).collect()[0]
    assert row.n_samples == 1 and row.rms == 0.0


def test_box_average_grid_exact():
    rows = [
        [0.0, 0.0, 255.0, 255.0],
        [0.0, 0.0, 255.0, 255.0],
        [255.0, 255.0, 0.0, 0.0],
        [255.0, 255.0, 0.0, 0.0],
    ]
    grid = MM.box_average_grid(rows, 2, 2)
    assert grid == [0.0, 1.0, 1.0, 0.0]
    # grid larger than image: cells clamp to >=1 pixel, full grid emitted
    tiny = MM.box_average_grid([[255.0]], 2, 2)
    assert tiny == [1.0, 1.0, 1.0, 1.0]


def test_resize_features_real_png(spark):
    # 2x2 gray checkerboard PNG -> 2x2 grid reproduces the pixels
    png = encode_png([[0, 255], [255, 0]], color_type=0)
    df = spark.createDataFrame(
        [(1, bytearray(png))], "media_id long, payload binary"
    )
    (row,) = MM.resize_features(
        df, grid_h=2, grid_w=2, use_real=True
    ).collect()
    assert (row["width"], row["height"]) == (2, 2)
    assert [round(v, 6) for v in row["grid"]] == [0.0, 1.0, 1.0, 0.0]


def test_resize_features_fake_shape_and_determinism(spark):
    df = spark.createDataFrame(
        [(i, bytearray(f"doc {i}".encode())) for i in range(5)],
        "media_id long, payload binary",
    )
    out = {r["media_id"]: r for r in MM.resize_features(df).collect()}
    assert len(out) == 5
    for r in out.values():
        assert len(r["grid"]) == 16
        assert all(0.0 <= v <= 1.0 for v in r["grid"])
    again = {r["media_id"]: r for r in MM.resize_features(df).collect()}
    assert {k: v["grid"] for k, v in out.items()} == {
        k: v["grid"] for k, v in again.items()
    }
