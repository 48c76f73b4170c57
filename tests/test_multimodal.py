"""Multimodal operator tests: exact-value coverage for the codec-backed
ops that the driver can only rows-only-check (queries/multimodal.py)."""

from __future__ import annotations

import numpy as np
import pytest

from xlsx_to_database_spark.operators.multimodal import (
    FakeRawCodec,
    decode_media,
    fake_media_table,
    media_features,
    resize_media,
    sample_frames,
)


def test_codec_round_trip():
    payload = FakeRawCodec.encode(seed=7, width=5, height=4, channels=3, n_frames=2)
    px, w, h, c, f = FakeRawCodec.decode(payload)
    assert (w, h, c, f) == (5, 4, 3, 2)
    assert px.shape == (2, 4, 5, 3)
    # Deterministic: same seed → same bytes.
    assert payload == FakeRawCodec.encode(seed=7, width=5, height=4, channels=3, n_frames=2)


def test_unknown_codec_is_explicit():
    with pytest.raises(NotImplementedError):
        decode_media(None, codec="nosuch")


def test_real_codec_import_gated(spark):
    """codec='real' resolves to the Pillow-backed codec where PIL exists
    and raises the dependency error where it doesn't — either way the
    seam is explicit, never a silent fallback to fake data."""
    from xlsx_to_database_spark.operators.multimodal import PillowCodec

    if not PillowCodec.available():
        with pytest.raises(NotImplementedError, match="Pillow"):
            decode_media(None, codec="real")
        pytest.skip("Pillow not installed — real-codec path verified to gate")
    # Real path: encode a PNG, decode it through the Spark operator.
    payload = PillowCodec.encode(seed=3, width=5, height=4)
    df = spark.createDataFrame([(1, bytearray(payload))], "asset_id long, payload binary")
    row = decode_media(df, codec="real").collect()[0]
    assert (row.width, row.height, row.channels, row.n_frames) == (5, 4, 3, 1)


def test_decode_media_matches_local(spark):
    media = fake_media_table(spark, n_assets=6, width=8, height=6, n_frames=4)
    got = {r.asset_id: r for r in decode_media(media).collect()}
    assert len(got) == 6
    for asset_id in range(6):
        px, w, h, c, f = FakeRawCodec.decode(FakeRawCodec.encode(asset_id, 8, 6, 3, 4))
        r = got[asset_id]
        assert (r.width, r.height, r.channels, r.n_frames) == (w, h, c, f)
        assert r.mean_px == pytest.approx(float(px.mean()), abs=1e-5)


def test_resize_changes_geometry_and_chains(spark):
    media = fake_media_table(spark, n_assets=4, width=8, height=6, n_frames=2)
    small = resize_media(media, out_w=4, out_h=3)
    meta = decode_media(small).collect()
    assert all((r.width, r.height, r.n_frames) == (4, 3, 2) for r in meta)
    # Nearest-neighbor against a local reference for one asset.
    px, w, h, c, f = FakeRawCodec.decode(FakeRawCodec.encode(0, 8, 6, 3, 2))
    ys = (np.arange(3) * 6 // 3)[:, None]
    xs = (np.arange(4) * 8 // 4)[None, :]
    want = px[:, ys, xs, :]
    got_payload = dict(
        (r.asset_id, bytes(r.payload)) for r in small.collect()
    )[0]
    got_px, *_ = FakeRawCodec.decode(got_payload)
    assert np.array_equal(got_px, want)


def test_sample_frames_every_n(spark):
    media = fake_media_table(spark, n_assets=3, width=4, height=4, n_frames=5)
    frames = sample_frames(media, every_n=2).collect()
    per_asset = {}
    for r in frames:
        per_asset.setdefault(r.asset_id, []).append(r.frame_no)
    assert all(sorted(v) == [0, 2, 4] for v in per_asset.values())
    # Each sampled frame decodes as a 1-frame asset of the same geometry.
    one = next(bytes(r.frame) for r in frames if r.asset_id == 1 and r.frame_no == 2)
    px, w, h, c, f = FakeRawCodec.decode(one)
    assert (w, h, c, f) == (4, 4, 3, 1)
    ref_px, *_ = FakeRawCodec.decode(FakeRawCodec.encode(1, 4, 4, 3, 5))
    assert np.array_equal(px[0], ref_px[2])


def test_media_features_histogram(spark):
    media = fake_media_table(spark, n_assets=3, width=8, height=8, n_frames=1)
    rows = media_features(media, n_bins=16).collect()
    for r in rows:
        v = np.array(r.features)
        assert v.shape == (16,)
        assert v.sum() == pytest.approx(1.0, abs=1e-5)
        px, *_ = FakeRawCodec.decode(FakeRawCodec.encode(r.asset_id, 8, 8, 3, 1))
        want = np.bincount(px.reshape(-1) >> 4, minlength=16) / px.size
        assert np.allclose(v, want, atol=1e-6)


# ---------------------------------------------------------------------------
# Stdlib PNG codec: value-level verification on a REAL container format
# (round-3 verdict #5 — no pip, no PIL; zlib + struct only).
# ---------------------------------------------------------------------------


def test_png_round_trips_byte_exact_vs_fakeraw():
    """PNG encode→decode reproduces the exact Philox pixel stream that
    FakeRawCodec generates for the same seed — across gray/RGB/RGBA and
    with >=6 scanlines so every PNG filter type (encode cycles them
    per row: None/Sub/Up/Average/Paeth) is exercised."""
    from xlsx_to_database_spark.operators.multimodal import PngCodec

    for seed, w, h, c in [(0, 8, 6, 3), (1, 5, 7, 1), (2, 16, 11, 4), (3, 1, 1, 3)]:
        png = PngCodec.encode(seed, w, h, c)
        assert png[:8] == b"\x89PNG\r\n\x1a\n"
        px, pw, ph, pc, pf = PngCodec.decode(png)
        fx, *_ = FakeRawCodec.decode(FakeRawCodec.encode(seed, w, h, c, 1))
        assert (pw, ph, pc, pf) == (w, h, c, 1)
        assert np.array_equal(px, fx.reshape(1, h, w, c))


def test_png_rejects_corruption_and_video():
    from xlsx_to_database_spark.operators.multimodal import PngCodec

    good = PngCodec.encode(5, 6, 6, 3)
    with pytest.raises(ValueError, match="not a PNG"):
        PngCodec.decode(b"\x00" + good[1:])
    corrupt = bytearray(good)
    corrupt[40] ^= 0xFF  # inside IHDR/IDAT body → CRC must catch it
    with pytest.raises(ValueError, match="CRC"):
        PngCodec.decode(bytes(corrupt))
    with pytest.raises(ValueError, match="single-frame"):
        PngCodec.encode(5, 6, 6, 3, n_frames=2)


import pandas as pd  # module-level: pandas_udf type hints resolve in globals


def _png_media_table(spark, n_assets, width, height):
    """PNG sibling of fake_media_table: same Philox pixels per asset_id,
    real container bytes."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import BinaryType

    from xlsx_to_database_spark.operators.multimodal import PngCodec

    @F.pandas_udf(BinaryType())
    def encode(ids: pd.Series) -> pd.Series:
        return pd.Series([PngCodec.encode(int(i), width, height, 3) for i in ids])

    return (
        spark.range(n_assets)
        .withColumnRenamed("id", "asset_id")
        .withColumn("payload", encode(F.col("asset_id")))
    )


def test_decode_media_png_values_match_raw_pipeline(spark):
    """decode_media over REAL PNG payloads produces the identical typed
    metadata + pixel stats as the raw pipeline on the same pixels —
    the Spark plumbing (mapInPandas batches, schema) is codec-agnostic
    and now value-verified on a real format."""
    media = _png_media_table(spark, n_assets=6, width=8, height=6)
    got = {r.asset_id: r for r in decode_media(media, codec="png").collect()}
    assert len(got) == 6
    for asset_id in range(6):
        px, *_ = FakeRawCodec.decode(FakeRawCodec.encode(asset_id, 8, 6, 3, 1))
        r = got[asset_id]
        assert (r.width, r.height, r.channels, r.n_frames) == (8, 6, 3, 1)
        assert r.mean_px == pytest.approx(float(px.mean()), abs=1e-5)


def test_resize_media_png_byte_exact(spark):
    """resize over PNG input: decoded-from-PNG pixels run the same
    nearest-neighbor kernel, output payload byte-equal to the raw
    pipeline's resize of the same asset."""
    media = _png_media_table(spark, n_assets=3, width=8, height=6)
    small = {r.asset_id: bytes(r.payload)
             for r in resize_media(media, out_w=4, out_h=3, codec="png").collect()}
    raw = fake_media_table(spark, n_assets=3, width=8, height=6, n_frames=1)
    want = {r.asset_id: bytes(r.payload)
            for r in resize_media(raw, out_w=4, out_h=3).collect()}
    assert small == want


def test_media_features_png_equal_fake(spark):
    """Histogram embeddings from PNG payloads == from raw payloads
    (same pixels, different container) — media_embed's kernel is now
    value-verified on a real format."""
    png = _png_media_table(spark, n_assets=4, width=8, height=8)
    raw = fake_media_table(spark, n_assets=4, width=8, height=8, n_frames=1)
    got = {r.asset_id: list(r.features)
           for r in media_features(png, codec="png").collect()}
    want = {r.asset_id: list(r.features) for r in media_features(raw).collect()}
    assert got == want
