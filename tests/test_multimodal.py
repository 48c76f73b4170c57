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
