"""Multimodal plumbing unit tests: null payloads, frame-sample stride,
and adapter schema — paths the oracle parity sweep doesn't isolate."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from tagmarshal_data_lakehouse_spark.training import multimodal


def _media(spark, rows):
    return spark.createDataFrame(
        rows, "media_id long, payload binary, meta struct<mime:string,source_uri:string>"
    )


def test_extract_features_null_payload(spark):
    df = _media(spark, [(1, b"abc", ("x", "u")), (2, None, ("x", "u"))])
    rows = {r["media_id"]: r for r in multimodal.extract_media_features(df).collect()}
    assert rows[1]["n_bytes"] == 3 and rows[1]["content_md5"] == hashlib.md5(b"abc").hexdigest()
    assert rows[2]["n_bytes"] == 0 and rows[2]["content_md5"] is None
    assert rows[2]["width"] == 0 and rows[2]["n_frames"] == 0


def test_sample_frames_stride_and_nulls(spark):
    # len 7 -> n_frames = 1 + 7 % 16 = 8 -> sampled idxs 0, 4
    df = _media(spark, [(1, b"1234567", ("x", "u")), (2, None, ("x", "u"))])
    rows = multimodal.sample_frames(df, every_n=4).collect()
    got = {(r["media_id"], r["frame_idx"]): r["frame_md5"] for r in rows}
    assert set(got) == {(1, 0), (1, 4)}  # null payload emits nothing
    assert got[(1, 0)] == hashlib.md5(b"1234567:0").hexdigest()
    assert got[(1, 4)] == hashlib.md5(b"1234567:4").hexdigest()


def test_documents_as_media_schema_roundtrip(spark):
    docs = spark.createDataFrame(
        [(7, "hello", "en", "web", 5)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    m = multimodal.documents_as_media(docs)
    assert [f.name for f in m.schema.fields] == ["media_id", "payload", "meta"]
    row = m.first()
    assert bytes(row["payload"]) == b"hello"
    assert row["meta"]["source_uri"] == "doc://7"
    # payload bytes feed the same digest the feature extractor reports
    feat = multimodal.extract_media_features(m).first()
    assert feat["content_md5"] == hashlib.md5(b"hello").hexdigest()


def test_sample_frames_batch_bounded(spark):
    # many rows across partitions: output count must equal the exact
    # per-row stride expansion regardless of batch boundaries
    docs = spark.range(200).select(
        F.col("id").alias("media_id"),
        F.encode(F.concat(F.lit("p"), F.col("id").cast("string")), "utf-8").alias("payload"),
        F.struct(F.lit("x").alias("mime"), F.lit("u").alias("source_uri")).alias("meta"),
    ).repartition(7)
    out = multimodal.sample_frames(docs, every_n=4)
    expected = 0
    for r in docs.select("payload").collect():
        n_frames = 1 + (len(bytes(r["payload"])) % 16)
        expected += len(range(0, n_frames, 4))
    assert out.count() == expected


def test_decode_image_real_guarded_by_pillow_presence():
    """decode_image_real is a working decoder when Pillow exists and a
    clear NotImplementedError when it doesn't — either way the plumbing
    contract (returns (width, height, n_frames)) is pinned."""
    try:
        import io

        from PIL import Image

        have_pil = True
    except ImportError:
        have_pil = False

    if not have_pil:
        import pytest

        with pytest.raises(NotImplementedError):
            multimodal.decode_image_real(b"not-an-image")
    else:  # pragma: no cover - container ships no Pillow
        buf = io.BytesIO()
        Image.new("RGB", (12, 8)).save(buf, format="PNG")
        assert multimodal.decode_image_real(buf.getvalue()) == (12, 8, 1)


def test_resize_media_stub_contract(spark):
    """Resize plumbing: fixed output dims, stub thumbnail is the
    32-byte hex digest of payload:WxH, null payloads pass through with
    null features, and source payloads are not in the output schema."""
    docs = spark.createDataFrame(
        [(1, "hello"), (2, None)], "doc_id long, text string"
    )
    media = multimodal.documents_as_media(docs)
    out = {r["media_id"]: r for r in multimodal.resize_media(media, 32, 16).collect()}
    assert set(out) == {1, 2}
    r = out[1]
    assert (r["out_width"], r["out_height"]) == (32, 16)
    expect = hashlib.md5(b"hello:32x16").hexdigest().encode()
    assert bytes(r["thumb"]) == expect
    assert r["thumb_md5"] == hashlib.md5(expect).hexdigest()
    assert r["thumb_n_bytes"] == 32
    # the stub path must self-identify: downstream vision loaders filter
    # on is_stub instead of discovering non-PNG bytes at train time
    assert r["is_stub"] is True
    # fake source dims mirror the feature extractor's stub
    assert r["src_width"] == 64 + (5 % 512) and r["src_height"] == 64 + (5 * 7) % 512
    # null payload -> null features, fixed target dims still present
    n = out[2]
    assert n["thumb"] is None and n["thumb_md5"] is None and n["src_width"] is None
    assert (n["out_width"], n["out_height"]) == (32, 16)
