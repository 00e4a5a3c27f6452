"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride as `binary` columns with a metadata struct; the
decode/feature-extract step runs as mapInPandas over Arrow batches so
each task touches a bounded batch of payloads (spark.sql.execution.arrow.
maxRecordsPerBatch caps peak memory per task at 100 TB).

The actual codec work is STUBBED: this container ships no image/audio
libraries, so `decode_image_stub` derives deterministic fake features
(dimensions from byte stats, md5 content digest).  The Spark-side
plumbing — schema, batch iteration, UDF signature, partition behavior —
is real and is what the tests cover; swap `_fake_decode` for PIL/ffmpeg
in a real deployment.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType(), True),
                    T.StructField("source_uri", T.StringType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("content_md5", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("n_frames", T.IntegerType(), True),
    ]
)


def _fake_decode(payload: bytes) -> tuple[int, int, int]:
    """Deterministic stand-in for a real decoder. A real deployment
    replaces this one function with PIL/libav calls; everything else in
    the pipeline is production-shaped."""
    n = len(payload)
    return 64 + (n % 512), 64 + ((n * 7) % 512), 1 + (n % 16)


def extract_media_features(media: DataFrame) -> DataFrame:
    """mapInPandas feature extraction over binary payloads.

    Arrow-batched: each iterator element is a bounded pandas batch, so
    payload bytes never accumulate unboundedly in the Python worker.
    """

    def fake_decode(payload: bytes) -> tuple[int, int, int]:
        # Closure-local mirror of _fake_decode: nested functions pickle BY
        # VALUE (cloudpickle), so executors don't need this package on
        # their sys.path; a module-global reference would pickle by name
        # and fail off-PYTHONPATH workers.
        n = len(payload)
        return 64 + (n % 512), 64 + ((n * 7) % 512), 1 + (n % 16)

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            n_bytes = payloads.map(lambda p: len(p) if p is not None else 0)
            md5 = payloads.map(
                lambda p: hashlib.md5(p).hexdigest() if p is not None else None
            )
            dims = payloads.map(lambda p: fake_decode(p) if p is not None else (0, 0, 0))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": n_bytes.astype("int64"),
                    "content_md5": md5,
                    "width": dims.map(lambda d: d[0]).astype("int32"),
                    "height": dims.map(lambda d: d[1]).astype("int32"),
                    "n_frames": dims.map(lambda d: d[2]).astype("int32"),
                }
            )

    # Only the columns the function reads cross the Python boundary
    # (r13 optimization pass, guide §4.1): Spark cannot see which
    # columns an opaque mapInPandas touches, so without the explicit
    # select the metadata struct would be read, transposed to Arrow and
    # shipped to every worker just to be dropped.
    return media.select("media_id", "payload").mapInPandas(extract, schema=FEATURE_SCHEMA)


def documents_as_media(documents: DataFrame) -> DataFrame:
    """Adapter: treat document text bytes as opaque media payloads (the
    testdata ships no real binaries). Demonstrates the real schema path:
    binary payload + typed metadata struct."""
    return documents.select(
        F.col("doc_id").alias("media_id"),
        F.encode(F.col("text"), "utf-8").alias("payload"),
        F.struct(
            F.lit("text/plain").alias("mime"),
            F.concat(F.lit("doc://"), F.col("doc_id").cast("string")).alias("source_uri"),
        ).alias("meta"),
    )


def decode_image_real(payload: bytes) -> tuple[int, int, int]:
    """Real image decode when Pillow is installed, raising otherwise.

    Returns (width, height, n_frames) — the same triple the deterministic
    stub produces — so `extract_media_features` plumbing (schema, batch
    shape, partitioning) is identical whichever decoder runs. The import
    lives inside the function: it executes on executors, where a
    module-top-level import would make the whole module unusable in
    containers without PIL (like this one).
    """
    try:
        import io

        from PIL import Image
    except ImportError as exc:  # pragma: no cover - PIL absent here
        raise NotImplementedError(
            "image decoding requires Pillow, which is not installed; "
            "use extract_media_features (deterministic stub) instead"
        ) from exc
    with Image.open(io.BytesIO(payload)) as img:
        n_frames = int(getattr(img, "n_frames", 1))
        return int(img.width), int(img.height), n_frames


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("frame_md5", T.StringType(), True),
    ]
)


def sample_frames(media: DataFrame, every_n: int = 4) -> DataFrame:
    """Frame sampling over video-style payloads: one output row per
    sampled frame index (0, every_n, 2*every_n, ... < n_frames).

    The 1->N expansion shape every video pipeline needs: the explosion
    happens INSIDE the Arrow batch iterator, so a task's peak memory is
    one input batch plus its sampled frames — payload bytes are dropped
    before yield, never carried per frame.  The frame decode is the same
    deterministic stub as extract_media_features (frame content stands
    in as md5(payload : idx)); a real deployment swaps in libav
    keyframe extraction and the plumbing — schema, batch shape,
    partition behavior — is unchanged.
    """

    def fake_n_frames(payload: bytes) -> int:
        # closure-local (pickles by value; see extract_media_features)
        return 1 + (len(payload) % 16)

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, digests = [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None:
                    continue
                for i in range(0, fake_n_frames(payload), every_n):
                    ids.append(mid)
                    idxs.append(i)
                    digests.append(
                        hashlib.md5(payload + b":" + str(i).encode()).hexdigest()
                    )
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "frame_md5": pd.Series(digests, dtype="object"),
                }
            )

    # guide §4.1: ship only the columns the function reads (see
    # extract_media_features)
    return media.select("media_id", "payload").mapInPandas(sample, schema=FRAME_SCHEMA)


RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("src_width", T.IntegerType(), True),
        T.StructField("src_height", T.IntegerType(), True),
        T.StructField("out_width", T.IntegerType(), False),
        T.StructField("out_height", T.IntegerType(), False),
        T.StructField("thumb", T.BinaryType(), True),
        T.StructField("thumb_md5", T.StringType(), True),
        T.StructField("thumb_n_bytes", T.LongType(), True),
        T.StructField("is_stub", T.BooleanType(), True),
    ]
)


def resize_media(media: DataFrame, target_w: int = 64, target_h: int = 64) -> DataFrame:
    """Batch thumbnail/resize over binary payloads — the preprocessing
    step every vision-training pipeline runs before feature extraction.

    mapInPandas like `extract_media_features`: one bounded Arrow batch
    in, one out; source payload bytes are dropped before yield so task
    memory is one input batch plus its (smaller) thumbnails. With Pillow
    installed the real decoder resizes via Image.resize and re-encodes;
    otherwise (or when a payload is not a decodable image) the
    deterministic stub stands in: source dims from `_fake_decode`,
    thumbnail bytes = md5(payload : WxH) hex digest — stable across
    engines, so the whole mapInPandas path is oracle-checkable
    end-to-end (the same contract as multimodal_features).

    `is_stub` flags which path produced each row: stub bytes must never
    be mistaken for a real PNG by a downstream vision loader, so a
    corrupt image in a Pillow deployment yields (is_stub=true) rather
    than a silently-wrong thumbnail — filter or alert on it.
    """
    tw, th = int(target_w), int(target_h)

    def fake_decode(payload: bytes) -> tuple[int, int, int]:
        # closure-local (pickles by value; see extract_media_features)
        n = len(payload)
        return 64 + (n % 512), 64 + ((n * 7) % 512), 1 + (n % 16)

    def resize_one(payload: bytes) -> tuple[int, int, bytes, bool]:
        try:  # real path when Pillow exists
            import io

            from PIL import Image

            with Image.open(io.BytesIO(payload)) as img:
                sw, sh = int(img.width), int(img.height)
                buf = io.BytesIO()
                img.resize((tw, th)).save(buf, format="PNG")
                return sw, sh, buf.getvalue(), False
        except Exception:  # noqa: BLE001 — no PIL / not an image: stub
            sw, sh, _ = fake_decode(payload)
            # hex-string bytes (not the raw digest): keeps the stub's
            # downstream content hash expressible in the SQL oracle
            # (DuckDB md5() only accepts VARCHAR)
            thumb = hashlib.md5(payload + f":{tw}x{th}".encode()).hexdigest().encode()
            return sw, sh, thumb, True

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, sws, shs, thumbs, stubs = [], [], [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None:
                    ids.append(mid)
                    sws.append(None); shs.append(None); thumbs.append(None); stubs.append(None)
                    continue
                sw, sh, thumb, stub = resize_one(bytes(payload))
                ids.append(mid); sws.append(sw); shs.append(sh)
                thumbs.append(thumb); stubs.append(stub)
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="int64"),
                    "src_width": pd.Series(sws, dtype="object"),
                    "src_height": pd.Series(shs, dtype="object"),
                    "out_width": pd.Series([tw] * len(ids), dtype="int32"),
                    "out_height": pd.Series([th] * len(ids), dtype="int32"),
                    "thumb": pd.Series(thumbs, dtype="object"),
                    "thumb_md5": pd.Series(
                        [hashlib.md5(t).hexdigest() if t is not None else None for t in thumbs],
                        dtype="object",
                    ),
                    "thumb_n_bytes": pd.Series(
                        [len(t) if t is not None else None for t in thumbs], dtype="object"
                    ),
                    "is_stub": pd.Series(stubs, dtype="object"),
                }
            )

    # guide §4.1: ship only the columns the function reads (see
    # extract_media_features)
    return media.select("media_id", "payload").mapInPandas(resize, schema=RESIZE_SCHEMA)
