"""Multimodal (binary-payload) column plumbing.

North-star extension: image/audio/video content modeled as opaque
``binary`` columns plus a typed metadata struct. The Spark-side plumbing —
schema, partition-friendly layout, Arrow-batched UDF signatures — is real
and tested; the actual media decoding is STUBBED (codec libraries are not
in this container) behind ``decode_stub``/``fake_features``: a
deterministic byte-level featurizer with the exact shape a real decoder
would have (mapInPandas over an iterator of record batches).
"""

from __future__ import annotations

import re
from collections.abc import Iterator

from pyspark.sql import DataFrame, functions as F
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
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("n_bytes", T.LongType(), True),
                ]
            ),
            True,
        ),
    ]
)


def documents_as_media(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Build a media-shaped table from the documents fixture: utf-8 bytes
    as the opaque payload + typed metadata. Stands in for real image/audio
    ingestion so the binary-column path is exercised end-to-end."""
    payload = F.encode(F.col("text"), "UTF-8")
    return df.select(
        F.col(id_col).alias("media_id"),
        payload.alias("payload"),
        F.struct(
            F.lit("text/plain").alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.octet_length(payload).cast("long").alias("n_bytes"),
        ).alias("meta"),
    )


def decode_stub(payload: bytes) -> bytes:
    """Placeholder for a real media decode (PIL/ffmpeg et al are not in
    this container). Raises so callers cannot silently ship the stub."""
    raise NotImplementedError(
        "media decode requires codec libraries absent from this environment; "
        "use fake_features() for pipeline plumbing tests"
    )


FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("byte_entropy", T.DoubleType(), True),
        T.StructField("histogram16", T.ArrayType(T.DoubleType()), True),
    ]
)


def fake_features(media: DataFrame) -> DataFrame:
    """Deterministic byte-level 'feature extraction' via mapInPandas —
    the exact plumbing (Arrow batch iterator in, typed batches out,
    no driver involvement) a real decoder/featurizer plugs into."""
    import numpy as np
    import pandas as pd

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None:
                    out.append((mid, None, None, None))
                    continue
                arr = np.frombuffer(payload, dtype=np.uint8)
                hist = np.bincount(arr >> 4, minlength=16).astype(np.float64)
                p = hist / max(arr.size, 1)
                nz = p[p > 0]
                entropy = float(-(nz * np.log2(nz)).sum())
                out.append((mid, int(arr.size), round(entropy, 6), list(p)))
            yield pd.DataFrame(
                out, columns=["media_id", "n_bytes", "byte_entropy", "histogram16"]
            )

    return media.select("media_id", "payload").mapInPandas(
        extract, schema=FEATURE_SCHEMA
    )


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("frame", T.BinaryType(), True),
        T.StructField("n_bytes", T.LongType(), True),
    ]
)


def frame_sample(
    media: DataFrame, frame_size: int = 256, stride: int = 1024
) -> DataFrame:
    """Frame sampling plumbing: cut each payload into fixed-size byte
    windows every ``stride`` bytes — the exact mapInPandas shape (Arrow
    batches in, one row per sampled frame out) a real video frame sampler
    plugs into, with deterministic byte windows standing in for decoded
    frames (codecs absent from this container)."""
    import pandas as pd

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None:
                    continue
                for i, off in enumerate(range(0, len(payload), stride)):
                    frame = bytes(payload[off : off + frame_size])
                    out.append((mid, i, frame, len(frame)))
            yield pd.DataFrame(
                out, columns=["media_id", "frame_idx", "frame", "n_bytes"]
            )

    return media.select("media_id", "payload").mapInPandas(
        sample, schema=FRAME_SCHEMA
    )


def resize_meta(media: DataFrame, width: int, height: int) -> DataFrame:
    """Resize plumbing: rewrites the typed metadata (target dimensions)
    and passes the payload through — the pixel transform itself is
    ``decode_stub`` territory (raises; codecs absent). Keeps the schema
    contract a real resizer would satisfy."""
    return media.withColumn(
        "meta",
        F.struct(
            F.col("meta.mime").alias("mime"),
            F.lit(width).alias("width"),
            F.lit(height).alias("height"),
            F.col("meta.n_bytes").alias("n_bytes"),
        ),
    )


def frame_signal(
    df: DataFrame,
    frame_bytes: int,
    hop_bytes: int,
    payload_col: str = "payload",
    id_col: str = "media_id",
) -> DataFrame:
    """Fixed-window framing over a raw byte-stream payload — the audio
    path's first real transform (PCM frame extraction for feature
    windows, exactly the shape torchaudio's ``frame`` / librosa's
    ``util.frame`` applies before any DSP): one row per
    (media, frame_idx) holding the frame's byte offset, its bytes, and
    an engine-portable fingerprint (md5 of the uppercase hex of the
    frame). Trailing bytes shorter than a full frame are dropped, as
    frame-based DSP does. (Contrast ``frame_sample``: that is the VIDEO
    shape — disjoint stride sampling, partial tail kept, Arrow-batched
    UDF; this is the AUDIO shape — overlapping hop windows, tail
    dropped, pure JVM.)

    The byte-slicing is JVM-only (``sequence`` of offsets ->
    ``substr`` on the binary -> ``explode``): no Python touches the
    payload, so a 100 TB audio corpus frames inside scan codegen with
    the payload column read ONCE. Decode (codec) stays behind
    decode_stub — framing raw bytes needs none."""
    if frame_bytes < 1 or hop_bytes < 1:
        raise ValueError(
            f"frame_bytes/hop_bytes must be >= 1: {frame_bytes}/{hop_bytes}"
        )
    n = F.octet_length(F.col(payload_col))
    starts = F.when(
        n >= frame_bytes,
        F.sequence(
            F.lit(1), n - frame_bytes + 1, F.lit(hop_bytes)
        ),
    ).otherwise(F.array().cast("array<int>"))
    frame = F.substr(
        F.col(payload_col), F.col("__start"), F.lit(frame_bytes)
    )
    return (
        df.select(
            F.col(id_col),
            F.col(payload_col),
            F.posexplode(starts).alias("frame_idx", "__start"),
        )
        .select(
            F.col(id_col),
            F.col("frame_idx"),
            (F.col("__start") - 1).alias("byte_offset"),
            frame.alias("frame"),
            F.md5(F.encode(F.hex(frame), "UTF-8")).alias("frame_fp"),
        )
    )


def perceptual_fingerprint(
    media: DataFrame,
    n_blocks: int = 64,
    payload_col: str = "payload",
    id_col: str = "media_id",
) -> DataFrame:
    """Codec-free perceptual fingerprint: blockwise byte SimHash
    (blockhash.org's shape applied to raw bytes). Each payload splits
    into ``n_blocks`` equal-width byte blocks — JVM ``sequence`` +
    ``substr``, the payload column read once, same plumbing as
    :func:`frame_signal` — each block tokens as
    ``xxhash64(block_idx, block_bytes)``, and the shared SimHash
    bit-majority fold (``dedup.simhash_fold``) collapses the tokens to
    one 64-bit fingerprint. A LOCALIZED edit (re-encode jitter, a
    changed region, metadata rewrite) flips ~1 of ``n_blocks`` tokens
    -> a few fingerprint bits, so near-identical payloads sit within a
    small Hamming radius; byte-exact dedup sees them as distinct.

    Honest boundary, stated loudly: blocks are POSITIONAL, so a byte
    INSERTION shifts every later block (fine for fixed-layout rasters
    and PCM, weak for containers that re-mux). When codec libraries
    exist, a decoded-pixel/spectrogram featurizer replaces the block
    tokenizer and the fold, banding, and clustering below are reused
    unchanged.

    Returns (id, n_bytes, fingerprint long)."""
    if n_blocks < 1:
        raise ValueError(f"n_blocks must be >= 1: {n_blocks}")
    n = F.octet_length(F.col(payload_col))
    width = F.greatest(F.lit(1), F.ceil(n / n_blocks)).cast("int")
    starts = F.when(n > 0, F.sequence(F.lit(1), n, width)).otherwise(
        F.array().cast("array<int>")
    )
    # two-parameter transform lambda: (element, index) — the index is
    # WANTED here (positional block tokens), unlike the loop-var trap
    # this codebase pins tests against.
    tokens = F.transform(
        starts,
        lambda s, i: F.xxhash64(
            i, F.substr(F.col(payload_col), s, width)
        ),
    )
    from spark_iceberg_schema_evolution_spark.operators.dedup import (
        simhash_fold,
    )

    fold = simhash_fold(64)
    return media.select(
        F.col(id_col),
        n.cast("long").alias("n_bytes"),
        fold(tokens).alias("fingerprint"),
    )


def media_near_dup_pairs(
    media: DataFrame,
    n_blocks: int = 64,
    max_hamming: int = 7,
    payload_col: str = "payload",
    id_col: str = "media_id",
    max_bucket_size: int = 1000,
    return_drop_stats: bool = False,
):
    """Visual/byte near-duplicate candidate pairs over the codec-free
    fingerprint, feeding the same downstream machinery as text
    near-dedup (``dedup.connected_components`` clusters the pairs; an
    anti-join keeps one representative).

    Banding, not all-pairs: the 64-bit fingerprint splits into 8
    disjoint 8-bit bands; two fingerprints within Hamming distance
    ``max_hamming <= 7`` MUST agree exactly on at least one band
    (pigeonhole), so candidates come from 8 band-keyed equi-joins —
    the LSH shape, never a quadratic comparison. Verification is exact:
    ``bit_count(a XOR b) <= max_hamming`` in codegen. Degenerate-band
    hot buckets (all-zero payloads, constant headers) are dropped by
    the same ``max_bucket_size`` + surfaced-drop-stats discipline as
    ``lsh_candidate_pairs``; with ``return_drop_stats=True`` returns
    ``(pairs, drops)``.

    Returns pairs (id_a, id_b, hamming) with id_a < id_b."""
    if not 0 <= max_hamming <= 7:
        raise ValueError(
            f"max_hamming must be in [0, 7] for 8-band pigeonhole "
            f"capture: {max_hamming}"
        )
    fps = perceptual_fingerprint(
        media, n_blocks=n_blocks, payload_col=payload_col, id_col=id_col
    )
    bands = fps.select(
        F.col(id_col),
        F.col("fingerprint"),
        F.posexplode(
            F.array(
                *[
                    F.shiftrightunsigned(F.col("fingerprint"), b * 8)
                    .bitwiseAND(F.lit(255))
                    for b in range(8)
                ]
            )
        ).alias("band_idx", "band_val"),
    )
    sizes = bands.groupBy("band_idx", "band_val").agg(
        F.count(F.lit(1)).alias("__n")
    )
    ok = sizes.where(F.col("__n") <= max_bucket_size)
    bands_ok = bands.join(ok, ["band_idx", "band_val"], "left_semi")
    a, b = bands_ok.alias("a"), bands_ok.alias("b")
    hamming = F.bit_count(
        F.col("a.fingerprint").bitwiseXOR(F.col("b.fingerprint"))
    )
    pairs = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .where(hamming <= max_hamming)
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            hamming.alias("hamming"),
        )
        .distinct()
    )
    if not return_drop_stats:
        return pairs
    drops = sizes.where(F.col("__n") > max_bucket_size).agg(
        F.count(F.lit(1)).alias("dropped_buckets"),
        F.coalesce(F.sum("__n"), F.lit(0)).alias("dropped_entries"),
    )
    return pairs, drops


def read_binary_media(
    spark,
    path: str,
    pattern: str = "*",
    recursive: bool = True,
) -> DataFrame:
    """Ingest a directory of media files as MEDIA_SCHEMA rows via
    Spark's built-in ``binaryFile`` source — the real on-ramp for
    image/audio corpora: each file becomes (media_id, payload, meta)
    with the id a content-independent 64-bit hash of the RELATIVE path
    (stable across warehouse moves and re-ingestion hosts), the mime
    type mapped from the extension, and byte length recorded. The
    source is distributed file ingestion: executors read the files, the
    driver sees only the listing — and ``pathGlobFilter`` prunes at
    listing time, so a selective ingest never opens non-matching files.

    Decode stays behind decode_stub (no codecs in this image); framing,
    fingerprinting, dedup, and lakehouse commits all operate on the
    opaque payload."""
    ext_mime = {
        "jpg": "image/jpeg", "jpeg": "image/jpeg", "png": "image/png",
        "gif": "image/gif", "webp": "image/webp", "bmp": "image/bmp",
        "wav": "audio/wav", "mp3": "audio/mpeg", "flac": "audio/flac",
        "ogg": "audio/ogg", "mp4": "video/mp4", "mkv": "video/x-matroska",
        "webm": "video/webm", "txt": "text/plain", "bin":
        "application/octet-stream",
    }
    mime_map = F.create_map(
        *[F.lit(x) for kv in ext_mime.items() for x in kv]
    )
    df = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", pattern)
        .option("recursiveFileLookup", str(recursive).lower())
        .load(path)
    )
    base = path.rstrip("/")
    rel = F.regexp_replace(
        F.col("path"), r"^file:.*?" + re.escape(base) + "/", ""
    )
    ext = F.lower(F.regexp_extract(F.col("path"), r"\.(\w+)$", 1))
    return df.select(
        F.xxhash64(rel).alias("media_id"),
        F.col("content").alias("payload"),
        F.struct(
            F.coalesce(
                mime_map[ext], F.lit("application/octet-stream")
            ).alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.col("length").cast("long").alias("n_bytes"),
        ).alias("meta"),
        rel.alias("source_path"),
    )
