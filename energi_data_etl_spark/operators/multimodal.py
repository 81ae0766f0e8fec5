"""Multimodal-column plumbing (SURVEY.md §2.10 L5; north star:
"multimodal columns" at 100 TB).

Pattern: media travel as opaque ``binary`` columns with a typed
metadata struct alongside; decode / feature-extract / resize /
frame-sample run as Arrow-batched pandas functions over
``mapInPandas`` — the batch boundary (not per-row Python) is what makes
Python viable at scale, and the schema contract is what keeps the
lakehouse queryable.

The image/audio codec libraries are NOT in this container, so the
decode kernel is a clearly-marked STUB (deterministic fake) behind the
real Spark plumbing: schema, Arrow batching, partitioning, and UDF
signatures are production-shaped and tested; swap `_decode_stub` for a
real PIL/ffmpeg call on a cluster that has them.
"""

from __future__ import annotations

from collections.abc import Iterator

import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql import types as T

__all__ = [
    "attach_payload",
    "PAYLOAD_META_SCHEMA",
    "decode_features",
    "frame_sample",
    "resize_stub",
    "has_image_codec",
]

#: Typed metadata carried next to every binary payload.
PAYLOAD_META_SCHEMA = T.StructType(
    [
        T.StructField("n_bytes", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("checksum", T.StringType()),
    ]
)


def attach_payload(df: DataFrame, source_col: str = "text", media_type: str = "application/octet-stream") -> DataFrame:
    """Materialize an opaque binary payload + metadata struct from a
    source column (fixtures have no real media, so the document text
    bytes stand in — the column TYPES are the contract)."""
    payload = F.encode(F.col(source_col), "UTF-8")
    return df.withColumn("payload", payload).withColumn(
        "payload_meta",
        F.struct(
            F.octet_length(payload).cast("long").alias("n_bytes"),
            F.lit(media_type).alias("media_type"),
            F.md5(F.col(source_col)).alias("checksum"),
        ),
    )


FEATURES_SCHEMA = "doc_id long, n_bytes long, mean_byte double, feature_dim int, features array<float>"


def has_image_codec() -> bool:
    """True when a real image codec (PIL/Pillow) is importable — the
    capability gate for decode-kernel selection (VERDICT r16 item 4).
    Checked lazily so a cluster that ships Pillow gets real features
    with zero code change, while this container's stub path stays the
    certified default."""
    try:
        import PIL.Image  # noqa: F401

        return True
    except ImportError:
        return False


def _decode_real(payload: bytes, dim: int) -> list[float]:
    """Real decode kernel, selected when Pillow is importable: decode
    the payload as an image, grayscale, nearest-resize to a dim×1 strip,
    emit the normalized pixel row. Non-image payloads (the fixtures
    carry text bytes) fall back PER PAYLOAD to the deterministic stub —
    a mixed corpus degrades row-by-row instead of aborting the batch."""
    import io

    import PIL.Image

    try:
        with PIL.Image.open(io.BytesIO(payload)) as img:
            strip = img.convert("L").resize((dim, 1), PIL.Image.NEAREST)
            return [float(p) / 255.0 for p in strip.getdata()]
    except Exception:  # noqa: BLE001 — undecodable bytes: not an image
        return _decode_stub(payload, dim)


def _select_decode_kernel(kernel: str | None):
    """'stub' | 'real' | None (auto: real iff the codec is importable).
    The @query surface pins 'stub' — the certified deterministic path —
    so oracle replays cannot diverge on a codec-bearing cluster."""
    if kernel is None:
        kernel = "real" if has_image_codec() else "stub"
    if kernel == "stub":
        return _decode_stub
    if kernel == "real":
        if not has_image_codec():
            raise ImportError("decode kernel 'real' requires Pillow (PIL.Image)")
        return _decode_real
    raise ValueError(f"kernel must be 'stub' | 'real' | None, got {kernel!r}")


def _decode_stub(payload: bytes, dim: int) -> list[float]:
    """STUB decode kernel — deterministic fake 'pixel features'.

    A real deployment replaces this with e.g. PIL.Image.open +
    resize + channel means; the container has no codec libs
    (NotImplementedError would abort the demo pipeline, so the fake is
    computed from the bytes themselves and fully deterministic).
    """
    if not payload:
        return [0.0] * dim
    step = max(1, len(payload) // dim)
    return [float(payload[min(i * step, len(payload) - 1)]) / 255.0 for i in range(dim)]


def decode_features(df: DataFrame, dim: int = 8, kernel: str | None = None) -> DataFrame:
    """Arrow-batched decode → feature vectors via mapInPandas.

    Each pandas batch decodes payloads vectorized-ish in Python; at
    scale this parallelizes per input partition with zero shuffle.

    ``kernel``: 'stub' (deterministic fake — the certified path),
    'real' (Pillow decode, per-payload stub fallback for non-image
    bytes), or None to auto-select 'real' whenever Pillow is
    importable. The kernel is RESOLVED on the driver so a misconfigured
    cluster fails at plan build, not per-task."""
    import pandas as pd  # local import: executors need it, driver import cheap

    decode = _select_decode_kernel(kernel)

    def decode_batches(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": payloads.map(len),
                    "mean_byte": payloads.map(lambda b: float(sum(b)) / len(b) if len(b) else 0.0),
                    "feature_dim": dim,
                    "features": payloads.map(lambda b: decode(b, dim)),
                }
            )

    return df.select("doc_id", "payload").mapInPandas(decode_batches, FEATURES_SCHEMA)


def frame_sample(df: DataFrame, n_frames: int = 4, frame_bytes: int = 16) -> DataFrame:
    """'Video' frame sampling plumbing: slice the payload into n evenly
    spaced binary frames (array<binary>) — pure JVM expression, the
    shape a real keyframe sampler would produce."""
    total = F.octet_length("payload")
    idx = F.sequence(F.lit(0), F.lit(n_frames - 1))
    frames = F.transform(
        idx,
        lambda i: F.substring(
            F.col("payload"), (i * F.greatest((total - frame_bytes) / F.lit(max(n_frames - 1, 1)), F.lit(0))).cast("int") + 1, frame_bytes
        ),
    )
    return df.withColumn("frames", frames).withColumn("n_frames", F.size("frames"))


def resize_stub(df: DataFrame, factor: int = 4) -> DataFrame:
    """'Image resize' plumbing: nearest-neighbor downsample over the
    raw byte grid — every `factor`-th byte of the payload, as an
    array<binary> of 1-byte samples plus the out-size accounting. The
    Spark side of a real resize is exactly this shape (binary in,
    smaller binary out, size metadata maintained); a production decode
    would swap the byte-stride kernel for PIL/libvips at the Arrow
    boundary (mapInPandas) — deliberately stubbed deterministic here
    because no image codec ships in this environment. Pure JVM
    expression: no Python, no shuffle."""
    total = F.octet_length("payload")
    n_out = F.ceil(total / F.lit(float(factor))).cast("int")
    idx = F.sequence(F.lit(0), F.greatest(n_out - 1, F.lit(0)))
    resized = F.transform(idx, lambda i: F.substring(F.col("payload"), i * factor + 1, 1))
    return (
        df.withColumn("in_bytes", total.cast("bigint"))
        .withColumn("resized_frames", resized)
        .withColumn("out_bytes", F.size("resized_frames").cast("bigint"))
    )
