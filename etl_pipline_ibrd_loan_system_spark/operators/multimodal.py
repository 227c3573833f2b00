"""Multimodal (image/audio/video) column handling.

Media travel as opaque `binary` payloads + a typed metadata struct —
the only sane representation at 100 TB (payloads never deserialize in
the JVM; Tungsten moves byte arrays, Arrow hands them to Python in
columnar batches). Operators:

- MEDIA_META / with_media          schema contract + deterministic synth
- resize_meta                      pure-column metadata rewrite (no UDF)
- frame_sample                     explode(sequence) frame index sampling
- decode_media (mapInPandas)       Arrow-batched Python decode path
- extract_features (mapInPandas)   strided byte-histogram features

The actual pixel/sample decode is STUBBED: real codecs (PIL/ffmpeg/
torchaudio) are not in this container. `decode_media` tries to import
PIL and falls back to a clearly-marked deterministic fake that computes
real byte-level statistics from the actual binary payload — so the
Spark-side plumbing (schema, Arrow batch shape, partition streaming,
UDF signature) is fully real and oracle-checkable, while the codec call
is one function swap away.

Scale notes: mapInPandas streams Arrow batches per partition
(`spark.sql.execution.arrow.maxRecordsPerBatch` bounds peak memory —
size it so batch_rows x max_payload fits the executor); payload columns
are pruned before any wide shuffle; frame_sample multiplies rows by
<= max_frames so repartition after it, not before.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

if TYPE_CHECKING:  # pragma: no cover
    import pandas as pd

MEDIA_META = "struct<fmt:string,width:int,height:int,n_frames:int,sample_rate:int>"

DECODED_SCHEMA = (
    "media_id bigint, fmt string, n_bytes bigint, byte_sum bigint, "
    "width int, height int"
)

FEATURE_DIM = 16
FEATURES_SCHEMA = f"media_id bigint, feature array<double>"


def with_media(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Deterministic synthetic media rows from a text corpus: payload =
    utf-8 bytes of the text (a real pipeline reads files/blob store);
    metadata derived from stable row facts. Keeps every downstream
    operator testable without binary fixtures."""
    n = F.length(F.col(text_col))
    return df.select(
        F.col(id_col).alias("media_id"),
        F.encode(F.col(text_col), "UTF-8").alias("data"),
        F.struct(
            F.when(n % 3 == 0, "png").when(n % 3 == 1, "wav").otherwise("mp4").alias("fmt"),
            (16 + n % 64).cast("int").alias("width"),
            (16 + n % 48).cast("int").alias("height"),
            (1 + n % 30).cast("int").alias("n_frames"),
            F.lit(16000).alias("sample_rate"),
        ).alias("meta"),
    )


def resize_meta(df: DataFrame, max_w: int, max_h: int) -> DataFrame:
    """Clamp target dimensions, preserving aspect ratio intent — a pure
    struct rewrite (withField), no Python, no payload touch."""
    scale = F.least(
        F.lit(1.0),
        F.least(
            F.lit(max_w) / F.col("meta.width"), F.lit(max_h) / F.col("meta.height")
        ),
    )
    return df.withColumn(
        "meta",
        F.col("meta")
        .withField("width", F.floor(F.col("meta.width") * scale).cast("int"))
        .withField("height", F.floor(F.col("meta.height") * scale).cast("int")),
    )


def frame_sample(df: DataFrame, every: int = 5) -> DataFrame:
    """One row per sampled frame index (0, every, 2*every, ... <
    n_frames). Row fan-out is bounded by ceil(n_frames/every); the
    payload column is deliberately NOT carried through the explode —
    rejoin it by media_id only where a decoder actually needs it."""
    return df.select(
        "media_id",
        F.col("meta.fmt").alias("fmt"),
        F.explode(
            F.sequence(F.lit(0), F.col("meta.n_frames") - 1, F.lit(every))
        ).alias("frame_idx"),
    )


def _fake_decode(payload: bytes) -> dict:
    """STUB decoder (no codec libs in this container): returns REAL
    byte-level stats of the payload; a production build replaces this
    one function with PIL/ffmpeg and keeps every other line."""
    return {"n_bytes": len(payload), "byte_sum": sum(payload)}


def decode_media(df: DataFrame) -> DataFrame:
    """Arrow-batched decode over (media_id, data, meta). Output schema is
    fixed (DECODED_SCHEMA); batches stream per-partition so memory is
    bounded by the Arrow batch size, not partition size."""
    try:  # pragma: no cover - PIL absent by design
        import PIL  # noqa: F401

        raise NotImplementedError(
            "real image decode not wired; swap _fake_decode for PIL here"
        )
    except ImportError:
        pass

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        # inline _fake_decode: the closure must be SELF-CONTAINED — a
        # reference to a module-level function would make cloudpickle
        # import this package on executor workers, which fails when the
        # driver runs from a cwd outside the repo
        def decode(payload: bytes) -> dict:
            return {"n_bytes": len(payload), "byte_sum": sum(payload)}

        for b in batches:
            stats = [decode(bytes(p)) for p in b["data"]]
            yield pd.DataFrame(
                {
                    "media_id": b["media_id"],
                    "fmt": [m["fmt"] for m in b["meta"]],
                    "n_bytes": [s["n_bytes"] for s in stats],
                    "byte_sum": [s["byte_sum"] for s in stats],
                    "width": [m["width"] for m in b["meta"]],
                    "height": [m["height"] for m in b["meta"]],
                }
            )

    return df.mapInPandas(run, schema=DECODED_SCHEMA)


def extract_features(df: DataFrame, dim: int = FEATURE_DIM) -> DataFrame:
    """Strided byte-sum feature vector from the raw payload (vectorized
    numpy inside Arrow batches — the shape a real embedding extractor
    has: bytes in, fixed-dim float vector out, one batch at a time)."""

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd

        for b in batches:
            feats = []
            for p in b["data"]:
                a = np.frombuffer(bytes(p), dtype=np.uint8)
                feats.append(
                    [float(a[j::dim].sum()) for j in range(dim)]
                )
            yield pd.DataFrame({"media_id": b["media_id"], "feature": feats})

    return df.mapInPandas(run, schema=FEATURES_SCHEMA)
