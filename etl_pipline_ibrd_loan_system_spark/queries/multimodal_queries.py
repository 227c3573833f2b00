"""Multimodal query catalog (operators.multimodal over `documents`).

The payloads are deterministic utf-8 synth media (with_media), so even
the mapInPandas decode path is SQL-oracle-checkable: the corpus is pure
ASCII, hence byte_sum == sum of code points and n_bytes == char length —
DuckDB recomputes from text what Spark's Python workers compute from the
actual binary payload through real Arrow batches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..catalog import load_table
from ..operators import multimodal
from . import query

_META_SQL = """
    media AS (
      SELECT doc_id AS media_id,
             CASE WHEN length(text) % 3 = 0 THEN 'png'
                  WHEN length(text) % 3 = 1 THEN 'wav'
                  ELSE 'mp4' END AS fmt,
             (16 + length(text) % 64)::INT AS width,
             (16 + length(text) % 48)::INT AS height,
             (1 + length(text) % 30)::INT AS n_frames,
             text
      FROM documents
    )
"""


@query(
    "mm1_media_catalog",
    sql=f"""
    WITH {_META_SQL}
    SELECT media_id, fmt, width, height, n_frames,
           length(text)::BIGINT AS n_bytes
    FROM media
    """,
)
def mm1_media_catalog(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    docs = load_table(spark, sf_dir, "documents")
    m = multimodal.with_media(docs, "text", "doc_id")
    return m.select(
        "media_id",
        F.col("meta.fmt").alias("fmt"),
        F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"),
        F.col("meta.n_frames").alias("n_frames"),
        F.octet_length("data").cast("bigint").alias("n_bytes"),
    )


@query(
    "mm2_decode_stats",
    sql=f"""
    WITH {_META_SQL}
    SELECT media_id, fmt,
           length(text)::BIGINT AS n_bytes,
           list_sum(list_transform(string_split(text, ''), c -> ascii(c)))::BIGINT
             AS byte_sum,
           width, height
    FROM media
    """,
)
def mm2_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exercises the real mapInPandas decode path (Arrow batches, binary
    payload in Python) — the oracle recomputes the same stats from text."""
    docs = load_table(spark, sf_dir, "documents")
    return multimodal.decode_media(multimodal.with_media(docs, "text", "doc_id"))


@query(
    "mm3_frame_sample",
    sql=f"""
    WITH {_META_SQL}
    SELECT media_id, fmt, unnest(range(0, n_frames, 5))::BIGINT AS frame_idx
    FROM media
    """,
)
def mm3_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    docs = load_table(spark, sf_dir, "documents")
    m = multimodal.with_media(docs, "text", "doc_id")
    out = multimodal.frame_sample(m, every=5)
    return out.select("media_id", "fmt", F.col("frame_idx").cast("bigint").alias("frame_idx"))


def _features_sql(dim: int = 16) -> str:
    comps = ", ".join(
        f"list_sum(list_transform(range({1 + j}, length(text) + 1, {dim}), "
        f"i -> ascii(text[i])))::DOUBLE" for j in range(dim)
    )
    return f"""
    WITH feats AS (
      SELECT doc_id AS media_id, [{comps}] AS feature FROM documents
    )
    SELECT media_id,
           CAST(generate_subscripts(feature, 1) - 1 AS BIGINT) AS dim_idx,
           unnest(feature) AS value
    FROM feats
    """


@query("mm4_byte_features", sql=_features_sql())
def mm4_byte_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strided byte features via vectorized numpy in mapInPandas; oracle
    recomputes each stride sum from text code points. Reshaped to one
    (media_id, dim_idx, value) row per vector component — the driver's
    canonicalizer cannot sort array cells, so the registered surface is
    scalar-only (extract_features still returns the vector column)."""
    from pyspark.sql import functions as F

    docs = load_table(spark, sf_dir, "documents")
    out = multimodal.extract_features(
        multimodal.with_media(docs, "text", "doc_id"), dim=16
    )
    return out.select("media_id", F.posexplode("feature")).select(
        "media_id",
        F.col("pos").cast("bigint").alias("dim_idx"),
        F.col("col").alias("value"),
    )


@query(
    "mm5_resize_meta",
    sql=f"""
    WITH {_META_SQL}
    SELECT media_id,
           floor(width * least(1.0, least(32.0 / width, 32.0 / height)))::INT
             AS new_width,
           floor(height * least(1.0, least(32.0 / width, 32.0 / height)))::INT
             AS new_height
    FROM media
    """,
)
def mm5_resize_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    docs = load_table(spark, sf_dir, "documents")
    m = multimodal.resize_meta(
        multimodal.with_media(docs, "text", "doc_id"), max_w=32, max_h=32
    )
    return m.select(
        "media_id",
        F.col("meta.width").alias("new_width"),
        F.col("meta.height").alias("new_height"),
    )


def _mm6_sql(dim: int = 16, q: float = 0.05) -> str:
    comps = ", ".join(
        f"list_sum(list_transform(range({1 + j}, length(text) + 1, {dim}), "
        f"i -> ascii(text[i])))::DOUBLE" for j in range(dim)
    )
    rng = f"range(1, {dim + 1})"
    return f"""
    WITH feats AS (
      SELECT doc_id AS media_id, source, [{comps}] AS v FROM documents
    ), n AS (
      SELECT media_id, source,
             list_transform(v, x ->
               x / sqrt(list_sum(list_transform(v, y -> y * y)))) AS u
      FROM feats
    ), base AS (
      SELECT media_id, source, u,
             CAST(floor(u[1] / {q}) AS BIGINT) AS band
      FROM n
    )
    SELECT * FROM (
      SELECT a.media_id AS id_a, b.media_id AS id_b,
             list_sum(list_transform({rng}, i -> a.u[i] * b.u[i])) AS cos_sim
      FROM (SELECT media_id, source, u,
                   unnest([band - 1, band, band + 1]) AS band_a
            FROM base) a
      JOIN base b
        ON a.source = b.source AND a.band_a = b.band
       AND a.media_id < b.media_id
    ) WHERE cos_sim >= 0.999
    """


@query("mm6_media_neardup", sql=_mm6_sql())
def mm6_media_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate MEDIA detection: the multimodal byte-feature
    extractor (Arrow mapInPandas, mm4's vectorized kernel) feeds the
    dedup family's normalized banded-cosine pair search — the
    composition a real pipeline runs to dedup images before training.
    Blocked by source (the upload-origin prior) x quantized leading
    unit-component (recall-preserving at this threshold:
    dedup.normalized_banded_pairs); vectors normalize once per row so
    the per-pair test is a single dot product."""
    from pyspark.sql import functions as F

    from ..operators import dedup

    docs = load_table(spark, sf_dir, "documents")
    feats = multimodal.extract_features(
        multimodal.with_media(docs, "text", "doc_id"), dim=16
    )
    blocked = feats.join(
        docs.select(F.col("doc_id").alias("media_id"), "source"), "media_id"
    )
    # the pair search references `blocked` twice (a x b self-join): pin
    # so the Arrow decode/extract runs ONCE per row, not once per side —
    # same diamond-DAG rule as the dedup shingle pipeline (SCALE.md);
    # released at the next registry query (cache.py, ADVICE r5)
    from ..cache import pin

    blocked = pin(blocked)
    return dedup.normalized_banded_pairs(
        blocked, "media_id", "feature", block_col="source", threshold=0.999
    )


def _mm7_sql() -> str:
    """Analytic replay of the REAL AVI walk + JPEG frame decode: the
    synthetic payloads' frame dims/count are pure functions of
    (doc_id, length(text)), and synthetic_jpeg's byte sum is affine in
    the dims (sum = base + w + h for dims < 256, which 16+63+2 max
    guarantees), so DuckDB predicts every frame row the container parse
    emits. The constants come from the module builder at registration
    time — any drift between the executor-side builder closure and
    synthetic_jpeg/the decoder fails this hash."""
    base = multimodal.synthetic_jpeg(0, 0)
    return f"""
    WITH sel AS (
      SELECT doc_id, length(text) AS n FROM documents WHERE doc_id % 7 = 0
    ),
    fr AS (
      SELECT doc_id, n, unnest(range(0, doc_id % 3 + 1)) AS k FROM sel
    )
    SELECT doc_id AS media_id, k::INT AS frame_idx,
           (16 + n % 64 + k)::INT AS width,
           (16 + n % 48)::INT AS height,
           {len(base)}::BIGINT AS frame_bytes,
           ({sum(base)} + (16 + n % 64 + k) + (16 + n % 48))::BIGINT
             AS frame_byte_sum
    FROM fr WHERE k % 2 = 0
    """


@query("mm7_video_frame_extract", sql=_mm7_sql())
def mm7_video_frame_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL video frame sampling end-to-end (r7): deterministic MJPEG-AVI
    payloads built executor-side (with_synthetic_video), then
    extract_video_frames walks each container's movi chunk list and
    reads every SAMPLED frame's dims from its own JPEG SOF header —
    the full binary path (build -> Arrow batch -> RIFF walk -> marker
    parse) runs for real; only the analytic expectation is SQL. Zero
    shuffle: one mapInPandas chain, payloads never leave their task."""
    from pyspark.sql import functions as F

    docs = load_table(spark, sf_dir, "documents")
    vids = multimodal.with_synthetic_video(
        docs.where(F.col("doc_id") % 7 == 0), "text", "doc_id"
    )
    return multimodal.extract_video_frames(vids, every=2)
