"""Python UDTF surface (Spark 4 user-defined table functions).

One query demonstrates the remaining Python-extension API the engine
hadn't exercised: a `@udtf` table function lateral-joined per input
row, Arrow-optimized. The SEMANTICS (fixed-width character chunking
with overlap) deliberately mirror what built-ins can express — the
oracle is plain SQL over generate_series — because the point is the
API plumbing: registration, LATERAL correlation, arrow batch
transfer, and the planner treating the UDTF as a row-multiplying
generator.

Production guidance stays what COVERAGE.md §2.I says: chunking at
100 TB runs on the JVM path (operators/textprep.py::chunk_by_tokens,
oracle tx10 — sequence+explode, whole-stage codegen). A Python UDTF
is the escape hatch for generator logic built-ins can't express;
this file proves the hatch opens.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from . import query

CHUNK = 64
STRIDE = 48


@query(
    "u1_char_chunks_udtf",
    sql=f"""
    WITH idx AS (
      SELECT doc_id, text,
             unnest(range(0, (length(text) - 1) // {STRIDE} + 1)) AS i
      FROM documents WHERE length(text) > 0
    )
    SELECT doc_id, CAST(i AS BIGINT) AS chunk_id,
           substr(text, CAST(i * {STRIDE} + 1 AS INT), {CHUNK}) AS chunk_text
    FROM idx
    """,
)
def u1_char_chunks_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping fixed-width character chunks via a lateral-joined
    Python UDTF (`eval` yields one row per chunk). Arrow-optimized so
    rows cross the Python boundary in columnar batches, and the chunker
    is stateless per row — each task runs its partition independently,
    so the operator scales exactly like the explode it mirrors (modulo
    the Python-worker tax the docstring above warns about)."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="chunk_id: bigint, chunk_text: string", useArrow=True)
    class CharChunker:
        def eval(self, text: str):
            if not text:
                return
            for i, s in enumerate(range(0, len(text), STRIDE)):
                yield i, text[s : s + CHUNK]

    spark.udtf.register("u1_char_chunker", CharChunker)
    load_table(spark, sf_dir, "documents").createOrReplaceTempView("u1_documents")
    return spark.sql(
        """
        SELECT d.doc_id, c.chunk_id, c.chunk_text
        FROM u1_documents d, LATERAL u1_char_chunker(d.text) c
        """
    )


# --- u5: Spark 4 VARIANT shredding -----------------------------------------


@query(
    "u5_variant_shred",
    sql="""
    SELECT k_val,
           COUNT(*)::BIGINT AS n_events,
           CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
             AS BIGINT) AS n_errors
    FROM (
      SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val,
             event_type
      FROM events
    )
    GROUP BY k_val
    """,
)
def u5_variant_shred(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured ingestion through Spark 4's VARIANT type:
    events.props is parsed ONCE into a variant column (parse_json —
    binary-encoded, no per-access re-parse, the open-format twin of
    Delta/Iceberg variant shredding) and fields are extracted with
    typed variant_get paths. Same answer as core.py's
    get_json_object path (the pre-variant API) — the point here is
    the type: a variant column carries heterogeneous per-row schemas
    without string re-parsing, and the typed extraction stays a
    scan-level projection feeding an ordinary aggregate. The oracle
    shreds the identical JSON with DuckDB's native extraction."""
    from pyspark.sql import functions as F

    ev = load_table(spark, sf_dir, "events")
    shredded = ev.select(
        F.parse_json("props").alias("v"), "event_type"
    ).select(
        F.expr("variant_get(v, '$.k', 'bigint')").alias("k_val"),
        "event_type",
    )
    return shredded.groupBy("k_val").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0))
        .cast("bigint")
        .alias("n_errors"),
    )


# --- u6: fixed-width flat-file parse ---------------------------------------
#
# Layout (the SSIS flat-file connection-manager column spec, stated
# as (start, width) 1-based):
#   order_id   1..10   right-padded digits
#   status    11..11   1 char
#   priority  12..26   15 chars, right-padded
#   amount    27..38   12 chars, zero-padded cents
#   odate     39..48   yyyy-MM-dd


@query(
    "u6_fixed_width_parse",
    sql="""
    WITH lines AS (
      SELECT lpad(CAST(o_orderkey AS VARCHAR), 10, ' ')
             || o_orderstatus
             || rpad(o_orderpriority, 15, ' ')
             || lpad(CAST(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100
                          AS BIGINT) AS VARCHAR), 12, '0')
             || strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS line
      FROM orders
    )
    SELECT CAST(trim(substring(line, 1, 10)) AS BIGINT) AS order_id,
           substring(line, 11, 1) AS status,
           trim(substring(line, 12, 15)) AS priority,
           CAST(substring(line, 27, 12) AS BIGINT) AS amount_cents,
           substring(line, 39, 10) AS odate
    FROM lines
    """,
)
def u6_fixed_width_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width flat-file parsing — the SSIS flat-file connection
    manager's other format (the reference's toolchain ingests
    fixed-width exports routinely; our CSV dict reader covers the
    delimited case). The fixture RENDERS orders into 48-char records
    under a stated (start, width) layout — left-padded key,
    zero-padded cents, ISO date — then parses them back with pure
    substring/trim/cast projections; the oracle does both sides
    identically, so the round-trip identity (every parsed row equals
    its source row) is what the hash compare proves. On real files
    the render half drops away and `spark.read.text` feeds the same
    parse projection.

    Scale shape: render and parse are both zero-shuffle whole-stage
    codegen projections — fixed-width beats regex precisely because
    the column spec IS the plan."""
    orders = load_table(spark, sf_dir, "orders")
    line = F.concat(
        F.lpad(F.col("o_orderkey").cast("string"), 10, " "),
        F.col("o_orderstatus"),
        F.rpad(F.col("o_orderpriority"), 15, " "),
        F.lpad(
            (F.col("o_totalprice").cast("decimal(12,2)") * 100)
            .cast("bigint")
            .cast("string"),
            12,
            "0",
        ),
        F.date_format(F.col("o_orderdate").cast("date"), "yyyy-MM-dd"),
    )
    lines = orders.select(line.alias("line"))
    return lines.select(
        F.trim(F.substring("line", 1, 10)).cast("bigint").alias("order_id"),
        F.substring("line", 11, 1).alias("status"),
        F.trim(F.substring("line", 12, 15)).alias("priority"),
        F.substring("line", 27, 12).cast("bigint").alias("amount_cents"),
        F.substring("line", 39, 10).alias("odate"),
    )


# --- u7: logfmt render + parse round trip ------------------------------------


@query(
    "u7_logfmt_parse",
    sql="""
    WITH rendered AS (
      SELECT 'ts=' || epoch_us(ts) || ' user=' || user_id
             || ' type=' || event_type
             || ' value_c=' || CAST(round(value * 100) AS BIGINT) AS line
      FROM events
    ), parsed AS (
      SELECT CAST(regexp_extract(line, 'user=([0-9]+)', 1) AS BIGINT)
               AS user_id,
             regexp_extract(line, 'type=([a-z_]+)', 1) AS event_type,
             CAST(regexp_extract(line, 'value_c=(-?[0-9]+)', 1) AS BIGINT)
               AS cents,
             CAST(regexp_extract(line, 'ts=([0-9]+)', 1) AS BIGINT) AS ts_us
      FROM rendered
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(SUM(cents) AS BIGINT) AS cents_total,
           CAST(MIN(ts_us) AS BIGINT) AS first_ts_us,
           CAST(MAX(ts_us) AS BIGINT) AS last_ts_us
    FROM parsed GROUP BY event_type
    """,
)
def u7_logfmt_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """logfmt ('key=value ...') parsing — the third leg of semi-structured
    ingestion next to u5's JSON shredding and u6's fixed-width: events
    render to canonical logfmt lines (the u6 render-then-parse fixture
    discipline, so the parser is exercised against lines whose ground
    truth is known), then regexp_extract pulls each field back out and
    the rollup must reproduce the original table's aggregates exactly —
    integer microseconds and cents end-to-end, no float transits the
    text round trip.

    Scale shape: render and parse are both zero-exchange codegen
    projections (the u6 shape); one event_type-grain combine ends it.
    At 100 TB the render stage drops away (real logs arrive as text)
    and the parse is a pure scan-side projection."""
    ev = load_table(spark, sf_dir, "events")
    rendered = ev.select(
        F.concat(
            F.lit("ts="),
            F.unix_micros(F.col("ts").cast("timestamp")).cast("string"),
            F.lit(" user="),
            F.col("user_id").cast("string"),
            F.lit(" type="),
            F.col("event_type"),
            F.lit(" value_c="),
            F.round(F.col("value") * 100).cast("bigint").cast("string"),
        ).alias("line")
    )
    parsed = rendered.select(
        F.regexp_extract("line", "user=([0-9]+)", 1).cast("bigint")
        .alias("user_id"),
        F.regexp_extract("line", "type=([a-z_]+)", 1).alias("event_type"),
        F.regexp_extract("line", "value_c=(-?[0-9]+)", 1).cast("bigint")
        .alias("cents"),
        F.regexp_extract("line", "ts=([0-9]+)", 1).cast("bigint")
        .alias("ts_us"),
    )
    return parsed.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.countDistinct("user_id").cast("bigint").alias("n_users"),
        F.sum("cents").cast("bigint").alias("cents_total"),
        F.min("ts_us").cast("bigint").alias("first_ts_us"),
        F.max("ts_us").cast("bigint").alias("last_ts_us"),
    )


# --- u8: permissive CSV parse with corrupt-record routing ---------------------

_U8_NUM = "^[0-9]+\\.[0-9]{2}$"


@query(
    "u8_csv_recovery",
    sql=f"""
    WITH rendered AS (
      SELECT CASE
               WHEN o_orderkey % 23 = 7
                 THEN o_orderkey || ',' || o_orderstatus        -- arity 2
               WHEN o_orderkey % 31 = 11
                 THEN o_orderkey || ',' || o_orderstatus || ',N/A'
               ELSE o_orderkey || ',' || o_orderstatus || ','
                    || CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS VARCHAR)
             END AS line
      FROM orders
    ), parsed AS (
      SELECT line, string_split(line, ',') AS f,
             len(string_split(line, ',')) AS arity
      FROM rendered
    ), routed AS (
      SELECT CASE
               WHEN arity != 3 THEN '_corrupt_arity'
               WHEN NOT regexp_matches(f[3], '{_U8_NUM}')
                 THEN '_corrupt_value'
               ELSE f[2] END AS route,
             CASE WHEN arity = 3 AND regexp_matches(f[3], '{_U8_NUM}')
                  THEN CAST(CAST(f[3] AS DECIMAL(12,2)) * 100 AS BIGINT)
                  ELSE 0 END AS cents
      FROM parsed
    )
    SELECT route, CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(cents) AS BIGINT) AS cents_total
    FROM routed GROUP BY route
    """,
)
def u8_csv_recovery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Permissive CSV ingestion with corrupt-record ROUTING — the
    dirty-feed reality the reference's clean API never faces but every
    file drop does: orders render to CSV lines with two planted defect
    classes (truncated arity for orderkey % 23 = 7, non-numeric amount
    for % 31 = 11 — the u6/u7 render-then-parse fixture discipline),
    and the parser routes each line to its status partition or to a
    _corrupt_arity / _corrupt_value side channel with exact cent
    totals for the good rows — the SSIS error-output semantics
    (star.py's NoMatchBehavior precedent) applied to the parse stage,
    and what spark.read.csv's PERMISSIVE + columnNameOfCorruptRecord
    mode does, here as explicit expressions both engines replay.

    Scale shape: render and parse are zero-exchange codegen
    projections; one route-grain combine (|status|+2 groups) ends it."""
    orders = load_table(spark, sf_dir, "orders")
    price_str = F.col("o_totalprice").cast("decimal(12,2)").cast("string")
    rendered = orders.select(
        F.when(
            F.col("o_orderkey") % 23 == 7,
            F.concat_ws(",", F.col("o_orderkey").cast("string"),
                        F.col("o_orderstatus")),
        )
        .when(
            F.col("o_orderkey") % 31 == 11,
            F.concat_ws(",", F.col("o_orderkey").cast("string"),
                        F.col("o_orderstatus"), F.lit("N/A")),
        )
        .otherwise(
            F.concat_ws(",", F.col("o_orderkey").cast("string"),
                        F.col("o_orderstatus"), price_str)
        )
        .alias("line")
    )
    parsed = rendered.select(
        F.split("line", ",").alias("f"),
        F.size(F.split("line", ",")).alias("arity"),
    )
    ok_num = F.element_at("f", 3).rlike(_U8_NUM)
    routed = parsed.select(
        F.when(F.col("arity") != 3, "_corrupt_arity")
        .when(~ok_num, "_corrupt_value")
        .otherwise(F.element_at("f", 2))
        .alias("route"),
        F.when(
            (F.col("arity") == 3) & ok_num,
            (F.element_at("f", 3).cast("decimal(12,2)") * 100).cast("bigint"),
        )
        .otherwise(F.lit(0).cast("bigint"))
        .alias("cents"),
    )
    return routed.groupBy("route").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.sum("cents").cast("bigint").alias("cents_total"),
    )
