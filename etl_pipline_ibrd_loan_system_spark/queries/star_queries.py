"""Star-schema + SCD queries (SURVEY.md §2.C C4, §2.G, §7 M3/M4).

Fixture (FIXTURES.md §C): `supplier` is the dimension source; the staging
snapshot is a deterministic mutation of it —

- s_suppkey % 10 == 0 -> s_acctbal + 100      (Type-1 "Changing" attribute)
- s_suppkey % 10 == 1 -> s_name || '_v2'      (Type-2 "Historical" attribute)
- s_suppkey % 10 == 2 -> also appears as a brand-new key (+1_000_000)

exercising all three SSIS SCD outputs (New / Changing / Historical,
`project SSIS::bor_dim.dtsx:1272-1447`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.exact import sql_dsum
from ..operators.scd import scd2_apply, scd2_init, scd_classify
from ..operators.star import build_dimension
from . import query

ASOF0 = "2024-01-01"
ASOF1 = "2024-06-01"

_FIXTURE_SQL = """
    dim0 AS (
      SELECT row_number() OVER (ORDER BY s_suppkey) AS sk,
             s_suppkey, s_name, s_acctbal, s_nationkey,
             DATE '2024-01-01' AS start_date, CAST(NULL AS DATE) AS end_date,
             TRUE AS is_current
      FROM supplier
    ),
    staging AS (
      SELECT s_suppkey,
             CASE WHEN s_suppkey % 10 = 1 THEN s_name || '_v2' ELSE s_name END AS s_name,
             CASE WHEN s_suppkey % 10 = 0 THEN s_acctbal + 100 ELSE s_acctbal END AS s_acctbal,
             s_nationkey
      FROM supplier
      UNION ALL
      SELECT s_suppkey + 1000000, 'NEW_' || s_name, s_acctbal, s_nationkey
      FROM supplier WHERE s_suppkey % 10 = 2
    ),
    classified AS (
      SELECT st.s_suppkey, st.s_name, st.s_acctbal, st.s_nationkey,
             d.sk, d.s_name AS d_name, d.s_acctbal AS d_acctbal,
             d.s_nationkey AS d_nationkey, d.start_date,
             CASE WHEN d.sk IS NULL THEN 'new'
                  WHEN st.s_name IS DISTINCT FROM d.s_name THEN 't2'
                  WHEN st.s_acctbal IS DISTINCT FROM d.s_acctbal THEN 't1'
                  ELSE 'unchanged' END AS change_type
      FROM staging st LEFT JOIN dim0 d ON st.s_suppkey = d.s_suppkey
    )
"""


def scd_fixture(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    """(initial dimension, mutated staging snapshot)."""
    sup = load_table(spark, sf_dir, "supplier")
    dim0 = scd2_init(
        sup, key="s_suppkey", attr_cols=["s_name", "s_acctbal", "s_nationkey"],
        asof=ASOF0, sk_col="sk", sk_strategy="dense",
    )
    mod10 = F.col("s_suppkey") % 10
    staging = sup.select(
        "s_suppkey",
        F.when(mod10 == 1, F.concat(F.col("s_name"), F.lit("_v2")))
        .otherwise(F.col("s_name"))
        .alias("s_name"),
        F.when(mod10 == 0, F.col("s_acctbal") + 100)
        .otherwise(F.col("s_acctbal"))
        .alias("s_acctbal"),
        "s_nationkey",
    ).unionByName(
        sup.filter(mod10 == 2).select(
            (F.col("s_suppkey") + 1000000).alias("s_suppkey"),
            F.concat(F.lit("NEW_"), F.col("s_name")).alias("s_name"),
            "s_acctbal",
            "s_nationkey",
        )
    )
    return dim0, staging


# --- C4: SCD probe join + routing decision -------------------------------


@query(
    "c4_scd_classify",
    sql=f"""
    WITH {_FIXTURE_SQL}
    SELECT change_type, COUNT(*) AS n FROM classified GROUP BY change_type
    """,
)
def c4_scd_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    dim0, staging = scd_fixture(spark, sf_dir)
    classified = scd_classify(
        dim0, staging, key="s_suppkey",
        t1_cols=["s_acctbal"], t2_cols=["s_name"], fixed_cols=["s_nationkey"],
        sk_col="sk",
    )
    return classified.groupBy("change_type").agg(F.count(F.lit(1)).alias("n"))


# --- G1: full SCD2 apply — the rebuilt dimension -------------------------


# dim1 (post-apply SCD2 state) in portable SQL, shared by the g1
# full-compare and the g2 as-of snapshot:
_DIM1_SQL = f"""
    WITH {_FIXTURE_SQL},
    maxsk AS (SELECT COUNT(*) AS m FROM dim0),
    fresh AS (
      SELECT (SELECT m FROM maxsk) + row_number() OVER (ORDER BY s_suppkey) AS sk,
             s_suppkey, s_name, s_acctbal, s_nationkey,
             DATE '2024-06-01' AS start_date, CAST(NULL AS DATE) AS end_date,
             TRUE AS is_current
      FROM classified WHERE change_type IN ('new', 't2')
    ),
    dim1 AS (
      SELECT sk, s_suppkey, d_name AS s_name, d_acctbal AS s_acctbal,
             d_nationkey AS s_nationkey, start_date,
             CAST(NULL AS DATE) AS end_date, TRUE AS is_current
      FROM classified WHERE change_type = 'unchanged'
      UNION ALL
      SELECT sk, s_suppkey, d_name, s_acctbal, d_nationkey, start_date,
             CAST(NULL AS DATE), TRUE
      FROM classified WHERE change_type = 't1'
      UNION ALL
      SELECT sk, s_suppkey, d_name, d_acctbal, d_nationkey, start_date,
             DATE '2024-06-01', FALSE
      FROM classified WHERE change_type = 't2'
      UNION ALL
      SELECT sk, s_suppkey, s_name, s_acctbal, s_nationkey, start_date,
             end_date, is_current FROM fresh
    )
"""


@query(
    "g1_scd2_apply",
    sql=f"""
    {_DIM1_SQL}
    SELECT sk, s_suppkey, s_name, s_acctbal, s_nationkey,
           CAST(start_date AS VARCHAR) AS start_date,
           CAST(end_date AS VARCHAR) AS end_date, is_current
    FROM dim1
    """,
)
def g1_scd2_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    dim0, staging = scd_fixture(spark, sf_dir)
    dim1 = scd2_apply(
        dim0, staging, key="s_suppkey",
        t1_cols=["s_acctbal"], t2_cols=["s_name"], fixed_cols=["s_nationkey"],
        asof=ASOF1, sk_col="sk", sk_strategy="dense",
    )
    # dates surfaced as ISO strings: Spark DateType and DuckDB DATE reach
    # pandas as different object types, which would break the value hash
    return dim1.withColumn(
        "start_date", F.col("start_date").cast("string")
    ).withColumn("end_date", F.col("end_date").cast("string"))


@query(
    "g2_dim_snapshot_asof",
    sql=f"""
    {_DIM1_SQL}
    SELECT sk, s_suppkey, s_name, s_acctbal, s_nationkey
    FROM dim1
    WHERE start_date <= DATE '2024-03-01'
      AND (end_date IS NULL OR end_date > DATE '2024-03-01')
    """,
)
def g2_dim_snapshot_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-travel read: the dimension as it stood between the two
    loads (2024-03-01). T2-closed versions are still in effect (their
    half-open validity ends at the second load), second-load versions
    and new keys drop out, and T1 overwrites show rewritten history —
    the exact per-column semantics SURVEY §2.G assigns each dim."""
    from ..operators.scd import scd2_snapshot

    dim0, staging = scd_fixture(spark, sf_dir)
    dim1 = scd2_apply(
        dim0, staging, key="s_suppkey",
        t1_cols=["s_acctbal"], t2_cols=["s_name"], fixed_cols=["s_nationkey"],
        asof=ASOF1, sk_col="sk", sk_strategy="dense",
    )
    return scd2_snapshot(dim1, "2024-03-01").select(
        "sk", "s_suppkey", "s_name", "s_acctbal", "s_nationkey"
    )


# --- G20: SCD2 at TIMESTAMP grain (DT_DBTIMESTAMP parity) -----------------


# Intraday as-of instants — the loan_type dim's grain (the reference
# closes/opens versions at load TIME, not load date:
# `project SSIS::loan_type_dim.dtsx:327-332`, DT_DBTIMESTAMP columns;
# our production route is plans/loan_pipeline.py DIM_DATE_TYPES).
ASOF0_TS = "2024-01-01 08:30:00"
ASOF1_TS = "2024-06-01 14:45:30"


@query(
    "g20_scd2_timestamp_grain",
    sql=f"""
    WITH {_FIXTURE_SQL},
    maxsk AS (SELECT COUNT(*) AS m FROM dim0),
    fresh AS (
      SELECT (SELECT m FROM maxsk) + row_number() OVER (ORDER BY s_suppkey) AS sk,
             s_suppkey, s_name, s_acctbal, s_nationkey,
             TIMESTAMP '{ASOF1_TS}' AS start_ts,
             CAST(NULL AS TIMESTAMP) AS end_ts, TRUE AS is_current
      FROM classified WHERE change_type IN ('new', 't2')
    ),
    dim1 AS (
      SELECT sk, s_suppkey, d_name AS s_name, d_acctbal AS s_acctbal,
             d_nationkey AS s_nationkey,
             TIMESTAMP '{ASOF0_TS}' AS start_ts,
             CAST(NULL AS TIMESTAMP) AS end_ts, TRUE AS is_current
      FROM classified WHERE change_type = 'unchanged'
      UNION ALL
      SELECT sk, s_suppkey, d_name, s_acctbal, d_nationkey,
             TIMESTAMP '{ASOF0_TS}', CAST(NULL AS TIMESTAMP), TRUE
      FROM classified WHERE change_type = 't1'
      UNION ALL
      SELECT sk, s_suppkey, d_name, d_acctbal, d_nationkey,
             TIMESTAMP '{ASOF0_TS}', TIMESTAMP '{ASOF1_TS}', FALSE
      FROM classified WHERE change_type = 't2'
      UNION ALL
      SELECT sk, s_suppkey, s_name, s_acctbal, s_nationkey,
             start_ts, end_ts, is_current FROM fresh
    )
    SELECT sk, s_suppkey, s_name, s_acctbal, s_nationkey,
           CAST(start_ts AS VARCHAR) AS start_ts,
           CAST(end_ts AS VARCHAR) AS end_ts, is_current
    FROM dim1
    """,
)
def g20_scd2_timestamp_grain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """g1's twin at TIMESTAMP grain (VERDICT r8 item 5 — the last §2.G
    parity-evidence gap): scd2_apply with date_type="timestamp" closes
    and opens versions at intraday load INSTANTS, the loan_type dim's
    DT_DBTIMESTAMP behavior (`project SSIS::loan_type_dim.dtsx:327-332`;
    production route plans/loan_pipeline.py DIM_DATE_TYPES, two-load T2
    test in tests/test_loan_pipeline.py). Same classify/rebuild plan as
    g1 — the grain changes only the literal type the open/close columns
    are cast to, which is the point: timestamp validity is not a fork
    of the engine. Timestamps surface as UTC ISO strings (session TZ is
    pinned UTC) so the cross-engine value hash is text-stable."""
    sup = load_table(spark, sf_dir, "supplier")
    dim0 = scd2_init(
        sup, key="s_suppkey", attr_cols=["s_name", "s_acctbal", "s_nationkey"],
        asof=ASOF0_TS, sk_col="sk", sk_strategy="dense",
        date_type="timestamp", start_col="start_ts", end_col="end_ts",
    )
    _, staging = scd_fixture(spark, sf_dir)
    dim1 = scd2_apply(
        dim0, staging, key="s_suppkey",
        t1_cols=["s_acctbal"], t2_cols=["s_name"], fixed_cols=["s_nationkey"],
        asof=ASOF1_TS, sk_col="sk", sk_strategy="dense",
        date_type="timestamp", start_col="start_ts", end_col="end_ts",
    )
    return dim1.withColumn(
        "start_ts", F.col("start_ts").cast("string")
    ).withColumn("end_ts", F.col("end_ts").cast("string"))


# --- M3: generic dimension build (distinct + dense surrogate key) --------


@query(
    "m3_build_dimension",
    sql="""
    SELECT row_number() OVER (ORDER BY c_mktsegment) AS segment_sk,
           c_mktsegment, 1 AS source_system_code
    FROM (SELECT DISTINCT c_mktsegment FROM customer)
    """,
)
def m3_build_dimension(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    return build_dimension(
        cust, bk_col="c_mktsegment", attr_cols=[], sk_col="segment_sk",
        sk_strategy="dense",
    )


@query(
    "g7_snapshot_table_merge",
    sql=f"""
    {_DIM1_SQL}
    SELECT s_suppkey, s_name, s_acctbal, s_nationkey,
           CAST(start_date AS VARCHAR) AS start_date,
           CAST(end_date AS VARCHAR) AS end_date, is_current
    FROM dim1
    """,
)
def g7_snapshot_table_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The g1 SCD2 load executed THROUGH the snapshot-log table format
    (sources/snaptable.py): init commit, one bucket-level copy-on-write
    merge, snapshot read back. The oracle is the same portable SCD2
    rebuild SQL as g1 minus the surrogate key (merge sks are xxhash64,
    which DuckDB cannot replay; every semantic column — key, T1/T2
    attributes, validity interval, currency flag — is value-checked).
    Proves the table-format path is row-identical to the oracle-checked
    rebuild on the driver's own fixture, not just on unit fixtures. The
    result is checkpointed before the temp table is removed."""
    import shutil
    import tempfile

    from ..sources import snaptable

    dim0, staging = scd_fixture(spark, sf_dir)
    root = tempfile.mkdtemp(prefix="g7_snaptable_")
    try:
        snaptable.create(spark, root, dim0, "s_suppkey", n_buckets=8)
        snaptable.scd2_merge(
            spark, root, staging,
            t1_cols=["s_acctbal"], t2_cols=["s_name"],
            fixed_cols=["s_nationkey"], asof=ASOF1,
        )
        return snaptable.read(spark, root).select(
            "s_suppkey", "s_name", "s_acctbal", "s_nationkey",
            F.col("start_date").cast("string").alias("start_date"),
            F.col("end_date").cast("string").alias("end_date"),
            "is_current",
        ).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)


@query(
    "g7b_merged_dim_timetravel",
    sql=f"""
    WITH {_FIXTURE_SQL}
    SELECT sk, s_suppkey, s_name, s_acctbal, s_nationkey,
           CAST(start_date AS VARCHAR) AS start_date,
           CAST(end_date AS VARCHAR) AS end_date, is_current
    FROM dim0
    """,
)
def g7b_merged_dim_timetravel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time travel THROUGH the table format (r7, VERDICT r6 item 3):
    after the SCD2 merge commit bumps CURRENT to version 2, a version-1
    read must return the initial load bit-for-bit — including the dense
    surrogate keys, which the oracle replays exactly (dim0's
    row_number), proving the merge rewrote only new files and the old
    manifest still resolves to untouched data. Complements g7 (which
    checks the POST-merge state) and the loan pipeline's
    `load_star_snaptable(version=1)` production path."""
    import shutil
    import tempfile

    from ..sources import snaptable

    dim0, staging = scd_fixture(spark, sf_dir)
    root = tempfile.mkdtemp(prefix="g7b_snaptable_")
    try:
        snaptable.create(spark, root, dim0, "s_suppkey", n_buckets=8)
        snaptable.scd2_merge(
            spark, root, staging,
            t1_cols=["s_acctbal"], t2_cols=["s_name"],
            fixed_cols=["s_nationkey"], asof=ASOF1,
        )
        assert snaptable.current_version(root) == 2
        return snaptable.read(spark, root, version=1).select(
            "sk", "s_suppkey", "s_name", "s_acctbal", "s_nationkey",
            F.col("start_date").cast("string").alias("start_date"),
            F.col("end_date").cast("string").alias("end_date"),
            "is_current",
        ).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)


@query(
    "g7c_snaptable_change_feed",
    sql=f"""
    WITH {_FIXTURE_SQL}
    SELECT s_suppkey, 'changed' AS change_kind,
           'end_date,is_current' AS changed_cols
    FROM classified WHERE change_type = 't2'
    UNION ALL
    SELECT s_suppkey, 'changed', 's_acctbal'
    FROM classified WHERE change_type = 't1'
    UNION ALL
    SELECT s_suppkey, 'added', ''
    FROM classified WHERE change_type IN ('t2', 'new')
    """,
)
def g7c_snaptable_change_feed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change-data-feed read THROUGH the table format (r7):
    snaptable.changes(v1 -> v2) after the SCD2 merge commit must emit
    exactly the change mass the merge applied — per T2 key a 'changed'
    row on the closed version (end_date,is_current) plus an 'added' row
    for the new version, per T1 key one 'changed' row (s_acctbal), per
    new key one 'added' row, NOTHING for unchanged keys (a CDF's size
    tracks change mass, not table size). The oracle derives all of it
    from the classified routing CTE; the hash surrogate keys the diff
    is keyed on are projected away (xxhash64 is not DuckDB-replayable —
    the key column and every semantic change IS value-checked)."""
    import shutil
    import tempfile

    from ..sources import snaptable

    dim0, staging = scd_fixture(spark, sf_dir)
    root = tempfile.mkdtemp(prefix="g7c_snaptable_")
    try:
        snaptable.create(spark, root, dim0, "s_suppkey", n_buckets=8)
        snaptable.scd2_merge(
            spark, root, staging,
            t1_cols=["s_acctbal"], t2_cols=["s_name"],
            fixed_cols=["s_nationkey"], asof=ASOF1,
        )
        return snaptable.changes(spark, root, 1, 2).select(
            "s_suppkey", "change_kind", "changed_cols"
        ).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)


# --- G8: per-row point-in-time fact->SCD2 join ---------------------------

_G8_SQL = f"""
    {_DIM1_SQL}
    SELECT d.sk, d.s_suppkey, d.s_name, d.is_current,
           COUNT(*) AS n_lines, {sql_dsum('l_quantity', 'sum_qty')}
    FROM (SELECT l_suppkey,
                 DATE '2024-01-01'
                   + CAST((l_orderkey * 7 + l_linenumber) % 400 AS INTEGER)
                   AS probe_date,
                 l_quantity
          FROM lineitem) l
    JOIN dim1 d
      ON d.s_suppkey = l.l_suppkey
     AND d.start_date <= l.probe_date
     AND (d.end_date IS NULL OR d.end_date > l.probe_date)
    GROUP BY d.sk, d.s_suppkey, d.s_name, d.is_current
"""


def _g8_probe_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lineitem as a point-in-time probe stream: a deterministic probe
    date spanning 2024-01-01..2025-02-03 — straddling the second load's
    2024-06-01 version boundary, so closed T2 versions, their fresh
    successors, and T1-rewritten current rows all receive probes."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        F.col("l_suppkey").alias("s_suppkey"),
        F.date_add(
            F.to_date(F.lit("2024-01-01")),
            ((F.col("l_orderkey") * 7 + F.col("l_linenumber")) % 400).cast("int"),
        ).alias("probe_date"),
        "l_quantity",
    )


def _g8_plan(spark: SparkSession, sf_dir: str, broadcastable: bool) -> DataFrame:
    from ..functions.exact import dsum
    from ..operators.scd import scd2_pointintime_join

    dim0, staging = scd_fixture(spark, sf_dir)
    dim1 = scd2_apply(
        dim0, staging, key="s_suppkey",
        t1_cols=["s_acctbal"], t2_cols=["s_name"], fixed_cols=["s_nationkey"],
        asof=ASOF1, sk_col="sk", sk_strategy="dense",
    )
    joined = scd2_pointintime_join(
        _g8_probe_lineitem(spark, sf_dir), dim1,
        key="s_suppkey", fact_date_col="probe_date",
        dim_broadcastable=broadcastable,
    )
    return joined.groupBy("sk", "s_suppkey", "s_name", "is_current").agg(
        F.count(F.lit(1)).alias("n_lines"),
        dsum("l_quantity", "sum_qty"),
    )


@query("g8_pointintime_fact_join", sql=_G8_SQL)
def g8_pointintime_fact_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each lineitem probe joins the SCD2 supplier version in effect on
    its own probe date (scd2_pointintime_join, broadcast shape: the fact
    never shuffles before the validity-resolved join — a map-only pass
    like the C2 cascade). The reference's SCD2 validity columns (project
    SSIS::bor_dim.dtsx start_date/end_date roles) exist exactly so this
    query can be asked; g2 is its single-date special case."""
    return _g8_plan(spark, sf_dir, broadcastable=True)


@query("g8b_pointintime_unbroadcast", sql=_G8_SQL)
def g8b_pointintime_unbroadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same point-in-time join through the union+window as-of shape —
    the path for dimension histories too large to broadcast (one hash
    exchange of the fact on the key, no all-pairs). Oracle-identical to
    g8 by construction; registering both keeps the scale path honest."""
    return _g8_plan(spark, sf_dir, broadcastable=False)


# --- G9: SCD Type 3 (previous-value columns) ------------------------------


@query(
    "g9_scd3_apply",
    sql="""
    WITH staging AS (
      SELECT s_suppkey,
             CASE WHEN s_suppkey % 10 = 1 THEN s_name || '_v2'
                  ELSE s_name END AS s_name,
             CASE WHEN s_suppkey % 10 = 0 THEN s_acctbal + 100
                  ELSE s_acctbal END AS s_acctbal
      FROM supplier
      UNION ALL
      SELECT s_suppkey + 1000000, 'NEW_' || s_name, s_acctbal
      FROM supplier WHERE s_suppkey % 10 = 2
    ),
    st AS (SELECT * FROM staging WHERE s_suppkey % 10 <> 5)
    SELECT st.s_suppkey, st.s_name,
           CASE WHEN d.s_suppkey IS NOT NULL
                     AND st.s_name IS DISTINCT FROM d.s_name
                THEN d.s_name END AS prev_s_name,
           st.s_acctbal,
           CASE WHEN d.s_suppkey IS NOT NULL
                     AND st.s_acctbal IS DISTINCT FROM d.s_acctbal
                THEN d.s_acctbal END AS prev_s_acctbal
    FROM st LEFT JOIN supplier d ON st.s_suppkey = d.s_suppkey
    UNION ALL
    SELECT s_suppkey, s_name, CAST(NULL AS VARCHAR), s_acctbal,
           CAST(NULL AS DOUBLE)
    FROM supplier WHERE s_suppkey % 10 = 5
    """,
)
def g9_scd3_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type 3 load: the two-load fixture with %10==5 keys withheld
    from staging, so all four routes fire — changed (old value moves to
    the prev_ column), unchanged (prev stays NULL), brand-new (NULL
    prev), and absent-from-staging (row survives untouched)."""
    from ..operators.scd import scd3_apply

    sup = load_table(spark, sf_dir, "supplier")
    acct_t = sup.schema["s_acctbal"].dataType
    dim0 = sup.select(
        "s_suppkey",
        "s_name",
        F.lit(None).cast("string").alias("prev_s_name"),
        "s_acctbal",
        F.lit(None).cast(acct_t).alias("prev_s_acctbal"),
    )
    _, staging = scd_fixture(spark, sf_dir)
    staging = staging.where(F.col("s_suppkey") % 10 != 5).drop("s_nationkey")
    return scd3_apply(
        dim0, staging, key="s_suppkey", tracked_cols=["s_name", "s_acctbal"]
    )


# --- G17: SCD Type 6 (hybrid 1+2+3) read view ------------------------------


@query(
    "g17_scd6_hybrid",
    sql=f"""
    {_DIM1_SQL}
    SELECT sk, s_suppkey, s_name,
           MAX(CASE WHEN is_current THEN s_name END)
             OVER (PARTITION BY s_suppkey) AS current_s_name,
           s_acctbal, s_nationkey,
           CAST(start_date AS VARCHAR) AS start_date,
           CAST(end_date AS VARCHAR) AS end_date, is_current
    FROM dim1
    """,
)
def g17_scd6_hybrid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type 6 over g1's post-merge dimension
    (operators/scd.py::scd6_project): each history row carries BOTH its
    own as-of s_name and the key's current s_name — the hybrid view
    that answers "report historical facts under today's labels" with
    one lookup (the Kimball 1+2+3 pattern). Derived by a key-
    partitioned window over the unique is_current row (the dq16-
    audited SCD2 invariant), so it needs no stored Type-3 columns and
    survives every merge; one hash exchange, no join."""
    dim0, staging = scd_fixture(spark, sf_dir)
    dim1 = scd2_apply(
        dim0, staging, key="s_suppkey",
        t1_cols=["s_acctbal"], t2_cols=["s_name"], fixed_cols=["s_nationkey"],
        asof=ASOF1, sk_col="sk", sk_strategy="dense",
    )
    from ..operators.scd import scd6_project

    out = scd6_project(dim1, key="s_suppkey", t2_cols=["s_name"])
    return out.select(
        "sk", "s_suppkey", "s_name", "current_s_name", "s_acctbal",
        "s_nationkey",
        F.col("start_date").cast("string").alias("start_date"),
        F.col("end_date").cast("string").alias("end_date"),
        "is_current",
    )


# --- C12: bitemporal dimension (valid time x transaction time) -----------

_C12_SQL = f"""
    WITH staging AS (
      SELECT s_suppkey,
             CASE WHEN s_suppkey % 10 = 1 THEN s_name || '_v2'
                  ELSE s_name END AS s_name,
             CASE WHEN s_suppkey % 10 = 0 THEN s_acctbal + 100
                  ELSE s_acctbal END AS s_acctbal,
             s_nationkey
      FROM supplier
      UNION ALL
      SELECT s_suppkey + 1000000, 'NEW_' || s_name, s_acctbal, s_nationkey
      FROM supplier WHERE s_suppkey % 10 = 2
    ), cls AS (
      SELECT st.s_suppkey, st.s_name, st.s_acctbal, st.s_nationkey,
             d.s_name AS d_name, d.s_acctbal AS d_acctbal,
             d.s_nationkey AS d_nationkey,
             CASE WHEN d.s_suppkey IS NULL THEN 'new'
                  WHEN st.s_name IS DISTINCT FROM d.s_name THEN 't2'
                  WHEN st.s_acctbal IS DISTINCT FROM d.s_acctbal THEN 't1'
                  ELSE 'unchanged' END AS change_type
      FROM staging st LEFT JOIN supplier d USING (s_suppkey)
    ), bt AS (
      SELECT s_suppkey, d_name AS s_name, d_acctbal AS s_acctbal,
             DATE '2024-01-01' AS valid_from, CAST(NULL AS DATE) AS valid_to,
             DATE '2024-01-01' AS tx_from, CAST(NULL AS DATE) AS tx_to
      FROM cls WHERE change_type = 'unchanged'
      UNION ALL  -- t1/t2: the original open row, tx-closed at the load
      SELECT s_suppkey, d_name, d_acctbal,
             DATE '2024-01-01', NULL, DATE '2024-01-01', DATE '2024-06-01'
      FROM cls WHERE change_type IN ('t1', 't2')
      UNION ALL  -- t1: retroactive correction, same valid interval
      SELECT s_suppkey, d_name, s_acctbal,
             DATE '2024-01-01', NULL, DATE '2024-06-01', NULL
      FROM cls WHERE change_type = 't1'
      UNION ALL  -- t2: as-now-known closed old version
      SELECT s_suppkey, d_name, d_acctbal,
             DATE '2024-01-01', DATE '2024-06-01', DATE '2024-06-01', NULL
      FROM cls WHERE change_type = 't2'
      UNION ALL  -- t2 new version + brand-new keys
      SELECT s_suppkey, s_name, s_acctbal,
             DATE '2024-06-01', NULL, DATE '2024-06-01', NULL
      FROM cls WHERE change_type IN ('t2', 'new')
    ), probes AS (
      SELECT * FROM (VALUES
        ('march_known_march', DATE '2024-03-01', DATE '2024-03-01'),
        ('march_known_july',  DATE '2024-07-01', DATE '2024-03-01'),
        ('july_known_july',   DATE '2024-07-01', DATE '2024-07-01'),
        ('july_known_march',  DATE '2024-03-01', DATE '2024-07-01')
      ) v(label, tx_at, valid_at)
    )
    SELECT label, COUNT(*)::BIGINT AS n_rows,
           COUNT(DISTINCT s_name)::BIGINT AS n_names,
           {sql_dsum('s_acctbal', 'sum_bal')}
    FROM probes p JOIN bt
      ON bt.tx_from <= p.tx_at AND (bt.tx_to IS NULL OR bt.tx_to > p.tx_at)
     AND bt.valid_from <= p.valid_at
     AND (bt.valid_to IS NULL OR bt.valid_to > p.valid_at)
    GROUP BY label
"""


@query("c12_bitemporal_probe", sql=_C12_SQL)
def c12_bitemporal_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitemporal supplier dimension: the g1 fixture's load applied as
    a TWO-AXIS update (operators/scd.bitemporal_apply) — valid time
    (when true in the world) x transaction time (when the warehouse
    knew it) — then four point probes proving the axes are independent:
    'march_known_march' reproduces the original report; 'march_known_july'
    shows the T1 balance correction applied RETROACTIVELY to March while
    T2 name changes correctly do NOT reach back; 'july_known_july' is
    the current state; 'july_known_march' shows March's knowledge
    projected forward (no corrections, no new keys). SCD2 alone cannot
    answer three of the four. Reference anchor: the per-row UPDATEs of
    `project SSIS::bor_dim.dtsx:454,566` are the T1 path, minus the
    reproducibility this keeps."""
    from ..cache import pin
    from ..functions.exact import dsum
    from ..operators.scd import bitemporal_apply, bitemporal_at, bitemporal_init

    sup = load_table(spark, sf_dir, "supplier")
    _, staging = scd_fixture(spark, sf_dir)
    bt0 = bitemporal_init(
        sup.select("s_suppkey", "s_name", "s_acctbal", "s_nationkey"),
        "s_suppkey", ["s_name", "s_acctbal", "s_nationkey"], asof=ASOF0,
    )
    bt1 = pin(bitemporal_apply(
        bt0, staging, key="s_suppkey",
        t1_cols=["s_acctbal"], t2_cols=["s_name"],
        fixed_cols=["s_nationkey"], asof=ASOF1,
    ))
    probes = [
        ("march_known_march", "2024-03-01", "2024-03-01"),
        ("march_known_july", "2024-07-01", "2024-03-01"),
        ("july_known_july", "2024-07-01", "2024-07-01"),
        ("july_known_march", "2024-03-01", "2024-07-01"),
    ]
    parts = []
    for label, tx_at, valid_at in probes:
        snap = bitemporal_at(
            bt1,
            F.lit(tx_at).cast("date"),
            F.lit(valid_at).cast("date"),
        )
        parts.append(
            snap.agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.countDistinct("s_name").alias("n_names"),
                dsum("s_acctbal", "sum_bal"),
            ).select(F.lit(label).alias("label"), "*")
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


@query(
    "c13_scd2_compaction",
    sql=f"""
    {_DIM1_SQL}
    SELECT sk, s_suppkey, s_name, s_acctbal, s_nationkey,
           CAST(start_date AS VARCHAR) AS start_date,
           CAST(end_date AS VARCHAR) AS end_date, is_current
    FROM dim1
    """,
)
def c13_scd2_compaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 version-chain compaction (operators/scd.scd2_compact): the
    g1 dimension is put through a 'paranoid full refresh' — every
    current row closed at 2024-09-01 and re-inserted verbatim with a
    fresh surrogate key (the version-on-every-load anti-pattern) — and
    compaction must merge the churn back out. The oracle is _DIM1_SQL
    ITSELF: churn-then-compact is provably the identity on this
    fixture, down to the original surrogate keys (the merged run keeps
    its first version's sk), which also hash-checks that real version
    boundaries (the T2 closes) are never merged across."""
    from ..operators.scd import scd2_compact

    dim0, staging = scd_fixture(spark, sf_dir)
    dim1 = scd2_apply(
        dim0, staging, key="s_suppkey",
        t1_cols=["s_acctbal"], t2_cols=["s_name"], fixed_cols=["s_nationkey"],
        asof=ASOF1, sk_col="sk", sk_strategy="dense",
    )
    churn_date = F.lit("2024-09-01").cast("date")
    cur = dim1.filter(F.col("is_current"))
    refresh = (
        dim1.filter(~F.col("is_current"))
        .unionByName(
            cur.withColumn("end_date", churn_date).withColumn(
                "is_current", F.lit(False)
            )
        )
        .unionByName(
            cur.withColumn("sk", F.col("sk") + 100000)
            .withColumn("start_date", churn_date)
            .withColumn("end_date", F.lit(None).cast("date"))
        )
    )
    compacted = scd2_compact(
        refresh, key="s_suppkey",
        attr_cols=["s_name", "s_acctbal", "s_nationkey"], sk_col="sk",
    )
    return compacted.select(
        "sk", "s_suppkey", "s_name", "s_acctbal", "s_nationkey",
        F.col("start_date").cast("string").alias("start_date"),
        F.col("end_date").cast("string").alias("end_date"),
        "is_current",
    )


@query(
    "g13_period_allocation",
    sql=f"""
    {_DIM1_SQL}
    , facts AS (
      SELECT l_suppkey AS s_suppkey,
             DATE '2024-04-01'
               + CAST((l_orderkey * 11 + l_linenumber) % 120 AS INTEGER)
               AS p_start,
             DATE '2024-04-01'
               + CAST((l_orderkey * 11 + l_linenumber) % 120 AS INTEGER)
               + INTERVAL 45 DAY AS p_end,
             CAST(l_quantity AS BIGINT) AS qty
      FROM lineitem
    ), alloc AS (
      SELECT d.sk, d.s_suppkey, d.is_current, f.qty,
             date_diff('day',
               greatest(f.p_start, d.start_date),
               least(f.p_end, coalesce(d.end_date, DATE '9999-12-31'))
             )::BIGINT AS overlap_days
      FROM facts f
      JOIN dim1 d
        ON d.s_suppkey = f.s_suppkey
       AND d.start_date < f.p_end
       AND (d.end_date IS NULL OR d.end_date > f.p_start)
    )
    SELECT sk, s_suppkey, is_current,
           COUNT(*)::BIGINT AS n_facts,
           SUM(overlap_days)::BIGINT AS sum_overlap_days,
           SUM(qty * overlap_days)::BIGINT AS weighted_qty
    FROM alloc GROUP BY sk, s_suppkey, is_current
    """,
)
def g13_period_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Period allocation across SCD2 versions: each fact carries a
    45-day validity PERIOD (deterministic start straddling the
    2024-06-01 version boundary), and its quantity is attributed to
    every supplier version it overlaps, weighted by exact overlap days
    — the time-weighted cost-allocation join g8's point-in-time lookup
    cannot express (a point probe picks ONE version; a period spans
    several). The canonical use: amortizing a subscription or contract
    over the dimension history it lived through.

    Exactness: overlap = min(end) - max(start) in integer days (open
    end mapped to a far sentinel); the weighted quantity stays an int64
    PRODUCT-SUM — the allocation RATIO (weighted/period_len) is left to
    the consumer so no division ever happens inside the aggregate
    (the g12 no-mean-of-means rule). Scale: one broadcast interval
    join (dim history is dimension-sized; disjoint versions bound the
    fan-out by versions-overlapping-the-period, <= 2 here) and one
    version-grain aggregate."""
    from ..functions import exact as _  # noqa: F401  (doc anchor)

    dim0, staging = scd_fixture(spark, sf_dir)
    dim1 = scd2_apply(
        dim0, staging, key="s_suppkey",
        t1_cols=["s_acctbal"], t2_cols=["s_name"], fixed_cols=["s_nationkey"],
        asof=ASOF1, sk_col="sk", sk_strategy="dense",
    )
    li = load_table(spark, sf_dir, "lineitem")
    start = F.date_add(
        F.to_date(F.lit("2024-04-01")),
        ((F.col("l_orderkey") * 11 + F.col("l_linenumber")) % 120).cast("int"),
    )
    facts = li.select(
        F.col("l_suppkey").alias("f_key"),
        start.alias("p_start"),
        F.date_add(start, 45).alias("p_end"),
        F.col("l_quantity").cast("bigint").alias("qty"),
    )
    dimv = dim1.select(
        F.col("s_suppkey").alias("d_key"), "sk", "s_suppkey", "is_current",
        "start_date", "end_date",
    )
    joined = facts.join(
        F.broadcast(dimv),
        (F.col("f_key") == F.col("d_key"))
        & (F.col("start_date") < F.col("p_end"))
        & (F.col("end_date").isNull() | (F.col("end_date") > F.col("p_start"))),
    )
    overlap = F.datediff(
        F.least(
            F.col("p_end"),
            F.coalesce(F.col("end_date"), F.lit("9999-12-31").cast("date")),
        ),
        F.greatest(F.col("p_start"), F.col("start_date")),
    ).cast("bigint")
    return joined.groupBy("sk", "s_suppkey", "is_current").agg(
        F.count(F.lit(1)).alias("n_facts"),
        F.sum(overlap).alias("sum_overlap_days"),
        F.sum(F.col("qty") * overlap).alias("weighted_qty"),
    )


# --- G19: accumulating-snapshot fact --------------------------------------


@query(
    "g19_accumulating_snapshot",
    sql="""
    SELECT o.o_orderkey AS order_id,
           CAST(o.o_orderdate AS VARCHAR) AS placed_date,
           CAST(MIN(l.l_shipdate) AS VARCHAR) AS first_ship_date,
           CAST(MAX(l.l_shipdate) AS VARCHAR) AS last_ship_date,
           CAST(datediff('day', o.o_orderdate, MIN(l.l_shipdate))
             AS BIGINT) AS days_to_first_ship,
           CAST(datediff('day', o.o_orderdate, MAX(l.l_shipdate))
             AS BIGINT) AS days_to_fully_ship,
           COUNT(*)::BIGINT AS n_lines,
           CAST(SUM(CASE WHEN l.l_linestatus = 'F' THEN 1 ELSE 0 END)
             AS BIGINT) AS n_finalized,
           CASE WHEN COUNT(*) = SUM(CASE WHEN l.l_linestatus = 'F'
                                         THEN 1 ELSE 0 END)
                THEN 'complete' ELSE 'in_flight' END AS milestone_status
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    GROUP BY o.o_orderkey, o.o_orderdate
    """,
)
def g19_accumulating_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Accumulating-snapshot fact table (the third Kimball fact style
    next to the transaction facts and g7's periodic snapshots): ONE row
    per order carrying every pipeline milestone — placed, first ship,
    last ship — plus the lag measures between them and a completeness
    status from the line states (this synthetic lineitem carries no
    receipt date; a real TPC-H adds l_receiptdate as one more MIN/MAX
    milestone, same plan). In a live warehouse each milestone lands as
    an UPDATE to the existing row; here the read-side build is one
    orders |x| lineitem join + order-grain aggregate, and the
    update-in-place production path is the snaptable MERGE g7 already
    proves (milestone columns are just t1_cols). Dates surfaced as ISO
    strings (the g1 hashing contract); day lags are exact calendar
    arithmetic, identical cross-engine."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    j = orders.join(li, orders.o_orderkey == li.l_orderkey)
    finalized = F.sum(
        F.when(F.col("l_linestatus") == "F", 1).otherwise(0)
    ).cast("bigint")
    agg = j.groupBy(
        F.col("o_orderkey").alias("order_id"),
        F.col("o_orderdate"),
    ).agg(
        F.min("l_shipdate").alias("__first_ship"),
        F.max("l_shipdate").alias("__last_ship"),
        F.count(F.lit(1)).alias("n_lines"),
        finalized.alias("n_finalized"),
    )
    return agg.select(
        "order_id",
        F.col("o_orderdate").cast("string").alias("placed_date"),
        F.col("__first_ship").cast("string").alias("first_ship_date"),
        F.col("__last_ship").cast("string").alias("last_ship_date"),
        F.datediff("__first_ship", "o_orderdate")
        .cast("bigint")
        .alias("days_to_first_ship"),
        F.datediff("__last_ship", "o_orderdate")
        .cast("bigint")
        .alias("days_to_fully_ship"),
        "n_lines",
        "n_finalized",
        F.when(F.col("n_lines") == F.col("n_finalized"), "complete")
        .otherwise("in_flight")
        .alias("milestone_status"),
    )
