"""PySpark-native analytics engine with the query & data-processing
capabilities of the reference ETL system (heba2311/ETL-Pipline-IBRD-Loan-System).

The reference is a three-layer batch ETL + star-schema OLAP stack
(PySpark ingest/clean -> SSIS SCD warehouse -> Power BI measures); this
package re-expresses every capability Spark-first:

- ``session``    : tuned SparkSession factory (AQE, shuffle partitions, UTC)
- ``catalog``    : testdata table loading / temp-view registration
- ``operators``  : cleaning, joins, windows, SCD2, star-schema build,
                   dedup, similarity, text analysis, multimodal plumbing
- ``sources``    : resumable paged ingest, CSV dictionary reader
- ``functions``  : the semantic/measure layer (named aggregates)
- ``plans``      : end-to-end pipeline compositions (one lazy lineage)
- ``streaming``  : incremental micro-batch + Structured Streaming surface

Design stance (SURVEY.md section 4): zero custom Catalyst rules — every
operator is declared through the DataFrame/SQL API so Catalyst handles
pushdown, pruning, broadcast selection, and whole-stage codegen; the only
imperative escapes are Arrow-batched pandas UDFs for multimodal decode
stubs.
"""

__version__ = "0.1.0"
