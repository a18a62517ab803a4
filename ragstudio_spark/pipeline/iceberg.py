"""Iceberg table adapter — real Iceberg when the runtime is present,
parquet-emulation otherwise.

The production design (north rule) stores transcripts/chunks/metrics/
lineage as Iceberg tables: ``PARTITIONED BY (bucket(B, conv_id))``, append
snapshots as the commit unit, resume = anti-join against the last committed
snapshot, MERGE INTO for the run-index upsert. This container ships no
iceberg-spark-runtime jar, so:

* ``iceberg_available(spark)`` probes the catalog plugin;
* with Iceberg: DDL/write/merge templates below are used as-is;
* without: ``pipeline/lineage.py`` provides the behavioral equivalent
  (run-dir + ``_COMMITTED`` marker = snapshot commit; committed-runs union
  = current snapshot view; marker absence = uncommitted snapshot invisible
  to readers). The resume/idempotence semantics are identical and are what
  the test suite pins.

Deploy note: add
  --packages org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:<ver>
  --conf spark.sql.catalog.lake=org.apache.iceberg.spark.SparkCatalog
  --conf spark.sql.catalog.lake.type=hadoop
  --conf spark.sql.catalog.lake.warehouse=<path>
and pass ``catalog="lake"`` here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

DDL_TRANSCRIPTS = """
CREATE TABLE IF NOT EXISTS {catalog}.{db}.transcripts (
  conv_id string, turn_idx int, role string, text string, tool string,
  ts timestamp
) USING iceberg
PARTITIONED BY (bucket({n_buckets}, conv_id))
TBLPROPERTIES ('write.distribution-mode' = 'hash')
"""

DDL_CHUNKS = """
CREATE TABLE IF NOT EXISTS {catalog}.{db}.chunks (
  conv_id string, turn_idx int, chunk_index int, chunk_id string,
  text string, char_start int, char_end int, char_length int,
  token_count int, sentence_count int, total_chunks int,
  chunking_strategy string, requested_strategy string,
  chunk_size int, chunk_overlap int, content_type string,
  extraction_engine string, extraction_fixes int, page_numbers_removed int
) USING iceberg
PARTITIONED BY (bucket({n_buckets}, conv_id))
"""

MERGE_RUN_INDEX = """
MERGE INTO {catalog}.{db}.run_index t
USING run_updates s
ON t.run_id = s.run_id
WHEN MATCHED THEN UPDATE SET *
WHEN NOT MATCHED THEN INSERT *
"""


def iceberg_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.SparkCatalog"
        )
        return True
    except Exception:
        return False


def create_tables(spark: SparkSession, catalog: str, db: str, n_buckets: int = 64) -> None:
    if not iceberg_available(spark):
        raise RuntimeError(
            "Iceberg runtime not on the classpath; use pipeline.lineage "
            "(parquet emulation) or submit with the iceberg-spark-runtime "
            "package (see module docstring)"
        )
    spark.sql(f"CREATE NAMESPACE IF NOT EXISTS {catalog}.{db}")
    spark.sql(DDL_TRANSCRIPTS.format(catalog=catalog, db=db, n_buckets=n_buckets))
    spark.sql(DDL_CHUNKS.format(catalog=catalog, db=db, n_buckets=n_buckets))


def append_snapshot(df: DataFrame, catalog: str, db: str, table: str) -> None:
    """One Iceberg append = one atomic commit (the _COMMITTED analogue)."""
    df.writeTo(f"{catalog}.{db}.{table}").append()


def upsert_run_index(spark: SparkSession, updates: DataFrame, catalog: str, db: str) -> None:
    """history.py:399-412 run-index replace-by-run_id as MERGE INTO."""
    updates.createOrReplaceTempView("run_updates")
    spark.sql(MERGE_RUN_INDEX.format(catalog=catalog, db=db))
