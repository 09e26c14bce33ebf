package graft.sources

import scala.util.{Failure, Success, Try}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

import graft.{DataSourceNoNameException, DataSourceNotFoundException, Tables}
import graft.types.TypeMapping

/** A batch feature data source: a catalog table, an arbitrary SQL query, or
  * a parquet path (our native addition — the reference only knows
  * table/query because Hive owns all storage).
  *
  * Mirrors `HiveSource` (ref: feast_hive/hive_source.py:81-119): role
  * columns (event/created timestamp), `fieldMapping` renames applied to the
  * source before anything else (exercised by the reference with
  * `{"ts_1": "ts", "id": "driver_id"}` at tests/test_all.py:90), and an
  * optional date-partition column (metadata only — Spark prunes partitions
  * from predicates on its own).
  */
final case class FeatureSource(
    table: Option[String] = None,
    query: Option[String] = None,
    path: Option[String] = None,
    eventTimestampColumn: String = "event_timestamp",
    createdTimestampColumn: Option[String] = None,
    fieldMapping: Map[String, String] = Map.empty,
    datePartitionColumn: Option[String] = None,
    name: Option[String] = None) {

  require(table.isDefined || query.isDefined || path.isDefined,
    "FeatureSource needs one of table / query / path")
  // ref: feast_hive/hive_source.py:108 — query sources must be named.
  if (table.isEmpty && path.isEmpty && query.isDefined && name.isEmpty)
    throw new DataSourceNoNameException()

  /** ref: feast_hive/hive_source.py:203-208 (`get_table_query_string`). */
  def tableQueryString: String =
    table.map(t => s"`$t`")
      .orElse(query.map(q => s"($q)"))
      .getOrElse(s"parquet.`${path.get}`")

  /** Source name, defaulting to the table name / parquet path like the
    * reference defaults a table-backed source's name to its table
    * (ref: feast_hive/hive_source.py:102-108). Query sources were already
    * required to carry an explicit name at construction. */
  def resolvedName: String =
    name.orElse(table).orElse(path)
      .getOrElse(throw new DataSourceNoNameException())

  /** Resolve to a DataFrame with `fieldMapping` renames applied. Lazy —
    * nothing executes until an action. */
  def resolve(spark: SparkSession): DataFrame = {
    val base = load(spark)
    fieldMapping.foldLeft(base) { case (df, (from, to)) =>
      df.withColumnRenamed(from, to)
    }
  }

  private def load(spark: SparkSession): DataFrame = {
    val attempt = Try {
      table.map(spark.table)
        .orElse(query.map(spark.sql))
        // Footer-driven read: repairs TIMESTAMP(NANOS) columns for any file
        // that actually declares them — no name heuristics, no silent
        // rewriting of ordinary long columns.
        .getOrElse(Tables.readParquet(spark, path.get))
    }
    attempt match {
      case Success(df) => df
      case Failure(e) =>
        // ref: feast_hive/hive_source.py:237,243,247
        throw new DataSourceNotFoundException(
          s"Data source not found or query invalid: $tableQueryString", e)
    }
  }

  /** Schema via Catalyst analysis only — no LIMIT-1 probe scan, an
    * improvement over the reference (hive_source.py:240-247). */
  def schema(spark: SparkSession): StructType = resolve(spark).schema

  /** ref: feast_hive/hive_source.py:210-247
    * (`get_table_column_names_and_types`).
    *
    * CONTRACT NOTE: names here (and in [[schema]]) are POST-fieldMapping —
    * the mapping is applied once at resolve time. The reference instead
    * returns RAW source columns and lets feast re-apply field_mapping
    * downstream (hive_source.py:214-247); any inference/retrieval layer
    * built on this engine must treat the mapping as already applied and
    * never rename a second time. */
  def columnNamesAndTypes(spark: SparkSession): Seq[(String, String)] =
    schema(spark).fields.toSeq.map(f => f.name -> TypeMapping.sparkToHive(f.dataType))

  /** ref: feast_hive/hive_source.py:200-201 (`validate`). */
  def validate(spark: SparkSession): Unit = { schema(spark); () }
}
