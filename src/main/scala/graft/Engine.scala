package graft

import java.sql.Timestamp

import scala.util.Try

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

import graft.model.FeatureView
import graft.sources.FeatureSource

/** Engine configuration (ref: feast_hive/hive.py:44-107 `HiveOfflineStoreConfig`).
  * The reference's connection knobs (host/port/auth/...) have no Spark
  * equivalent; what survives is the session-conf overlay (`hive_conf`,
  * ref hive.py:61-62,97-107 — S10) applied before every retrieval.
  */
final case class EngineConfig(sessionConf: Map[String, String] = Map.empty)

/** Entity dataframe input: a DataFrame or a SQL string evaluated in-engine
  * (ref: feast_hive/hive.py:197,363-391 — pandas DataFrame | str; anything
  * else raises InvalidEntityType, hive.py:391). */
sealed trait EntityInput
final case class EntityFrame(df: DataFrame) extends EntityInput
final case class EntitySql(sql: String) extends EntityInput

/** Orchestration layer: the two offline-store entry points plus the table
  * surface (S3–S7). All methods return lazy handles / lazy DataFrames;
  * nothing executes until a caller acts. */
final class Engine(spark: SparkSession, config: EngineConfig = EngineConfig()) {

  /** S10: session conf overlay (ref: hive.py:249-254 prefixes SET statements
    * to every query batch). Applied around plan construction AND around
    * every RetrievalJob terminal action (via [[RetrievalJob.ConfScope]]),
    * with PRIOR VALUES RESTORED afterwards — execution-time confs like
    * `spark.sql.shuffle.partitions` are read during physical planning,
    * which runs lazily at the first action, so scoping build alone would
    * silently no-op them. One engine's conf never leaks into unrelated
    * work on the shared session.
    *
    * Session conf is SHARED MUTABLE state: two concurrent overlaid actions
    * on one session could interleave set/restore and run under each
    * other's overlay. Overlay application is therefore serialized with a
    * per-session lock — overlaid actions on the same session run one at a
    * time (plain, no-overlay work is untouched). Callers needing overlaid
    * parallelism should use `SparkSession.newSession()` per thread, which
    * gives each its own conf. */
  private def withSessionConf[A](body: => A): A =
    if (config.sessionConf.isEmpty) body
    else Engine.confLockFor(spark).synchronized {
      val prior = config.sessionConf.keys
        .map(k => k -> Try(spark.conf.get(k)).toOption).toList
      config.sessionConf.foreach { case (k, v) => spark.conf.set(k, v) }
      try body
      finally prior.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None)    => spark.conf.unset(k)
      }
    }

  /** The overlay as around-advice for RetrievalJob terminal actions. */
  private val confScope: RetrievalJob.ConfScope = new RetrievalJob.ConfScope {
    def apply[A](body: => A): A = withSessionConf(body)
  }

  private def resolveEntityDf(entity: EntityInput): DataFrame = entity match {
    case EntityFrame(df) => df
    case EntitySql(sql)  => spark.sql(sql) // S2; no CTAS round-trip needed
  }

  /** Infer the entity df's event-timestamp column (ref: feast's
    * `infer_event_timestamp_from_entity_df`, used at hive.py:214-216):
    * prefer a column literally named `event_timestamp`; otherwise accept a
    * UNIQUE timestamp-typed column; ambiguity or absence is an error
    * naming the candidates. */
  def inferEventTimestampColumn(entityDf: DataFrame): String = {
    val byName = entityDf.columns.find(_ == "event_timestamp")
    byName.getOrElse {
      val tsCols = entityDf.schema.fields.filter(f =>
        f.dataType == org.apache.spark.sql.types.TimestampType ||
          f.dataType == org.apache.spark.sql.types.TimestampNTZType)
        .map(_.name).toSeq
      tsCols match {
        case Seq(only) => only
        case Seq() => throw new EntityDfMissingColumnsError(
          Seq("event_timestamp"), Seq("event_timestamp"))
        case many => throw new IllegalArgumentException(
          "Ambiguous entity event-timestamp column; found multiple " +
            s"timestamp columns: ${many.mkString(", ")} — name one " +
            "'event_timestamp' or pass entityTsCol explicitly")
      }
    }
  }

  /** Entry point 1 — the flagship point-in-time join
    * (ref: feast_hive/hive.py:192-269). When the entity df has no column
    * named `entityTsCol`, the timestamp column is INFERRED like the
    * reference does (hive.py:214-216 via
    * `infer_event_timestamp_from_entity_df`) — see
    * [[inferEventTimestampColumn]]. */
  def getHistoricalFeatures(
      entity: EntityInput,
      views: Seq[FeatureView],
      entityTsCol: String = "event_timestamp",
      fullFeatureNames: Boolean = false): RetrievalJob =
    RetrievalJob({
      val df = resolveEntityDf(entity)
      // Infer ONLY when the caller left the default name — an explicitly
      // named-but-absent column must error (silent inference would mask a
      // typo and join on an unintended timestamp).
      val tsCol =
        if (df.columns.contains(entityTsCol)) entityTsCol
        else if (entityTsCol == "event_timestamp")
          inferEventTimestampColumn(df)
        else throw new EntityDfMissingColumnsError(Seq(entityTsCol), Seq(entityTsCol))
      PointInTime.getHistoricalFeatures(df, views, tsCol, fullFeatureNames)
    }, confScope)

  /** ref: hive.py:391 — non-DataFrame/non-string entity df is a type error.
    * Scala's types make the invalid case unrepresentable through the sealed
    * trait; this shim keeps the reference's dynamic contract for callers
    * holding an untyped value. */
  def getHistoricalFeaturesAny(
      entity: Any,
      views: Seq[FeatureView],
      entityTsCol: String = "event_timestamp",
      fullFeatureNames: Boolean = false): RetrievalJob = entity match {
    case df: org.apache.spark.sql.Dataset[_] =>
      getHistoricalFeatures(EntityFrame(df.toDF()), views, entityTsCol, fullFeatureNames)
    case sql: String =>
      getHistoricalFeatures(EntitySql(sql), views, entityTsCol, fullFeatureNames)
    case other =>
      throw new InvalidEntityTypeException(
        if (other == null) "null" else other.getClass.getName)
  }

  /** Entry point 2 — materialization's latest-per-key pull
    * (ref: feast_hive/hive.py:143-190). */
  def pullLatest(
      source: FeatureSource,
      joinKeys: Seq[String],
      featureNames: Seq[String],
      eventTsCol: String,
      createdTsCol: Option[String],
      startDate: Timestamp,
      endDate: Timestamp,
      tieBreakColumns: Seq[String] = Nil): RetrievalJob =
    RetrievalJob(
      PullLatest.pullLatest(spark, source, joinKeys, featureNames,
        eventTsCol, createdTsCol, startDate, endDate, tieBreakColumns),
      confScope)

  // ── Table surface ───────────────────────────────────────────────────────
  // The reference needs a physical upload round-trip because Hive owns all
  // storage (CREATE TABLE + chunked INSERT VALUES, hive.py:363-460). In
  // Spark the client df already lives in the engine, so "upload" is a temp
  // view; the physical forms are kept for API parity.

  /** S5-equivalent upload: register the entity df for SQL access
    * (ref: hive.py:207-212 — temp entity table; no data movement here). */
  def uploadEntityDf(name: String, df: DataFrame): Unit =
    df.createOrReplaceTempView(name)

  /** Remove an orphaned managed-table location left behind by a previous
    * session (the in-memory catalog forgets the table, the directory stays,
    * and `saveAsTable` then refuses with LOCATION_ALREADY_EXISTS). */
  private def dropOrphanedLocation(name: String): Unit = {
    val wh = spark.conf.get("spark.sql.warehouse.dir")
    val loc = new org.apache.hadoop.fs.Path(wh, name.toLowerCase)
    val fs = loc.getFileSystem(spark.sessionState.newHadoopConf())
    if (!spark.catalog.tableExists(name) && fs.exists(loc))
      fs.delete(loc, true)
  }

  /** S3: CTAS — materialize a query result as a Parquet table
    * (ref: hive.py:380 `CREATE TABLE ... STORED AS PARQUET AS ...`).
    *
    * `partitionBy` is the write-side complement of the reference's
    * `date_partition_column` (hive_source.py — read-side metadata there):
    * a table written partitioned by its date column serves any later
    * time-ranged feature scan with partition PRUNING instead of a full
    * scan — the layout decision that matters most at 100 TB, and the
    * standard mitigation when a timestamp column itself isn't
    * filter-pushable (e.g. repaired TIMESTAMP(NANOS) — see
    * PartitionPruningSpec). */
  def createTableAs(
      name: String, df: DataFrame, partitionBy: Seq[String] = Nil): Unit = {
    dropOrphanedLocation(name)
    df.write.mode("overwrite").partitionBy(partitionBy: _*)
      .format("parquet").saveAsTable(name)
  }

  /** CTAS with BUCKETED layout: rows are hash-distributed into
    * `nBuckets` files per partition by `bucketCols`, and the catalog
    * records it — equi-joins and aggregations on the bucket columns then
    * read co-located buckets with NO shuffle on the bucketed side(s)
    * (spec-asserted: zero Exchange in a bucketed⋈bucketed join plan).
    * This is the standing answer to "this join shuffles 100 TB every
    * run": pay the distribution once at write time, reuse it across
    * every downstream stage. Pair same-bucketed tables (equal nBuckets,
    * same keys) for the full effect. */
  def createTableBucketed(
      name: String, df: DataFrame, bucketCols: Seq[String],
      nBuckets: Int): Unit = {
    require(bucketCols.nonEmpty && nBuckets > 0,
      "bucketed CTAS needs bucket columns and a positive bucket count")
    dropOrphanedLocation(name)
    df.write.mode("overwrite")
      .bucketBy(nBuckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .format("parquet").saveAsTable(name)
  }

  /** S4: create an empty Parquet table from a schema (ref: hive.py:413-419). */
  def createTable(name: String, schema: StructType): Unit = {
    dropOrphanedLocation(name)
    spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
      .write.mode("ignore").format("parquet").saveAsTable(name)
  }

  /** S5: row insert (ref: hive.py:439-460 — chunked INSERT VALUES; Spark
    * appends partition-parallel, no chunk knob needed). */
  def insertInto(name: String, df: DataFrame): Unit =
    df.write.mode("append").insertInto(name)

  /** S6: truncate (ref: hive.py:443-445). */
  def truncateTable(name: String): Unit =
    spark.sql(s"TRUNCATE TABLE ${Engine.quoteName(name)}")

  /** S7: drop (ref: hive.py:258-260 cleanup). */
  def dropTable(name: String): Unit =
    spark.sql(s"DROP TABLE IF EXISTS ${Engine.quoteName(name)}")
}

object Engine {
  /** Backtick-quote a possibly-qualified table name part-by-part, so
    * `db.tbl` stays a two-part identifier (quoting the whole string would
    * make it one identifier LITERALLY NAMED "db.tbl" — inconsistent with
    * how [[graft.sources.FeatureSource]] resolves qualified names). */
  private[graft] def quoteName(name: String): String =
    name.split('.').map(p => s"`${p.replace("`", "``")}`").mkString(".")

  /** One overlay lock per SparkSession (identity-keyed, weak — sessions
    * are GC-able). See [[Engine.withSessionConf]]. */
  private val confLocks =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[SparkSession, Object]())
  private def confLockFor(spark: SparkSession): Object =
    confLocks.synchronized {
      confLocks.computeIfAbsent(spark, _ => new Object)
    }
}
