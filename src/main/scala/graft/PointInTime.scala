package graft

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.model.FeatureView

/** The point-in-time ("as-of") feature join — the engine's flagship.
  *
  * Semantics from the reference's `get_historical_features`
  * (ref: feast_hive/hive.py:192-269, SQL template feast_hive/hive.py:527-721,
  * oracle tests/feast_tests_funcs.py:263-367): for every entity row attach
  * the latest feature values with `event_ts <= entity_ts` and, when
  * `ttl > 0`, `event_ts >= entity_ts - ttl` (both bounds inclusive;
  * `ttl == 0` means no lower bound at all). Among candidates the greatest
  * `event_ts` wins; ties broken by greatest `created_ts`. Unmatched entity
  * rows keep NULL features (final join is LEFT).
  *
  * The PLAN is Spark-first, not a translation of the reference's 4-stage
  * Hive workaround pipeline (temp tables, 1-row MIN/MAX joins, regex drops):
  *
  *  1. driver-side scalar min/max of the entity timestamp, inlined as
  *     literals — the coarse range filter constant-folds into Parquet
  *     predicate pushdown (replaces the reference's J1 cartesian join,
  *     hive.py:592-605);
  *  2. DISTINCT entity rows per view (ref A1, hive.py:555-565);
  *  3. one inner equi-join on entity keys with the as-of range as residual
  *     (ref J2, hive.py:611-629); entity-less views join on the range alone
  *     against a broadcast of the distinct timestamps;
  *  4. a single `row_number` window per view (partition = entity keys +
  *     entity ts; order = event_ts DESC, created_ts DESC) replaces the
  *     reference's A3+A4+J3 dedup/latest/join-back chain (hive.py:635-696)
  *     with one shuffle per view;
  *  5. LEFT join features back onto the full entity df on
  *     (entity keys, entity ts) — a `struct`-free natural join key; the
  *     reference's string CONCAT unique id (hive.py:537-545) is avoided
  *     (collision class "1"+"23" == "12"+"3", plus cast cost). Duplicate
  *     (keys, ts) entity rows each match the single deduped feature row, so
  *     they yield one output row per input row (trap: hive.py:706-720 vs
  *     :555-565).
  *
  * At scale: the only data-sized shuffles are the per-view equi-join and its
  * window (both keyed on entity keys, co-partitionable); the feature scan is
  * pre-filtered by the pushed-down coarse range; nothing but two scalar
  * aggregates ever reaches the driver.
  */
object PointInTime {

  private val EventTs = "__graft_event_ts"
  private val CreatedTs = "__graft_created_ts"
  private val Rn = "__graft_rn"
  private val Bkt = "__graft_bkt"

  def getHistoricalFeatures(
      entityDf: DataFrame,
      views: Seq[FeatureView],
      entityTsCol: String = "event_timestamp",
      fullFeatureNames: Boolean = false): DataFrame = {
    val spark = entityDf.sparkSession

    // ref: hive.py:222-224 — assert expected columns in the entity df.
    val expected = views.flatMap(_.entities).distinct :+ entityTsCol
    val missing = expected.filterNot(entityDf.columns.contains)
    if (missing.nonEmpty)
      throw new EntityDfMissingColumnsError(expected, missing)

    // A2: driver-side scalar min/max of the entity ts (null ⇔ empty df).
    val bounds: Row =
      entityDf.agg(min(col(entityTsCol)), max(col(entityTsCol))).head()
    val (minTs, maxTs) = (bounds.get(0), bounds.get(1))

    views.foldLeft(entityDf) { (acc, fv) =>
      val feat =
        latestPerEntityRow(spark, fv, entityDf, entityTsCol, minTs, maxTs,
          fullFeatureNames)
      // J4: left join keeps unmatched entity rows with NULL features.
      acc.join(feat, fv.entities :+ entityTsCol, "left")
    }
  }

  /** The flagship on the NATIVE sort-merge as-of operator
    * ([[graft.plans.AsOfJoin]]): each view is ONE as-of join of the full
    * entity df — no distinct, no window, no join-back; the operator's
    * single merge pass per partition handles duplicate entity rows and
    * null attachment natively. Same results as
    * [[getHistoricalFeatures]] (spec-asserted); ~2× fewer shuffles per
    * view. The coarse scan filter (J1 replacement) is still applied so
    * parquet pruning is identical. */
  def getHistoricalFeaturesNative(
      entityDf: DataFrame,
      views: Seq[FeatureView],
      entityTsCol: String = "event_timestamp",
      fullFeatureNames: Boolean = false): DataFrame = {
    val spark = entityDf.sparkSession
    val expected = views.flatMap(_.entities).distinct :+ entityTsCol
    val missing = expected.filterNot(entityDf.columns.contains)
    if (missing.nonEmpty)
      throw new EntityDfMissingColumnsError(expected, missing)
    val bounds: Row =
      entityDf.agg(min(col(entityTsCol)), max(col(entityTsCol))).head()
    val (minTs, maxTs) = (bounds.get(0), bounds.get(1))

    views.foldLeft(entityDf) { (acc, fv) =>
      val src = fv.source.resolve(spark)
      val evtCol = fv.source.eventTimestampColumn
      val createdCol = fv.source.createdTimestampColumn
      val srcCols = src.columns.toSet
      val featNames =
        (if (fv.features.nonEmpty) fv.features.filter(srcCols.contains)
         else src.columns.toSeq.filterNot(c =>
           fv.entities.contains(c) || c == evtCol || createdCol.contains(c)))
      val prefix = if (fullFeatureNames) s"${fv.name}__" else ""
      val coarse: DataFrame =
        if (maxTs == null) src.filter(lit(false))
        else {
          val upper = col(evtCol) <= lit(maxTs)
          val lower =
            if (fv.ttlSeconds > 0)
              col(evtCol) >=
                lit(minTs) - expr(s"INTERVAL ${fv.ttlSeconds} SECONDS")
            else lit(true)
          src.filter(upper && lower)
        }
      val feats = coarse.select(
        fv.entities.map(col) ++
          Seq(col(evtCol).as(EventTs)) ++
          createdCol.map(c => col(c).as(CreatedTs)).toSeq ++
          featNames.map(f => col(f).as(prefix + f)): _*)
      graft.plans.AsOf.join(
        acc, feats, fv.entities, entityTsCol, EventTs,
        createdCol.map(_ => CreatedTs), fv.ttlSeconds)
        .drop(EventTs).drop(CreatedTs)
    }
  }

  /** One row per distinct (entity keys, entity ts): the as-of-latest feature
    * values, already renamed for output. */
  private def latestPerEntityRow(
      spark: SparkSession,
      fv: FeatureView,
      entityDf: DataFrame,
      entityTsCol: String,
      minTs: Any,
      maxTs: Any,
      fullFeatureNames: Boolean): DataFrame = {
    val src = fv.source.resolve(spark)
    val evtCol = fv.source.eventTimestampColumn
    val createdCol = fv.source.createdTimestampColumn
    // Validate structural columns (keys + timestamps) against the resolved
    // source up front — otherwise a misconfigured view surfaces as a deep
    // Catalyst analysis error. Declared FEATURES absent from the source are
    // silently dropped instead: the reference's own fixture declares
    // `avg_daily_trips` on a table without it and its tests pass
    // (tests/feast_tests_funcs.py:238-251).
    val srcCols = src.columns.toSet
    val structural = fv.entities ++ Seq(evtCol) ++ createdCol.toSeq
    val absent = structural.filterNot(srcCols.contains)
    if (absent.nonEmpty)
      throw new IllegalArgumentException(
        s"FeatureView '${fv.name}': column(s) ${absent.mkString(", ")} not " +
          s"present in source ${fv.source.resolvedName} " +
          s"(has: ${src.columns.mkString(", ")})")
    val featNames: Seq[String] =
      if (fv.features.nonEmpty) fv.features.filter(srcCols.contains)
      else src.columns.toSeq.filterNot(c =>
        fv.entities.contains(c) || c == evtCol || createdCol.contains(c))
    // ref: hive.py:590,713 — full_feature_names prefixes `{fv}__{feature}`.
    val prefix = if (fullFeatureNames) s"${fv.name}__" else ""
    val outNames = featNames.map(prefix + _)

    // Coarse range filter (J1 replacement): literals fold into the Parquet
    // scan's PushedFilters. Empty entity df ⇒ no candidates, schema intact.
    val coarse: DataFrame =
      if (maxTs == null) src.filter(lit(false))
      else {
        val upper = col(evtCol) <= lit(maxTs)
        val lower =
          if (fv.ttlSeconds > 0)
            col(evtCol) >=
              lit(minTs) - expr(s"INTERVAL ${fv.ttlSeconds} SECONDS")
          else lit(true)
        src.filter(upper && lower)
      }

    val feats = coarse.select(
      fv.entities.map(col) ++
        Seq(col(evtCol).as(EventTs)) ++
        createdCol.map(c => col(c).as(CreatedTs)).toSeq ++
        featNames.zip(outNames).map { case (f, o) => col(f).as(o) }: _*)

    // A1: distinct entity rows for the lookup (the full entity df is only
    // re-attached in the final left join).
    val entKeys = fv.entities :+ entityTsCol
    val entDistinct0 = entityDf.select(entKeys.map(col): _*).distinct()

    // J2: as-of inner join — equi on entity keys, range residual on ts.
    // Inclusive on both ends; ttl == 0 ⇒ unbounded lookback
    // (ref: hive.py:614-624, tests/feast_tests_funcs.py:263-269).
    def rangeCond(f: DataFrame, e: DataFrame): Column = {
      val upper = f(EventTs) <= e(entityTsCol)
      if (fv.ttlSeconds > 0)
        upper && f(EventTs) >= e(entityTsCol) -
          expr(s"INTERVAL ${fv.ttlSeconds} SECONDS")
      else upper
    }
    val joined: DataFrame =
      if (fv.entities.nonEmpty) {
        // Equi keys present: hash/SMJ on the keys, range as residual —
        // Catalyst/AQE picks broadcast when the entity side is small.
        val cond = fv.entities
          .map(k => feats(k) === entDistinct0(k))
          .foldLeft(rangeCond(feats, entDistinct0))(_ && _)
        feats.join(entDistinct0, cond, "inner")
      } else if (fv.ttlSeconds > 0) {
        // Entity-less + bounded TTL: TIME-BUCKETED range join. Bucket width
        // = ttl, so a feature row in [entity_ts - ttl, entity_ts] is always
        // in the entity's bucket or the one before — the entity side probes
        // both, turning the θ-join into a hash equi-join on the bucket id
        // (at 100 TB the alternative broadcast nested-loop is O(|feat|·|ts|)
        // and was the measured bottleneck at sf0.1 already).
        val w = fv.ttlSeconds * 1000000L
        val fB = feats.withColumn(Bkt, floor(unix_micros(col(EventTs)) / w))
        val eB = entDistinct0
          .withColumn(Bkt, explode(array(
            floor(unix_micros(col(entityTsCol)) / w),
            floor(unix_micros(col(entityTsCol)) / w) - 1)))
        fB.join(eB, fB(Bkt) === eB(Bkt) && rangeCond(fB, eB), "inner")
          .drop(Bkt)
      } else {
        // Entity-less + unbounded lookback: no bucketing possible — keep
        // the broadcast nested-loop with the (small) distinct-ts side
        // broadcast. Scales with |distinct entity ts|, documented.
        feats.join(broadcast(entDistinct0),
          rangeCond(feats, entDistinct0), "inner")
      }
    val entDistinct = entDistinct0

    // Flatten: entity key columns from the entity side, features from the
    // feature side (names are disjoint by construction).
    val flat = joined.select(
      entKeys.map(entDistinct(_)) ++
        Seq(col(EventTs)) ++
        createdCol.map(_ => col(CreatedTs)).toSeq ++
        outNames.map(col): _*)

    // W1-shaped latest pick: one window replaces A3 + A4 + J3.
    val order: Seq[Column] =
      (col(EventTs).desc +: createdCol.map(_ => col(CreatedTs).desc).toSeq) ++
        fv.tieBreakColumns.map(c => col(prefix + c).desc)
    val w = Window.partitionBy(entKeys.map(col): _*).orderBy(order: _*)
    flat
      .withColumn(Rn, row_number().over(w))
      .filter(col(Rn) === 1)
      .select((entKeys ++ outNames).map(col): _*)
  }
}
