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
  * `event_ts` wins; ties broken by greatest `created_ts`, then the view's
  * `tieBreakColumns`. Unmatched entity rows keep NULL features (final
  * join is LEFT).
  *
  * Two orchestrations with identical results (spec-asserted):
  *
  *  - [[getHistoricalFeatures]] — pure DataFrame API: coarse range from
  *    driver-side scalar min/max (constant-folds into Parquet pushdown,
  *    replacing the reference's J1 cartesian join), DISTINCT entity
  *    lookup, inner equi-join with the range residual (time-bucketed for
  *    entity-less views), ONE row_number window per view (replacing the
  *    reference's A3+A4+J3 chain), LEFT join-back on (keys, ts);
  *  - [[getHistoricalFeaturesNative]] — each view is one
  *    [[graft.plans.AsOfJoin]] (custom sort-merge operator): no distinct,
  *    no window, no join-back; ~2× fewer shuffles per view.
  *
  * At scale: the only data-sized shuffles are per-view joins keyed on the
  * entity keys; the feature scan is pre-filtered by the pushed-down
  * coarse range; nothing but two scalar aggregates reaches the driver.
  */
object PointInTime {

  private val EventTs = "__graft_event_ts"
  private val CreatedTs = "__graft_created_ts"
  private val OrderTs = "__graft_order_ts"
  private val Rn = "__graft_rn"
  private val Bkt = "__graft_bkt"

  /** Validated, coarse-filtered, renamed feature relation for one view:
    * columns = entities ++ EventTs ++ [CreatedTs] ++ prefixed features. */
  private final case class ViewRel(
      feats: DataFrame, outNames: Seq[String], hasCreated: Boolean,
      prefix: String)

  private def prepareView(
      spark: SparkSession,
      fv: FeatureView,
      minTs: Any,
      maxTs: Any,
      fullFeatureNames: Boolean): ViewRel = {
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
    ViewRel(feats, outNames, createdCol.isDefined, prefix)
  }

  private def entityBounds(
      entityDf: DataFrame, entityTsCol: String): (Any, Any) = {
    // A2: driver-side scalar min/max of the entity ts (null ⇔ empty df).
    val bounds: Row =
      entityDf.agg(min(col(entityTsCol)), max(col(entityTsCol))).head()
    (bounds.get(0), bounds.get(1))
  }

  private def validateEntityDf(
      entityDf: DataFrame, views: Seq[FeatureView],
      entityTsCol: String): Unit = {
    // ref: hive.py:222-224 — assert expected columns in the entity df.
    val expected = views.flatMap(_.entities).distinct :+ entityTsCol
    val missing = expected.filterNot(entityDf.columns.contains)
    if (missing.nonEmpty)
      throw new EntityDfMissingColumnsError(expected, missing)
  }

  def getHistoricalFeatures(
      entityDf: DataFrame,
      views: Seq[FeatureView],
      entityTsCol: String = "event_timestamp",
      fullFeatureNames: Boolean = false): DataFrame = {
    val spark = entityDf.sparkSession
    validateEntityDf(entityDf, views, entityTsCol)
    val (minTs, maxTs) = entityBounds(entityDf, entityTsCol)

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
    * null attachment natively. Same results as [[getHistoricalFeatures]]
    * (spec-asserted), including created-ts and tieBreakColumns ordering,
    * which are folded into one lexicographic order column. */
  def getHistoricalFeaturesNative(
      entityDf: DataFrame,
      views: Seq[FeatureView],
      entityTsCol: String = "event_timestamp",
      fullFeatureNames: Boolean = false): DataFrame = {
    val spark = entityDf.sparkSession
    validateEntityDf(entityDf, views, entityTsCol)
    val (minTs, maxTs) = entityBounds(entityDf, entityTsCol)

    views.foldLeft(entityDf) { (acc, fv) =>
      val rel = prepareView(spark, fv, minTs, maxTs, fullFeatureNames)
      // The native operator takes ONE ascending tie-break column; fold
      // (created_ts, tieBreakColumns...) into a lexicographic struct so
      // "last row in sort order" == the compositional window's
      // (created DESC, tieBreaks DESC) pick.
      val orderNames =
        (if (rel.hasCreated) Seq(CreatedTs) else Nil) ++
          fv.tieBreakColumns.map(rel.prefix + _)
      val (feats, orderCol) = orderNames match {
        case Seq()    => (rel.feats, None)
        case Seq(one) => (rel.feats, Some(one))
        case many =>
          (rel.feats.withColumn(OrderTs, struct(many.map(col): _*)),
            Some(OrderTs))
      }
      graft.plans.AsOf.join(
        acc, feats, fv.entities, entityTsCol, EventTs,
        orderCol, fv.ttlSeconds)
        .drop(EventTs).drop(CreatedTs).drop(OrderTs)
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
    val rel = prepareView(spark, fv, minTs, maxTs, fullFeatureNames)
    val feats = rel.feats

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
        (if (rel.hasCreated) Seq(col(CreatedTs)) else Nil) ++
        rel.outNames.map(col): _*)

    // W1-shaped latest pick: one window replaces A3 + A4 + J3.
    val order: Seq[Column] =
      (col(EventTs).desc +:
        (if (rel.hasCreated) Seq(col(CreatedTs).desc) else Nil)) ++
        fv.tieBreakColumns.map(c => col(rel.prefix + c).desc)
    val w = Window.partitionBy(entKeys.map(col): _*).orderBy(order: _*)
    flat
      .withColumn(Rn, row_number().over(w))
      .filter(col(Rn) === 1)
      .select((entKeys ++ rel.outNames).map(col): _*)
  }
}
