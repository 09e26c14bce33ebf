package graft.functions

import org.apache.spark.sql.{Column, GraftSql}
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Locks the loop-codegen cell expressions to the unrolled Catalyst
  * formulation they replaced (array_max / array_sort over per-centroid
  * struct terms): same fold arithmetic, same (sim, cid) tie order —
  * including EXACT ties from duplicated centroids, where the larger
  * cell id must win on both paths. */
class IvfCellOpsSpec extends SparkSpec {

  private val dim = 8

  // the HOF fold — bit-identical to DotProduct/the generated loop
  private def hofDot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, _ * _), lit(0.0), _ + _)

  /** The REPLACED formulation: one unrolled struct term per centroid. */
  private def oldArgmax(
      v: Column, nrm: Column, cents: Seq[(Seq[Double], Double)]): Column =
    array_max(array(cents.zipWithIndex.map { case ((cv, cn), j) =>
      struct((hofDot(v, typedlit(cv)) / (nrm * lit(cn))).as("s"),
        lit(j).as("cid"))
    }: _*)).getField("cid")

  private def oldTopCells(
      v: Column, nrm: Column, cents: Seq[(Seq[Double], Double)],
      nProbe: Int): Column =
    slice(reverse(array_sort(array(cents.zipWithIndex.map {
      case ((cv, cn), j) =>
        struct((hofDot(v, typedlit(cv)) / (nrm * lit(cn))).as("s"),
          lit(j).as("cid"))
    }: _*))), 1, nProbe).getField("cid")

  private def newArgmax(
      v: Column, nrm: Column, cents: Seq[(Seq[Double], Double)]): Column =
    GraftSql.column(ArgmaxCell(
      GraftSql.expression(v), GraftSql.expression(nrm),
      cents.map(_._1), cents.map(_._2)))

  private def newTopCells(
      v: Column, nrm: Column, cents: Seq[(Seq[Double], Double)],
      nProbe: Int): Column =
    GraftSql.column(TopCells(
      GraftSql.expression(v), GraftSql.expression(nrm),
      cents.map(_._1), cents.map(_._2), nProbe))

  private def withNorm(cv: Seq[Double]): (Seq[Double], Double) =
    (cv, math.sqrt(cv.foldLeft(0.0)((s, x) => s + x * x)))

  /** Seeded vectors + centroids, with centroid 3 DUPLICATING centroid 1
    * so every row's best-cell sim ties exactly for some rows. */
  private def fixture() = {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    def vec() = Seq.fill(dim)(rnd.nextDouble() * 2 - 1)
    val c0 = Seq.fill(5)(vec())
    val cents = (c0 :+ c0(1) :+ c0(3)).map(withNorm) // dup cids 5 and 6
    val rows = Seq.tabulate(500)(i => (i.toLong, vec().toArray))
      .toDF("id", "v")
      .withColumn("nrm", sqrt(hofDot(col("v"), col("v"))))
    (rows, cents)
  }

  test("ArgmaxCell equals the unrolled array_max formulation, ties included") {
    val (rows, cents) = fixture()
    val both = rows.select(
      oldArgmax(col("v"), col("nrm"), cents).as("old"),
      newArgmax(col("v"), col("nrm"), cents).as("nw"))
    assert(both.filter(col("old") =!= col("nw")).count() == 0)
    // the duplicated centroids force exact ties: cid 5 duplicates cid 1
    // and cid 6 duplicates cid 3, so the LARGER id must always win —
    // 1 and 3 can never be emitted, their duplicates must be
    val cells = both.select("nw").distinct()
      .collect().map(_.getInt(0)).toSet
    assert(cells.intersect(Set(5, 6)).nonEmpty,
      s"tie fixture never picked a duplicated-centroid cell: $cells")
    assert(!cells.contains(1) && !cells.contains(3),
      s"a tie resolved to the smaller cell id: $cells")
  }

  test("TopCells equals the unrolled sort-reverse-slice formulation") {
    val (rows, cents) = fixture()
    for (nProbe <- Seq(1, 3, 7)) {
      val both = rows.select(
        oldTopCells(col("v"), col("nrm"), cents, nProbe).as("old"),
        newTopCells(col("v"), col("nrm"), cents, nProbe).as("nw"))
      assert(both.filter(col("old") =!= col("nw")).count() == 0,
        s"nProbe=$nProbe diverged")
    }
  }

  test("ArgmaxCell survives whole-stage codegen at a large nList") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    def vec() = Seq.fill(dim)(rnd.nextDouble())
    val cents = Seq.fill(500)(vec()).map(withNorm) // would be ~8k unrolled terms
    val rows = Seq.tabulate(200)(i => (i.toLong, vec().toArray))
      .toDF("id", "v")
      .withColumn("nrm", sqrt(hofDot(col("v"), col("v"))))
    val out = rows.select(newArgmax(col("v"), col("nrm"), cents).as("c"))
    assert(out.filter(col("c") >= 0 && col("c") < 500).count() == 200)
  }
}
