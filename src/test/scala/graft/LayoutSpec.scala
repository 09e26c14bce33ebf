package graft

import org.apache.spark.sql.functions._

/** Z-order layout: Morton-key correctness on known bit patterns, and the
  * actual FILE-SKIPPING effect — the reason the operator exists — proved
  * on real footer-range arithmetic over written parquet. */
class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("Morton codes match hand-interleaved bit patterns") {
    val got = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L), (3L, 5L),
      (65535L, 65535L))
      .toDF("x", "y")
      .select(Layout.zOrder2(col("x"), col("y")).as("z"))
      .as[Long].collect().toSeq
    // spread(3)=0b101=5, spread(5)=0b10001=17 → 5 | (17<<1) = 39
    assert(got == Seq(0L, 1L, 2L, 3L, 39L, 4294967295L))
  }

  test("x_zorder_layout buckets bound BOTH dims; linear leaves dim-2 full") {
    // the declared query's semantic claim, pinned on the real table:
    // every z bucket's span is a strict fraction of each key's range
    // (2 pk bits + 3 sk bits of the top-5 Morton bits → ≤ range/4 and
    // ≤ range/8 + grid rounding), while every LINEAR bucket leaves the
    // second key at its full range — the footer min/max a suppkey
    // predicate could never prune.
    val dir = "/root/testdata/sf0.001"
    val out = graft.queries.CoreQueries.queries("x_zorder_layout")(
      spark, dir).collect()
    // ≤ 32 buckets with a populated-bucket floor, not == 32: the exact
    // bucket count is data-distribution-dependent (an empty top-5-bit
    // bucket at a different fixture scale is not a query bug) —
    // ADVICE r14. The sf0.001 fixture happens to populate all 32.
    assert(out.length <= 32 && out.length >= 16,
      s"bucket count ${out.length} outside [16, 32]")
    val li = Tables.read(spark, dir, "lineitem")
      .agg(max(col("l_partkey")) - min(col("l_partkey")),
        max(col("l_suppkey")) - min(col("l_suppkey"))).head()
    val (pkRange, skRange) = (li.getLong(0), li.getLong(1))
    assert(out.forall(_.getAs[Long]("z_pk_span") <= pkRange / 4 + 2))
    assert(out.forall(_.getAs[Long]("z_sk_span") <= skRange / 8 + 2))
    // linear buckets leave the second key NEAR its full range (the
    // pruning blind spot); ≥ 90% rather than == full range, so one
    // supplier missing from one bucket at a different fixture scale
    // can't fail a correct query — ADVICE r14
    assert(out.forall(_.getAs[Long]("lin_sk_span") >= skRange * 9 / 10))
    assert(out.map(_.getAs[Long]("n_z")).sum ==
      out.map(_.getAs[Long]("n_lin")).sum)
  }

  test("z-ordered files prune on the SECOND dimension; linear sort cannot") {
    // symmetric 8-bit × 8-bit grid — the shape z-ordering exists for
    // (asymmetric bit widths degrade it toward linear sort, honestly)
    val grid = spark.range(65536).select(
      (col("id") / 256).cast("long").as("x"),
      (col("id") % 256).cast("long").as("y"),
      col("id").as("payload"))
    val (yLo, yHi) = (0L, 63L) // y-only box: the linear layout's blind spot

    def prunableFiles(path: String): (Int, Int) = {
      val byFile = spark.read.parquet(path)
        .withColumn("f", input_file_name())
        .groupBy("f").agg(min("y").as("ymin"), max("y").as("ymax"))
        .collect()
      val total = byFile.length
      val mustRead = byFile.count { r =>
        r.getAs[Long]("ymax") >= yLo && r.getAs[Long]("ymin") <= yHi
      }
      (total, mustRead)
    }

    val zDir = "tmp_layout_z"
    val linDir = "tmp_layout_lin"
    Layout.writeZOrdered(grid, "x", "y", zDir, nFiles = 16)
    grid.repartitionByRange(16, col("x"))
      .sortWithinPartitions("x")
      .write.mode("overwrite").parquet(linDir)
    try {
      val (zTotal, zRead) = prunableFiles(zDir)
      val (lTotal, lRead) = prunableFiles(linDir)
      assert(zTotal >= 8 && lTotal >= 8, "need a real multi-file layout")
      // a 16-file z-layout cuts on the top 4 z-bits → 4×4 tiles of the
      // (x, y) plane: y ∈ [0, 63] touches one tile row = 1/4 of files.
      // The x-sorted layout has every y in every file: reads ALL.
      assert(zRead.toDouble / zTotal <= 0.5,
        s"z-order read $zRead/$zTotal files")
      assert(lRead == lTotal,
        s"x-sorted layout unexpectedly pruned y ($lRead/$lTotal)")
      // and the layout is only a permutation: same rows
      val a = spark.read.parquet(zDir).orderBy("payload").collect().toSeq
      val b = grid.orderBy("payload").collect().toSeq
      assert(a == b)
    } finally {
      rm(zDir); rm(linDir)
    }
  }

  private def rm(d: String): Unit = {
    def go(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).foreach(go)
      f.delete(); ()
    }
    go(new java.io.File(d))
  }

  test("compaction bin-packs to the byte target, preserves rows, restores pruning") {
    val fragDir = "tmp_layoutspec_frag"
    val outDir = "tmp_layoutspec_compact"
    val outSorted = "tmp_layoutspec_compact_sorted"
    try {
      // a CDC-fragmented table: 64 tiny files
      val t = spark.range(20000).select(col("id").as("k"),
        (col("id") % 997).as("v"))
      t.repartition(64).write.mode("overwrite").parquet(fragDir)

      def files(d: String) = {
        def go(f: java.io.File): Seq[java.io.File] =
          if (f.isDirectory)
            Option(f.listFiles()).getOrElse(Array.empty).toSeq.flatMap(go)
          else Seq(f).filter(_.getName.endsWith(".parquet"))
        go(new java.io.File(d))
      }
      val total = files(fragDir).map(_.length).sum
      val target = total / 4 + 1 // expect ceil(total/target) = 4 files

      val (nb, na) = Layout.compactParquet(spark, fragDir, outDir, target)
      assert(nb == 64 && na == ((total + target - 1) / target).toInt &&
        na <= 4)
      // row multiset survives the rewrite
      assert(spark.read.parquet(outDir).orderBy("k").collect().toSeq ==
        t.orderBy("k").collect().toSeq)

      // sorted compaction leaves key ranges DISJOINT across files — the
      // min/max pruning property the fragmented layout lost
      Layout.compactParquet(spark, fragDir, outSorted, target,
        sortCols = Seq("k"))
      val ranges = files(outSorted).map { f =>
        val d = spark.read.parquet(f.getPath)
        val r = d.agg(min("k"), max("k")).head()
        (r.getLong(0), r.getLong(1))
      }.sortBy(_._1)
      assert(ranges.size > 1 &&
        ranges.sliding(2).forall {
          case Seq((_, hi), (lo, _)) => hi < lo
          case _ => true
        })
    } finally { rm(fragDir); rm(outDir); rm(outSorted) }
  }

  test("compaction refuses outDir == inDir (overwrite-while-reading)") {
    val d = "tmp_layoutspec_selfcompact"
    try {
      spark.range(10).write.mode("overwrite").parquet(d)
      val e = intercept[IllegalArgumentException] {
        Layout.compactParquet(spark, d, d, 1L << 20)
      }
      assert(e.getMessage.contains("must differ"))
    } finally { rm(d) }
  }

  // ── compaction PLANNING (the metadata stage) ───────────────────────

  private def plan(files: Seq[(String, String, Long)], target: Long) = {
    import spark.implicits._
    Layout.compactionPlan(files.toDF("part", "file_id", "size_bytes"),
        "part", "file_id", "size_bytes", target)
      .as[(String, Long, Long, Long, Long)].collect().toSeq
  }

  test("plan groups preserve files and bytes; every group total is " +
    "bounded by target + its largest member") {
    val files = (1 to 37).map(i =>
      ("p" + (i % 3), "f" + i, (i * 997L) % 5000 + 100))
    val target = 6000L
    val out = plan(files, target)
    assert(out.map(_._3).sum == files.size)
    assert(out.map(_._4).sum == files.map(_._3).sum)
    assert(out.forall { case (_, _, _, total, maxF) =>
      total <= target + maxF })
  }

  test("an oversized file is isolated in its own group (size-DESC fill " +
    "places it before anything can share)") {
    val files = Seq(("p", "big", 50000L), ("p", "a", 100L),
      ("p", "b", 120L), ("p", "c", 90L))
    val out = plan(files, 1000L)
    val bigGroup = out.filter(_._5 == 50000L)
    assert(bigGroup.size == 1 && bigGroup.head._3 == 1L)
    // the small files share a different group
    assert(out.filter(_._5 != 50000L).map(_._3).sum == 3L)
  }

  test("the plan is deterministic under repartitioning") {
    import spark.implicits._
    val df = (1 to 200).map(i =>
      ("p" + (i % 7), "f" + i, (i * 131L) % 3000 + 50))
      .toDF("part", "file_id", "size_bytes")
    def run(d: org.apache.spark.sql.DataFrame) =
      Layout.compactionPlan(d, "part", "file_id", "size_bytes", 4000L)
        .as[(String, Long, Long, Long, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
    assert(run(df) == run(df.repartition(17)))
  }

  test("compactByPlan rewrites every group as exactly ONE physical file " +
    "and conserves rows") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("cbp").toFile
    try {
      // 40 rows across 12 input "files", ragged sizes
      val rows = (1 to 40).map(i =>
        ("m" + (i % 2), "f" + (i % 12), "payload" * (i % 5 + 1), i))
        .toDF("part", "file_id", "payload", "v")
      val listing = rows.groupBy("part", "file_id")
        .agg(org.apache.spark.sql.functions.sum(
          org.apache.spark.sql.functions.length($"payload")).as("size_bytes"))
      val assign = Layout.compactionAssign(listing, "part", "file_id",
        "size_bytes", targetBytes = 100L)
      val out = new java.io.File(tmp, "out").getAbsolutePath
      val rb = Layout.compactByPlan(
        rows.select("file_id", "payload", "v"), assign, "part", "file_id",
        out)
      // rows conserved, every (part, grp) dir holds exactly one file
      assert(rb.count() == 40L)
      val perGroup = rb
        .withColumn("fn", org.apache.spark.sql.functions.input_file_name())
        .groupBy("part", "grp")
        .agg(org.apache.spark.sql.functions.countDistinct($"fn").as("nf"))
        .as[(String, Int, Long)].collect()
      assert(perGroup.nonEmpty && perGroup.forall(_._3 == 1L),
        perGroup.mkString(", "))
      // group count on disk == planned group count
      val planned = assign.select("part", "grp").distinct().count()
      assert(perGroup.length.toLong == planned)
      // value checksum survives the rewrite
      assert(rb.agg(org.apache.spark.sql.functions.sum($"v")).head.getLong(0)
        == (1 to 40).sum.toLong)
    } finally {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles.foreach(rm); f.delete()
      }
      rm(tmp)
    }
  }
}
