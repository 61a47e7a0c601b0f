package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Z-order layout: bit-exactness of the Morton key against a Scala
  * reference, and the data-skipping property the layout exists for —
  * per-file min/max extents under writeZordered are tight on BOTH
  * dimensions at once, where a linear sort is tight on one. */
class LayoutSpec extends SparkSpec {
  import spark.implicits._

  private def mortonRef(x: Long, y: Long, bits: Int): Long = {
    var z = 0L
    var j = 0
    while (j < bits) {
      z |= ((x >> j) & 1L) << (2 * j + 1)
      z |= ((y >> j) & 1L) << (2 * j)
      j += 1
    }
    z
  }

  test("zorderKey matches the reference interleave bit for bit") {
    val rnd = new scala.util.Random(42)
    val pts = Seq.fill(500)((rnd.nextInt(256).toLong, rnd.nextInt(256).toLong))
    val got = pts.toDF("x", "y")
      .select(col("x"), col("y"),
        Layout.zorderKey(Seq(col("x"), col("y")), 8).as("z"))
      .as[(Long, Long, Long)].collect()
    got.foreach { case (x, y, z) =>
      assert(z === mortonRef(x, y, 8), s"($x,$y)")
    }
    // corners: key space is exactly [0, 2^16)
    val corners = Seq((0L, 0L), (255L, 255L), (255L, 0L), (0L, 255L))
      .toDF("x", "y")
      .select(Layout.zorderKey(Seq(col("x"), col("y")), 8)).as[Long].collect()
    assert(corners.toSet === Set(0L, 65535L, 43690L, 21845L))
  }

  test("out-of-range inputs are masked per bit lane, never corrupt neighbors") {
    val z = Seq((256L + 3L, 1L)).toDF("x", "y")
      .select(Layout.zorderKey(Seq(col("x"), col("y")), 8)).as[Long].head()
    assert(z === mortonRef(3L, 1L, 8), "bit 8 of x must be dropped, not shifted into y's lane")
  }

  test("zorderKey rejects degenerate shapes") {
    intercept[IllegalArgumentException] { Layout.zorderKey(Seq(col("x")), 8) }
    intercept[IllegalArgumentException] {
      Layout.zorderKey(Seq(col("x"), col("y")), 32)
    }
  }

  test("optimizeZordered rewrites in place: same rows, z-ordered layout, count returned") {
    val dir = java.nio.file.Files.createTempDirectory("graft-opt").toString
    try {
      val li = spark.read.parquet(s"$sf/lineitem.parquet")
        .select(col("l_orderkey"), col("l_linenumber"),
          pmod(xxhash64(col("l_orderkey"), col("l_linenumber")), lit(256)).as("x"),
          pmod(xxhash64(col("l_partkey")), lit(256)).as("y"))
      li.write.parquet(s"$dir/t") // arrival-order layout
      val before = spark.read.parquet(s"$dir/t")
        .orderBy("l_orderkey", "l_linenumber", "x", "y").collect()
      val n = Layout.optimizeZordered(spark, s"$dir/t",
        Seq(col("x"), col("y")), 8, numFiles = 8)
      assert(n === before.length)
      val after = spark.read.parquet(s"$dir/t")
      assert(after.orderBy("l_orderkey", "l_linenumber", "x", "y").collect()
        .sameElements(before), "optimize must not change the rows")
      // layout property: within each output file the z-key is clustered —
      // per-file z-extents are disjoint-ish vs one big overlap pre-optimize
      val zc = after.withColumn("f", input_file_name())
        .groupBy("f")
        .agg(min(Layout.zorderKey(Seq(col("x"), col("y")), 8)).as("lo"),
          max(Layout.zorderKey(Seq(col("x"), col("y")), 8)).as("hi"))
        .select("lo", "hi").orderBy("lo").collect()
      assert(zc.length >= 2)
      val overlaps = zc.sliding(2).count {
        case Array(a, b) => b.getLong(0) <= a.getLong(1)
        case _ => false
      }
      assert(overlaps === 0, "range-partitioned z-key files must not overlap")
      assert(!new java.io.File(s"$dir/t_optimizing").exists(), "staging must be gone")
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    }
  }

  test("optimizeZordered heals a crash: the retired copy always wins; pre-swap staging is discarded") {
    import org.apache.hadoop.fs.Path
    val dir = java.nio.file.Files.createTempDirectory("graft-heal").toString
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    try {
      val li = spark.read.parquet(s"$sf/lineitem.parquet")
        .select(col("l_orderkey"), col("l_linenumber"),
          pmod(col("l_partkey"), lit(256)).as("x"),
          pmod(col("l_suppkey"), lit(256)).as("y"))
      li.write.parquet(s"$dir/t")
      val want = spark.read.parquet(s"$dir/t")
        .orderBy("l_orderkey", "l_linenumber", "x", "y").collect()
      // crash A: after retire, before fresh→live (live tree MISSING) — the
      // worst instant. Simulate: move live into staging/retired, leave a
      // half-written fresh.
      fs.mkdirs(new Path(s"$dir/t_optimizing"))
      assert(fs.rename(new Path(s"$dir/t"), new Path(s"$dir/t_optimizing/retired")))
      fs.mkdirs(new Path(s"$dir/t_optimizing/fresh"))
      val n = Layout.optimizeZordered(spark, s"$dir/t",
        Seq(col("x"), col("y")), 8, numFiles = 4)
      assert(n === want.length, "heal must restore the retired table before optimizing")
      assert(spark.read.parquet(s"$dir/t")
        .orderBy("l_orderkey", "l_linenumber", "x", "y").collect().sameElements(want))
      // crash B: staging with only a fresh tree (no destructive step yet) —
      // discarded, table untouched
      fs.mkdirs(new Path(s"$dir/t_optimizing/fresh"))
      val n2 = Layout.optimizeZordered(spark, s"$dir/t",
        Seq(col("x"), col("y")), 8, numFiles = 4)
      assert(n2 === want.length)
      assert(spark.read.parquet(s"$dir/t")
        .orderBy("l_orderkey", "l_linenumber", "x", "y").collect().sameElements(want))
      intercept[IllegalArgumentException] {
        Layout.optimizeZordered(spark, s"$dir/absent", Seq(col("x"), col("y")), 8, 4)
      }
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    }
  }

  test("writeZordered beats a linear sort on expected files scanned for single-dim predicates") {
    // The honest skipping metric: for a point predicate on one dim, the
    // expected fraction of files whose [min,max] on that dim contains a
    // uniform random point — averaged over BOTH dims. A linear sort is
    // perfect on its sort key and useless on the other (≈ (1/F + 1)/2);
    // Z-order is ≈ sqrt-balanced on both. (An extent-PRODUCT comparison
    // would be vacuous: any perfect partition of N cells into F files has
    // product ≈ N/F regardless of shape.)
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .select(
        pmod(xxhash64(col("l_orderkey"), col("l_linenumber")), lit(256)).as("x"),
        pmod(xxhash64(col("l_partkey")), lit(256)).as("y"))
    val dir = java.nio.file.Files.createTempDirectory("graft-layout").toString
    try {
      Layout.writeZordered(li, Seq(col("x"), col("y")), 8, s"$dir/z", numFiles = 16)
      li.repartitionByRange(16, col("x")).sortWithinPartitions(col("x"))
        .write.mode("overwrite").parquet(s"$dir/linear")
      def meanHitFraction(path: String): Double = {
        val fracs = spark.read.parquet(path)
          .withColumn("f", input_file_name())
          .groupBy("f")
          .agg((((max(col("x")) - min(col("x")) + 1) / 256.0) +
            ((max(col("y")) - min(col("y")) + 1) / 256.0)).as("fr"))
          .agg(avg(col("fr")) / 2.0).as[Double].head()
        fracs
      }
      val zFrac = meanHitFraction(s"$dir/z")
      val linFrac = meanHitFraction(s"$dir/linear")
      // 16 files: linear ≈ (1/16 + 1)/2 ≈ 0.53; z-order ≈ (1/4 + 1/4)/2 = 0.25
      assert(zFrac < linFrac * 0.7,
        s"z-order mean hit fraction $zFrac must beat linear $linFrac by ≥30%")
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    }
  }
}
