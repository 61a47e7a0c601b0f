package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** The warehouse layout writes facts `partitionBy(date)` (S7); this spec
  * proves a date predicate prunes at the directory level — the scan reads
  * only the matching partition's files, which is what makes time-range
  * queries at 100 TB touch GBs instead of the whole table. */
class PartitionPruningSpec extends SparkSpec {

  private def scanOf(df: org.apache.spark.sql.DataFrame): FileSourceScanExec = {
    df.collect()
    val plan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    plan.collectFirst { case s: FileSourceScanExec => s }.get
  }

  test("date-partitioned write + equality predicate reads exactly one partition") {
    val dir = java.nio.file.Files.createTempDirectory("graft_prune").toString
    try {
      // Tables.events owns the ts normalization (nanos-era long vs the
      // micros TIMESTAMP the round-13 testdata writes) — never convert raw
      graft.sources.Tables.events(spark, sf)
        .withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
        .write.mode("overwrite").partitionBy("day").parquet(dir)

      val all = spark.read.parquet(dir)
      val nDays = all.select("day").distinct().count()
      assert(nDays > 5, s"fixture should span many days, got $nDays")

      val pruned = all.where(col("day") === "2024-01-05")
      val scan = scanOf(pruned)
      assert(scan.metadata("PartitionFilters").contains("day"),
        "predicate must appear as a partition filter, not a data filter")
      val filesRead = scan.metrics("numFiles").value
      val filesTotal = scanOf(all).metrics("numFiles").value
      assert(filesRead > 0 && filesRead < filesTotal / 2,
        s"pruning should skip most partitions: read $filesRead of $filesTotal")
    } finally org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
  }
}
