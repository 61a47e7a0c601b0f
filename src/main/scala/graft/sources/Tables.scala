package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver's TPC-H-ish testdata (see TESTDATA.md).
  *
  * Every loader is a plain parquet scan so Catalyst's pushdown / pruning /
  * vectorized reader apply end-to-end. `events` needs one conditional
  * normalization: through round 12 the driver wrote `ts` as parquet INT64
  * TIMESTAMP(NANOS), which Spark reads as a raw long (nanosAsLong=true, set
  * in [[graft.GraftSession]]) and we convert to microsecond TimestampType
  * the same way DuckDB does (truncation); round-13 testdata writes
  * TIMESTAMP(MICROS) directly, which needs none. The LongType guard serves
  * both eras — and every reader of `events` MUST come through here rather
  * than normalize a raw scan itself (two specs that did broke silently when
  * the era changed).
  */
object Tables {

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    // Integer division (`div`), not `/`: at 2024-era nanos (~1.7e18) a double's
    // ulp is 256 ns, so double division + cast truncates one micro low on some
    // rows, diverging from DuckDB's exact integer truncation.
    if (name == "events" && df.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else df
  }

  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame = table(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = table(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame = table(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame = table(s, d, "region")
  def events(s: SparkSession, d: String): DataFrame = table(s, d, "events")
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
