package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Bit-parity of the native md5_long against the built-in route it
  * replaced — the cross-engine oracle contract depends on exact equality
  * for EVERY input. */
class Md5LongSpec extends SparkSpec {
  import spark.implicits._

  private def builtinRoute(c: org.apache.spark.sql.Column) =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  test("bit-parity with conv(substring(md5)) on corpus tokens and adversarial strings") {
    val corpus = spark.read.parquet(s"$sf/documents.parquet")
      .select(explode(split(col("text"), " ")).as("s"))
    val adversarial = Seq("", " ", "a", "é中文😀",
      "line\nbreak", "tab\there", "x" * 10000).toDF("s")
    Seq(corpus, adversarial.union(corpus.limit(0))).foreach { df =>
      val bad = df.where(Md5LongFunction.md5Long(col("s")) =!= builtinRoute(col("s"))).count()
      assert(bad === 0, "native md5_long must equal the conv route for every input")
    }
    // spot-pin one known digest: md5("") = d41d8cd98f00b204e9800998ecf8427e
    val empty = Seq("").toDF("s")
      .select(Md5LongFunction.md5Long(col("s"))).as[Long].head()
    assert(empty === java.lang.Long.parseLong("d41d8cd98f00b20", 16))
  }

  test("hash is non-negative, 60-bit, null-propagating, and SQL-registered") {
    val vals = Seq("a", "b", "c").toDF("s")
      .select(Md5LongFunction.md5Long(col("s")).as("h")).as[Long].collect()
    assert(vals.forall(v => v >= 0 && v < (1L << 60)))
    val n = Seq[Option[String]](None).toDF("s")
      .select(Md5LongFunction.md5Long(col("s"))).collect().head
    assert(n.isNullAt(0))
    val viaSql = spark.sql("SELECT md5_long('a')").as[Long].head()
    assert(viaSql === vals(0))
  }
}
