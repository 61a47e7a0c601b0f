package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SkewJoinSpec extends SparkSpec {
  import spark.implicits._

  test("salted join returns exactly the plain join's result on skewed data") {
    // 90% of rows share one hot key
    val big = (1 to 2000).map(i => (if (i % 10 == 0) i.toLong else 7L, i))
      .toDF("k", "payload")
    val small = Seq((7L, "hot"), (10L, "ten"), (20L, "twenty"), (999L, "absent-from-big"))
      .toDF("k", "name")
    val plain = big.join(small, Seq("k")).select("k", "payload", "name")
    val salted = SkewJoin.saltedJoin(big, small, "k", buckets = 8)
      .select("k", "payload", "name")
    assert(salted.count() === plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("left joins preserve unmatched rows through salting") {
    val big = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
    val small = Seq((1L, "x")).toDF("k", "w")
    val out = SkewJoin.saltedJoin(big, small, "k", buckets = 4, joinType = "left")
    assert(out.count() === 3)
    assert(out.where(col("w").isNull).count() === 2)
  }

  test("right/full outer joins are rejected — replication would duplicate unmatched rows") {
    // regression: before the guard, an unmatched small-side row was emitted
    // `buckets` times under right/full outer
    val big = Seq((1L, "a")).toDF("k", "v")
    val small = Seq((1L, "x"), (2L, "unmatched")).toDF("k", "w")
    val e = intercept[IllegalArgumentException] {
      SkewJoin.saltedJoin(big, small, "k", buckets = 4, joinType = "right_outer")
    }
    assert(e.getMessage.contains("saltedJoin"))
    intercept[IllegalArgumentException] {
      SkewJoin.saltedJoin(big, small, "k", buckets = 4, joinType = "full")
    }
  }
}
