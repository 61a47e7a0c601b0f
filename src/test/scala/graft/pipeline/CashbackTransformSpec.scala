package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Pins the transform semantics, including the SURVEY §8 gotchas. */
class CashbackTransformSpec extends SparkSpec {
  import spark.implicits._

  private def rewards(rows: Seq[(String, Int, Double, Double, String)]) =
    rows.toDF("reward_id", "rebate_rate", "plu_amount", "fiat_amount_rewarded", "reference_id")
      .withColumn("user_id", lit("u")).withColumn("reward_type", lit("DAILY_REBATE_DISTRIBUTION"))
      .withColumn("reference_type", lit("fiat_transactions"))
      .withColumn("available", lit(true)).withColumn("reason", lit(null: String))
      .withColumn("base_rate", lit(0)).withColumn("staking_rate", lit(0))
      .withColumn("subscription_plan", lit(null: String))
      .withColumn("exchange_rate_id", lit(null: String))
      .withColumn("approved_by", lit(null: String))
      .withColumn("createdAt", lit("2024-03-25T06:43:56.272Z").cast("timestamp"))
      .withColumn("updatedAt", lit("2024-03-25T06:43:56.272Z").cast("timestamp"))
      .withColumn("contis_transaction", lit(null: String))
      .withColumn("fiat_transaction", lit(null: String))

  private def transactions(rows: Seq[(String, Long)]) =
    rows.toDF("transaction_id", "amount")
      .withColumn("model", lit("FiatTransaction")).withColumn("user_id", lit("u"))
      .withColumn("currency", lit("GBP"))
      .withColumn("date", lit("2024-03-23 23:38:39.009+00:00").cast("timestamp"))
      .withColumn("type", lit("CARD_SETTLEMENT"))
      .withColumn("description", lit("PIZZA"))

  test("plu_price uses elt.py semantics — rebate branch divides pence once (SURVEY §8.1)") {
    val r = rewards(Seq(("r1", 5, 0.09038461, 798.0, "t1")))
    val t = transactions(Seq(("t1", -1799L)))
    val out = CashbackTransform.transform(r, t).collect().head

    // abs(-1799)/100 * 5 / 0.09038461  (raw pence, divided by 100 exactly once)
    val expected = math.abs(-1799) / 100.0 * 5 / 0.09038461
    assert(math.abs(out.getAs[Double]("plu_price") - expected) < 1e-9)
    assert(out.getAs[Double]("transaction_amount") === 17.99)
  }

  test("plu_price zero-rebate branch reads fiat_amount_rewarded BEFORE rescale (SURVEY §8.2)") {
    val r = rewards(Seq(("r1", 0, 2.0, 798.0, "t1")))
    val t = transactions(Seq(("t1", -1799L)))
    val out = CashbackTransform.transform(r, t).collect().head
    // raw pence 798.0 / 2.0 tokens — NOT 7.98 / 2.0
    assert(out.getAs[Double]("plu_price") === 399.0)
    // ...while the output column itself is rescaled to pounds then stringified
    assert(out.getAs[String]("fiat_amount_rewarded") === "7.98")
  }

  test("left join keeps unmatched rewards with null transaction columns (J1)") {
    val r = rewards(Seq(("r1", 5, 1.0, 100.0, "missing")))
    val t = transactions(Seq(("t1", -500L)))
    val out = CashbackTransform.transform(r, t).collect()
    assert(out.length === 1)
    assert(out.head.getAs[String]("transaction_id") === null)
    assert(out.head.isNullAt(out.head.fieldIndex("transaction_amount")))
  }

  test("output schema matches the declared cashback contract") {
    val r = rewards(Seq(("r1", 5, 1.0, 100.0, "t1")))
    val t = transactions(Seq(("t1", -500L)))
    val out = CashbackTransform.transform(r, t)
    assert(out.schema.fieldNames.toSeq === Schemas.cashback.fieldNames.toSeq)
  }

  test("all-string CSV ingest (S1) still computes correctly via implicit casts (SURVEY §8.4)") {
    // simulate header-only CSV: everything string-typed
    val r = rewards(Seq(("r1", 5, 0.5, 200.0, "t1")))
      .select(Schemas.rewards.fieldNames.map(c => col(c).cast("string").as(c)): _*)
    val t = transactions(Seq(("t1", -1000L)))
      .select(Schemas.transactions.fieldNames.map(c => col(c).cast("string").as(c)): _*)
    val out = CashbackTransform.transform(r, t).collect().head
    assert(out.getAs[Double]("transaction_amount") === 10.0)
    assert(out.getAs[Double]("plu_price") === 10.0 * 5 / 0.5)
  }
}
