package graft.pipeline

import org.apache.spark.sql.types._

/** Declared schemas for the cashback domain (reference: FIXTURES.md §A;
  * column lists from the GraphQL selection set `api.py:195` and
  * `rewards.csv:1`, renames from `pull_data_glue_job_lambda.py:56-61`).
  */
object Schemas {

  /** `transactions` after ingest renames/drops: `id→transaction_id`,
    * drop `is_debit`/`__typename` (reference pull_data_glue_job_lambda.py:56-57). */
  val transactions: StructType = StructType(Seq(
    StructField("transaction_id", StringType, nullable = false),
    StructField("model", StringType),
    StructField("user_id", StringType),
    StructField("currency", StringType),
    StructField("amount", LongType),          // integer pence, signed (negative = debit)
    StructField("date", TimestampType),
    StructField("type", StringType),          // mixes enum names and numeric codes — never infer int
    StructField("description", StringType),
  ))

  /** `rewards` after ingest renames: `amount→plu_amount`, `type→reward_type`,
    * `id→reward_id` (reference pull_data_glue_job_lambda.py:60-61). */
  val rewards: StructType = StructType(Seq(
    StructField("reward_id", StringType, nullable = false),
    StructField("user_id", StringType),
    StructField("plu_amount", DoubleType),    // PLU tokens, 8 d.p.
    StructField("rebate_rate", IntegerType),
    StructField("reward_type", StringType),
    StructField("reference_type", StringType),
    StructField("reference_id", StringType),  // FK → transactions.transaction_id
    StructField("available", BooleanType),
    StructField("reason", StringType),
    StructField("base_rate", IntegerType),
    StructField("staking_rate", IntegerType),
    StructField("subscription_plan", StringType),
    StructField("exchange_rate_id", StringType),
    StructField("fiat_amount_rewarded", DoubleType), // pence
    StructField("approved_by", StringType),
    StructField("createdAt", TimestampType),
    StructField("updatedAt", TimestampType),
    StructField("contis_transaction", StringType),   // python-dict-literal payload
    StructField("fiat_transaction", StringType),
  ))

  /** Nested payload of `fiat_transaction` (3-level path used by the reference:
    * `fiat_transaction.card_transactions.api_response.TransactionAmount`,
    * api.py:110-111). Declared to the depth the reference actually reads. */
  val fiatTransaction: StructType = StructType(Seq(
    StructField("id", StringType),
    StructField("clean_description", StringType),
    StructField("mcc", StringType),
    StructField("merchantIcon", StringType),
    StructField("card_transactions", StructType(Seq(
      StructField("api_response", StructType(Seq(
        StructField("TransactionAmount", StringType),
      ))),
    ))),
  ))

  /** The `cashback` fact table produced by the transform (glue_script.py:29-74):
    * 15 projected + 2 derived columns, partitioned by transaction_date. */
  val cashback: StructType = StructType(Seq(
    StructField("reward_id", StringType),
    StructField("transaction_id", StringType),
    StructField("description", StringType),
    StructField("plu_amount", DoubleType),
    StructField("transaction_date", StringType),       // yyyy-MM-dd partition key
    StructField("transaction_timestamp", TimestampType),
    StructField("available", BooleanType),
    StructField("reason", StringType),
    StructField("created_at", TimestampType),
    StructField("updated_at", TimestampType),
    StructField("rebate_rate", IntegerType),
    StructField("fiat_amount_rewarded", StringType),   // stringified (glue_script.py:68)
    StructField("currency", StringType),
    StructField("reference_type", StringType),
    StructField("reward_type", StringType),
    StructField("transaction_amount", DoubleType),
    StructField("plu_price", DoubleType),
  ))
}
