package graft.pipeline

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/** S4: the GraphQL `transactions_view` query semantics (reference api.py:179-200,
  * query text :195): date-range + type-equality filter, sort desc by date,
  * limit/offset pagination, and a count aggregate under the same filter.
  *
  * In the reference these are pushed down to the GraphQL server; here the
  * same predicates are declarative DataFrame ops, so Catalyst pushes them
  * into the parquet scan (PushedFilters) — the Spark-native analog of
  * source pushdown (SURVEY §4).
  */
object TransactionsView {

  def query(tx: DataFrame, from: String, to: String, txType: String,
            limit: Int, offset: Int = 0): DataFrame =
    tx.where(col("date").between(from, to) && col("type") === txType)
      .orderBy(col("date").desc)
      .offset(offset).limit(limit)

  /** The `transactions_view_aggregate { totalCount }` companion (api.py:195). */
  def totalCount(tx: DataFrame, from: String, to: String, txType: String): Long =
    tx.where(col("date").between(from, to) && col("type") === txType).count()
}
