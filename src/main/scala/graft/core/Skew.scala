package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation utilities (SURVEY.md §4 "AQE skew" + manual salting for
  * the cases AQE can't fix: skewed GROUP BY keys, and skewed join keys when
  * the plan must stay a sort-merge join).
  *
  * Salting pattern: spray each hot key across `salts` sub-keys with a
  * deterministic per-row salt, aggregate partially per sub-key (stage 1 =
  * `salts`-way parallel), then combine sub-aggregates (stage 2 = tiny).
  * Results are identical to the unsalted aggregate for any distributive
  * aggregate — spec-asserted on synthetic zipf data.
  */
object Skew {

  /** Deterministic row salt in [0, salts): cheap, no RNG (reproducible
    * across retries — important, a random salt breaks task replays).
    */
  private def salt(on: Column, salts: Int): Column = pmod(hash(on), lit(salts))

  /** Two-stage salted count per key. */
  def saltedCount(df: DataFrame, key: String, on: Column, salts: Int = 16): DataFrame =
    df.withColumn("_salt", salt(on, salts))
      .groupBy(col(key), col("_salt"))
      .agg(count(lit(1)).as("_partial"))
      .groupBy(col(key))
      .agg(sum("_partial").as("n"))

  /** Two-stage salted sum of `value` per key. */
  def saltedSum(df: DataFrame, key: String, value: String, on: Column, salts: Int = 16): DataFrame =
    df.withColumn("_salt", salt(on, salts))
      .groupBy(col(key), col("_salt"))
      .agg(sum(col(value)).as("_partial"))
      .groupBy(col(key))
      .agg(sum("_partial").as(s"sum_$value"))

  /** Two-stage salted count+sum per key in one pass (the registered
    * q_salted_agg shape: one shuffle spread over `salts` sub-keys, one tiny
    * combine).
    */
  def saltedStats(df: DataFrame, key: String, value: String, on: Column, salts: Int = 16): DataFrame =
    df.withColumn("_salt", salt(on, salts))
      .groupBy(col(key), col("_salt"))
      .agg(count(lit(1)).as("_n"), sum(col(value)).as("_s"))
      .groupBy(col(key))
      .agg(sum("_n").as("n"), sum("_s").as(s"sum_$value"))

  /** Salted big-x-small join for a skewed join key: the big side gets a
    * deterministic salt, the small side is exploded `salts`x (one copy per
    * salt value), and the join key becomes (key, salt) — hot keys spread
    * over `salts` tasks. Semantics = plain inner equi-join.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String, on: Column,
                 salts: Int = 16): DataFrame = {
    val saltedBig = big.withColumn("_salt", salt(on, salts))
    val explodedSmall = small.withColumn("_salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedBig.join(explodedSmall, Seq(key, "_salt")).drop("_salt")
  }
}
