package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation helpers. AQE's skew-join split handles most cases
  * at runtime; explicit salting is the plan-level tool when one key
  * dominates an aggregation or join so badly that a single reducer
  * would own it (the 100 TB failure mode: one hot user / hot dedup
  * bucket pins a task for hours).
  */
object Salted {

  /** Two-phase salted aggregation: groupBy (key, salt) with partial
    * aggregation, then re-aggregate by key. The hot key's rows spread
    * over `salts` reducers in phase 1; phase 2 touches only
    * `salts` pre-aggregated rows per key. Works for any algebraic
    * aggregate supplied as (partial, merge) column pairs.
    */
  def saltedCountSum(df: DataFrame, key: Column, valueCol: Column,
                     salts: Int): DataFrame = {
    val salted = df.withColumn("__salt", pmod(spark_partition_id() + monotonically_increasing_id(), lit(salts)))
    salted
      .groupBy(key.as("k"), col("__salt"))
      .agg(count(lit(1)).as("pc"), sum(valueCol).as("ps"))
      .groupBy(col("k"))
      .agg(sum(col("pc")).as("n"), sum(col("ps")).as("total"))
  }

  /** Salted broadcast-free join for a skewed fact against a small-ish
    * dim that is still too big to broadcast whole: replicate the dim
    * `salts` times, salt the fact rows, join on (key, salt). Shuffle
    * of the fact spreads each hot key across `salts` partitions. */
  def saltedJoin(fact: DataFrame, dim: DataFrame, factKey: String,
                 dimKey: String, salts: Int): DataFrame = {
    val saltedFact = fact.withColumn("__salt",
      pmod(monotonically_increasing_id(), lit(salts)))
    val replicatedDim = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedFact.join(replicatedDim,
      saltedFact(factKey) === replicatedDim(dimKey) &&
        saltedFact("__salt") === replicatedDim("__salt"))
      .drop("__salt")
  }
}
