package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation operators for hot keys at scale.
  *
  * AQE's runtime skew-join splitting covers most cases; these are the
  * explicit, plan-time tools for the two shapes AQE doesn't rewrite:
  * a single hot group in an aggregation, and a broadcast-too-big build
  * side with a skewed probe key.
  *
  * Both are pure DataFrame transforms producing the same rows as their
  * unsalted equivalents (asserted by spec); only the shuffle layout
  * changes: a hot key's rows spread over `salts` partitions instead of
  * one straggler task. Note the usual floating-point caveat: salting a
  * double sum changes accumulation order, so results are exact-equal for
  * integer/decimal values and equal-up-to-ulps for doubles — use decimal
  * inputs where bit-reproducibility matters (see the oracle protocol).
  */
object Skew {

  /** Two-phase salted aggregation of distributive aggregates (sum/count):
    * phase 1 groups by (keys, salt) — splitting each hot key `salts`
    * ways — phase 2 combines the partials by key. `saltSource` must be a
    * column that varies within a key group (a row id / event id) so rows
    * spread deterministically.
    */
  def saltedSumCount(df: DataFrame, keys: Seq[String], valueCol: String,
                     saltSource: Column, salts: Int): DataFrame = {
    val keyCols = keys.map(col)
    df.withColumn("__salt", pmod(hash(saltSource), lit(salts)))
      .groupBy(keyCols :+ col("__salt"): _*)
      .agg(sum(col(valueCol)).as("__psum"), count(lit(1)).as("__pcnt"))
      .groupBy(keyCols: _*)
      .agg(sum(col("__psum")).as(s"sum_$valueCol"), sum(col("__pcnt")).as("n"))
  }

  /** Salted equi-join for a skewed probe side: each probe row picks a
    * deterministic salt in [0, salts); the build side is replicated to
    * every salt and the join runs on (key, salt). Join output equals the
    * plain inner join; the hot key's probe rows now land in `salts`
    * shuffle partitions.
    */
  def saltedJoin(probe: DataFrame, build: DataFrame, key: String,
                 probeSaltSource: Column, salts: Int): DataFrame = {
    val saltedProbe = probe
      .withColumn("__salt", pmod(hash(probeSaltSource), lit(salts)))
    val replicatedBuild = build
      .withColumn("__salt", explode(sequence(lit(0), lit(salts - 1))))
    saltedProbe
      .join(replicatedBuild, Seq(key, "__salt"))
      .drop("__salt")
  }
}
