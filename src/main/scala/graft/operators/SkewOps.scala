package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for hot join keys (the 100 TB problem AQE's skew-join
  * handles reactively; this is the proactive form for known-skewed keys,
  * e.g. a "null city" or a mega-city dominating a partition).
  *
  * The big (skewed) side gets a uniform random salt in [0, salt); the small
  * side is replicated `salt` times, once per salt value. The join key
  * becomes (key, salt), spreading each hot key over `salt` reducers. Row
  * multiplicity is unchanged: every big-side row matches exactly the one
  * replica carrying its salt.
  */
object SkewOps {

  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      salt: Int, joinType: String = "inner", seed: Long = 42L): DataFrame = {
    require(salt > 0)
    // right/full outer would emit each unmatched small-side row once per
    // replica — multiplicity-corrupting, so only big-side-preserving types
    require(Set("inner", "left", "left_outer", "leftouter", "left_semi",
      "leftsemi").contains(joinType.toLowerCase),
      s"saltedJoin supports big-side-preserving join types only, got $joinType")
    val salted = big.withColumn("__salt", (rand(seed) * salt).cast("int"))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salt - 1))))
    salted.join(replicated, Seq(key, "__salt"), joinType).drop("__salt")
  }
}
