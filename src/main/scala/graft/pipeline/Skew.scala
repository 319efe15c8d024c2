package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Skew mitigation for shuffle joins: when one join key dominates (a hot
 * user, a hot n-gram), the plain shuffle hash join puts that key's entire
 * fact-side in one task. `saltedJoin` splits each key across `salts`
 * sub-partitions — the fact side gets a deterministic per-row salt, the
 * dimension side is replicated `salts`× — preserving inner-join semantics
 * exactly while bounding any single task at ~1/salts of the hot key.
 *
 * Aggregation skew needs no counterpart here: Catalyst's hash aggregate
 * already does map-side partial aggregation, which is the salted two-level
 * aggregate. AQE's skew-join handling (spark.sql.adaptive.skewJoin) covers
 * the runtime-detected case; this operator is for *known* hot keys and for
 * engines where the dimension side is too large to broadcast but small
 * enough to replicate a few times.
 */
object Skew {

  /**
   * Inner join of `facts` (large, possibly skewed) with `dim` on `key`,
   * result identical to `facts.join(dim, key)`.
   */
  def saltedJoin(facts: DataFrame, dim: DataFrame, key: String, salts: Int): DataFrame = {
    require(salts >= 1, "salts must be >= 1")
    val salted = facts.withColumn("__salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(salts.toLong)).cast("int"))
    val replicated = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
