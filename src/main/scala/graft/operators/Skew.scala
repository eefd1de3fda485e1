package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling join utilities (SCALE.md): AQE's skew-join splitting is
  * the first line of defense, but pathological hot keys (one entity with a
  * double-digit percentage of a 100 TB fact table) still need salting —
  * the hot side spreads each key over `saltFactor` sub-keys and the small
  * side replicates to every sub-key, so no single task owns a hot key.
  */
object Skew {

  /** Equi-join `big ⋈ small` on `keys` with the big side salted.
    * Semantics identical to `big.join(small, keys, joinType)` for inner and
    * left joins; the shuffle key becomes (keys..., salt).
    */
  def saltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
                 saltFactor: Int, joinType: String = "inner"): DataFrame = {
    require(saltFactor > 0)
    // deterministic salt from the row content beats rand(): reproducible
    // runs and stable retries (a failed task re-derives the same salt)
    val saltSrc = big.columns.map(col).toSeq
    val salted = big.withColumn("__salt",
      pmod(xxhash64(saltSrc: _*), lit(saltFactor)).cast("int"))
    val exploded = small.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    salted.join(exploded, keys :+ "__salt", joinType).drop("__salt")
  }
}
