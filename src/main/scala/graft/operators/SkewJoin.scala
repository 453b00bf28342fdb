package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys (SURVEY §4 / the 100 TB checklist).
  *
  * AQE's skew-join split handles sort-merge skew at runtime; salting is
  * the explicit pre-plan fix when a handful of hot keys would otherwise
  * pin whole partitions — the classic "one reducer runs for hours"
  * cliff. The probe side gets a deterministic salt in [0, factor); the
  * build side is replicated across all factor salts; the join key
  * becomes (key, salt), spreading each hot key over `factor`
  * partitions. Row-identical to the plain join.
  */
object SkewJoin {

  /** @param left      probe side (large, possibly skewed)
    * @param right     build side (replicated ×factor — keep it the
    *                  smaller input)
    * @param keys      equi-join key columns (present on both sides)
    * @param factor    salt fan-out; ≈ number of partitions a hot key
    *                  should spread over
    * @param joinType  any Spark join type valid for the replication
    *                  direction (inner/left)
    */
  def saltedJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
                 factor: Int, joinType: String = "inner"): DataFrame = {
    require(factor > 0, "salt factor must be positive")
    // right/full outer would duplicate unmatched build rows ×factor
    // (each replica survives null-extended) — fail fast instead
    require(Set("inner", "left", "left_outer", "leftouter", "left_semi",
      "leftsemi", "left_anti", "leftanti").contains(joinType.toLowerCase),
      s"saltedJoin supports inner/left/semi/anti join types, got '$joinType'")
    // row-position salt: a content hash would send identical rows to
    // the same salt (exactly the duplicates a hot key tends to carry);
    // the join result does not depend on the salt value, so positional
    // assignment is safe and spreads every row
    val salted = left.withColumn("__salt",
      pmod(monotonically_increasing_id(), lit(factor.toLong)).cast("int"))
    val replicated = right.withColumn("__salt",
      explode(sequence(lit(0), lit(factor - 1))))
    salted.join(replicated, keys :+ "__salt", joinType).drop("__salt")
  }
}
