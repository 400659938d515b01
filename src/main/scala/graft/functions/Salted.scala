package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-salted equi-join — the composition for joining a fact table
  * whose join key is heavily skewed against a dimension too large to
  * broadcast. A plain shuffle join sends every row of a hot key to ONE
  * reducer; salting splits each key across `salts` reducers:
  *
  *   - the skewed side gets a deterministic salt in [0, salts) —
  *     `pmod(xxhash64(...), salts)` over the whole row, or over a
  *     caller-supplied per-row UNIQUE ordinal (event id, offset). Pass
  *     the ordinal when hot keys carry IDENTICAL payloads (bot rows,
  *     default values): a content-only hash maps duplicates to one salt
  *     and leaves them on one reducer. The ordinal must be a stable
  *     column of the data — a synthetic one (monotonically_increasing_id,
  *     rand) is NOT retry-safe: a recomputed map task after a shuffle
  *     fetch failure would re-derive different salts and corrupt the
  *     join's partitioning mid-job;
  *   - the other side replicates each row `salts` times (explode), a
  *     controlled blow-up bounded by salts × |dims|;
  *   - the join runs on (key, salt), so a key that used to occupy one
  *     reducer now spreads over `salts` of them.
  *
  * AQE's runtime skew-join handles moderate skew automatically; explicit
  * salting is for the pathological keys known in advance (null-ish ids,
  * default values, bot users) where the planner's split still leaves a
  * straggler. Result is exactly the plain join (spec-asserted).
  */
object Salted {

  def join(skewed: DataFrame, dims: DataFrame, key: String, salts: Int,
      ordinal: Option[Column] = None): DataFrame = {
    require(salts > 0, "salts must be positive")
    require(!skewed.columns.contains("_salt") && !dims.columns.contains("_salt"),
      "inputs already carry a _salt column — rename it before salting again")
    val spread = ordinal.getOrElse(
      struct(skewed.columns.map(col).toIndexedSeq: _*))
    val saltCol = pmod(xxhash64(spread), lit(salts.toLong)).cast("int")
    val s = skewed.withColumn("_salt", saltCol)
    val d = dims.withColumn("_salt",
      explode(sequence(lit(0), lit(salts - 1))))
    s.join(d, Seq(key, "_salt")).drop("_salt")
  }
}
