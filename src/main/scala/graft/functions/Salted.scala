package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-salted equi-join — the composition for joining a fact table
  * whose join key is heavily skewed against a dimension too large to
  * broadcast. A plain shuffle join sends every row of a hot key to ONE
  * reducer; salting splits each key across `salts` reducers:
  *
  *   - the skewed side gets a deterministic salt in [0, salts) hashed
  *     from the whole row PLUS a per-row ordinal (no RNG — reruns and
  *     retries land identically; the ordinal matters because hot keys
  *     are often hot with IDENTICAL payloads — bot rows, default values
  *     — and a content-only hash would put all duplicates back on one
  *     reducer, silently defeating the salt);
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

  def join(skewed: DataFrame, dims: DataFrame, key: String, salts: Int): DataFrame = {
    require(salts > 0, "salts must be positive")
    require(!skewed.columns.contains("_salt") && !dims.columns.contains("_salt"),
      "inputs already carry a _salt column — rename it before salting again")
    val saltCol = pmod(
      xxhash64(struct(skewed.columns.map(col).toIndexedSeq: _*),
        monotonically_increasing_id()), lit(salts.toLong))
      .cast("int")
    val s = skewed.withColumn("_salt", saltCol)
    val d = dims.withColumn("_salt",
      explode(sequence(lit(0), lit(salts - 1))))
    s.join(d, Seq(key, "_salt")).drop("_salt")
  }
}
