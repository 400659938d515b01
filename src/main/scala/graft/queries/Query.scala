package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One gate-checked query: a Spark plan plus (optionally) the equivalent
  * ANSI SQL the driver runs in DuckDB over the same parquet tables.
  *
  * Conventions that keep the driver's hash-compare stable across engines:
  *   - every output column is explicitly aliased, identically in both;
  *   - every result is fully ordered by all (or uniquely-identifying)
  *     output columns in both;
  *   - double aggregates are rounded to >= the data's intrinsic decimal
  *     precision (prices/discounts have <= 4 decimals), so cross-engine
  *     float-summation-order noise (~1e-9) can never flip the rounding;
  *   - averages/ratios are derived from rounded sums, not avg(), so both
  *     engines divide identical doubles.
  */
final case class Q(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Q {
  def apply(name: String, oracle: String)(run: (SparkSession, String) => DataFrame): Q =
    Q(name, run, Some(oracle))
  def noOracle(name: String)(run: (SparkSession, String) => DataFrame): Q =
    Q(name, run, None)
}
