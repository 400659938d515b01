package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Storage-layout utilities — SURVEY §2.E. At 100 TB the dominant cost
  * of a selective query is which ROW GROUPS its scan can skip, and
  * row-group min/max stats only prune along the physical sort order:
  * a table sorted by column x answers x-slabs beautifully and y-slabs
  * not at all (every row group spans y's full range). Z-ORDERING
  * interleaves the bits of several columns' normalized ranks into one
  * sort key, so each row group covers a small HYPER-RECTANGLE of the
  * key space and min/max pruning works on EVERY participating column
  * at once — the Delta/Iceberg `OPTIMIZE ZORDER` write path, here as a
  * plain DataFrame transform (LayoutSpec proves the row-group math on
  * real parquet footers).
  */
object Layout {

  /** Bit-interleave k pre-scaled ints (each in [0, 2^bits)) into one
    * Long — a JIT kernel per the Kernels rationale (bits*k primitive
    * ops/row beat an interpreted expression tree).
    */
  private val interleave: (Column, Int) => Column = {
    val f = udf { (vs: Seq[Long], bits: Int) =>
      var z = 0L
      var b = 0
      while (b < bits) {
        var j = 0
        while (j < vs.size) {
          z |= ((vs(j) >>> b) & 1L) << (b * vs.size + j)
          j += 1
        }
        b += 1
      }
      z
    }
    (c, bits) => f(c, lit(bits))
  }

  /** Rewrite `df` in z-order over `cols` (numeric): per-column min/max
    * (ONE aggregate job) scale each value into a `bits`-bit rank, the
    * ranks bit-interleave into a z-value, and the frame range-partitions
    * + sorts on it — on write, each output file/row group covers a small
    * box of the (col1 × col2 × …) space. `bits` × |cols| must be <= 63.
    *
    * Scale notes: the min/max aggregate is a single pass (at 100 TB,
    * feed known bounds via `knownRanges` from table metadata instead);
    * the z-sort itself is one range-partitioned shuffle — the same cost
    * as any ORDER BY write, paid once at layout time to make every
    * subsequent selective scan cheaper.
    */
  def zorderBy(
      df: DataFrame, cols: Seq[String], bits: Int = 16,
      partitions: Int = 0,
      knownRanges: Map[String, (Double, Double)] = Map.empty): DataFrame = {
    require(cols.nonEmpty && bits > 0 && bits * cols.size <= 63,
      s"z-order needs bits > 0 and bits*|cols| <= 63 (got $bits x ${cols.size})")
    // fail with a TYPE error up front: a string column would silently
    // cast every value to null below and die with a misleading
    // "no non-null values" — name the offending column instead. Name
    // lookup honors the session's resolver (case-insensitive unless
    // spark.sql.caseSensitive), matching how col(c) resolves below.
    val caseSensitive = df.sparkSession.conf
      .getOption("spark.sql.caseSensitive").exists(_.toBoolean)
    def sameName(a: String, b: String): Boolean =
      if (caseSensitive) a == b else a.equalsIgnoreCase(b)
    cols.foreach { c =>
      val f = df.schema.fields.find(f => sameName(f.name, c)).getOrElse(
        throw new IllegalArgumentException(
          s"z-order column '$c' does not exist (have: ${df.columns.mkString(", ")})"))
      f.dataType match {
        case _: org.apache.spark.sql.types.NumericType => ()
        case other => throw new IllegalArgumentException(
          s"z-order requires numeric columns: '$c' is ${other.simpleString}")
      }
    }
    // merge supplied bounds with a scan over ONLY the missing columns —
    // partially-available table metadata must not force a full recompute
    val missing = cols.filterNot(knownRanges.contains)
    val ranges: Map[String, (Double, Double)] =
      if (missing.isEmpty) knownRanges
      else {
        // NaN is ordered ABOVE every double by Spark's max(): one NaN
        // row would poison the width and silently disable the column's
        // clustering — exclude it from the range (NaN rows clamp to the
        // top rank below, where the sort order puts them anyway)
        def clean(c: String): Column = {
          val cd = col(c).cast("double")
          when(!isnan(cd), cd)
        }
        val aggs = missing.flatMap(c =>
          Seq(min(clean(c)).as(s"min_$c"), max(clean(c)).as(s"max_$c")))
        val r = df.agg(aggs.head, aggs.tail: _*).head()
        knownRanges ++ missing.zipWithIndex.map { case (c, i) =>
          require(!r.isNullAt(2 * i),
            s"z-order column '$c' has no non-null, non-NaN values (empty input?)")
          c -> (r.getDouble(2 * i), r.getDouble(2 * i + 1))
        }.toMap
      }
    val maxRank = (1L << bits) - 1
    val scaled = array(cols.map { c =>
      val (lo, hi) = ranges(c)
      val width = math.max(hi - lo, java.lang.Double.MIN_NORMAL)
      // NaN ranks at the top (where Spark's ordering puts it); the
      // clamp also keeps stale knownRanges from indexing out of range
      least(lit(maxRank), greatest(lit(0L),
        floor((nanvl(col(c).cast("double"), lit(hi)) - lit(lo)) / lit(width) * maxRank)
          .cast("long")))
    }: _*)
    // collision-proof temp name: a user column named "_z" must survive
    val zc = s"__graft_z_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    val z = df.withColumn(zc, interleave(scaled, bits))
    val parted =
      if (partitions > 0) z.repartitionByRange(partitions, col(zc))
      else z.repartitionByRange(col(zc))
    parted.sortWithinPartitions(col(zc)).drop(zc)
  }
}
