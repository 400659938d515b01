package graft.queries

import org.apache.spark.sql.functions._

import graft.core.Tables

/** Set operations + pivot — SURVEY.md §2.B23-B25. Rounding out the
  * relational surface a reference user would expect from a complete
  * engine: INTERSECT / EXCEPT compile to shuffle-dedup'd joins, pivot to
  * a single-pass conditional aggregation (never a per-column scan).
  */
object SetOps {

  val all: Seq[Q] = Seq(

    // B23: INTERSECT — customers ordering in both 1995 and 1996.
    Q("q23_intersect",
      """SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995
        |INTERSECT
        |SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
        |ORDER BY o_custkey""".stripMargin) { (s, dir) =>
      val o = Tables(s, dir, "orders")
      val y95 = o.where(year(col("o_orderdate")) === 1995).select(col("o_custkey"))
      val y96 = o.where(year(col("o_orderdate")) === 1996).select(col("o_custkey"))
      y95.intersect(y96).orderBy(col("o_custkey"))
    },

    // B24: EXCEPT — customers ordering in 1995 but never in 1996.
    Q("q24_except",
      """SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995
        |EXCEPT
        |SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
        |ORDER BY o_custkey""".stripMargin) { (s, dir) =>
      val o = Tables(s, dir, "orders")
      val y95 = o.where(year(col("o_orderdate")) === 1995).select(col("o_custkey"))
      val y96 = o.where(year(col("o_orderdate")) === 1996).select(col("o_custkey"))
      y95.except(y96).orderBy(col("o_custkey"))
    },

    // B27: the SQL entry point — the same engine drives ANSI SQL text via
    // spark.sql over registered temp views (identical Catalyst plan to
    // the DataFrame form; proves the query surface users script against).
    Q("q27_sql_api",
      """SELECT n_name,
        |  count(*) AS n_customers,
        |  CAST(CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT) AS DOUBLE) / 100.0 AS total_bal
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin) { (s, dir) =>
      // exact integer cents (Fixed discipline; c_acctbal is signed —
      // round() is away-from-zero in BOTH engines, and 2-decimal inputs
      // never land on a .5 cent anyway)
      Tables(s, dir, "customer").createOrReplaceTempView("customer")
      Tables(s, dir, "nation").createOrReplaceTempView("nation")
      s.sql(
        """SELECT n_name,
          |  count(*) AS n_customers,
          |  CAST(CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT) AS DOUBLE) / 100.0 AS total_bal
          |FROM customer JOIN nation ON c_nationkey = n_nationkey
          |GROUP BY n_name ORDER BY n_name""".stripMargin)
    },

    // B25: pivot — order counts per status, one column per priority tier;
    // explicit pivot values keep it a single conditional-agg pass.
    Q("q25_pivot",
      """SELECT o_orderstatus,
        |  CAST(count(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 END) AS BIGINT) AS p1,
        |  CAST(count(CASE WHEN o_orderpriority = '2-HIGH' THEN 1 END) AS BIGINT) AS p2,
        |  CAST(count(CASE WHEN o_orderpriority = '3-MEDIUM' THEN 1 END) AS BIGINT) AS p3,
        |  CAST(count(CASE WHEN o_orderpriority = '4-NOT SPECIFIED' THEN 1 END) AS BIGINT) AS p4,
        |  CAST(count(CASE WHEN o_orderpriority = '5-LOW' THEN 1 END) AS BIGINT) AS p5
        |FROM orders GROUP BY o_orderstatus
        |ORDER BY o_orderstatus""".stripMargin) { (s, dir) =>
      Tables(s, dir, "orders")
        .groupBy(col("o_orderstatus"))
        .pivot("o_orderpriority",
          Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"))
        .count()
        .toDF("o_orderstatus", "p1", "p2", "p3", "p4", "p5")
        .na.fill(0L, Seq("p1", "p2", "p3", "p4", "p5"))
        .orderBy(col("o_orderstatus"))
    },

    // F3 (r9): BUCKETED-layout co-located join — the claim "zero-exchange
    // once bucketed at rest" that the survey's 100 TB stories lean on,
    // PROVEN as a gated query instead of asserted in prose: both sides
    // are written bucketBy(8)-on-the-join-key (the at-rest layout a
    // production corpus keeps), read back through the catalog, and
    // joined — the join runs WITHOUT ANY hash-partitioning exchange
    // (BucketJoinSpec pins it; a merge hint keeps AQE from broadcasting
    // the demo-scale side, which would hide the property being proven).
    // Bucketed tables are keyed per corpus dir and written once per
    // session — repeat runs measure the read+join, the probe-path
    // discipline. At 100 TB this is THE layout decision that deletes
    // the dominant shuffle from every doc_id-keyed pipeline stage.
    // F4 (r9): PARTITIONED-layout pruning — F3's companion proof for
    // the other at-rest layout decision: documents written
    // partitionBy(lang) (the layout a multilingual corpus keeps so
    // per-language pipelines read only their split), then a one-lang
    // query — the scan must carry the predicate as a PARTITION filter
    // (directory pruning before any I/O), not a row filter
    // (BucketJoinSpec pins PartitionFilters on the scan). Same
    // corpus-keyed write-once-per-session discipline as F3.
    Q("layout_partition_prune",
      """SELECT doc_id, n_chars FROM documents WHERE lang = 'en'
        |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val fp = java.lang.Integer.toHexString(dir.hashCode)
      val pT = s"docs_part_$fp"
      if (!s.catalog.tableExists(pT)) {
        val p = new org.apache.hadoop.fs.Path(
          s.conf.get("spark.sql.warehouse.dir"), pT)
        val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
        if (fs.exists(p)) fs.delete(p, true)
        Tables(s, dir, "documents").select(col("doc_id"), col("n_chars"), col("lang"))
          .write.mode("overwrite").format("parquet")
          .partitionBy("lang").saveAsTable(pT)
      }
      s.table(pT).where(col("lang") === "en")
        .select(col("doc_id"), col("n_chars"))
        .orderBy(col("doc_id"))
    },

    Q("layout_bucket_join",
      """SELECT d.doc_id, d.lang, CAST(e.label AS BIGINT) AS label
        |FROM documents d JOIN embeddings e ON e.vec_id = d.doc_id
        |ORDER BY d.doc_id""".stripMargin) { (s, dir) =>
      val fp = java.lang.Integer.toHexString(dir.hashCode)
      val (dT, eT) = (s"docs_bkt_$fp", s"emb_bkt_$fp")
      if (!s.catalog.tableExists(dT)) {
        // the warehouse DIRECTORY outlives the in-memory catalog: a
        // fresh session would hit LOCATION_ALREADY_EXISTS on the files
        // a previous session left, so clear the stale locations first
        Seq(dT, eT).foreach { t =>
          val p = new org.apache.hadoop.fs.Path(
            s.conf.get("spark.sql.warehouse.dir"), t)
          val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
          if (fs.exists(p)) fs.delete(p, true)
        }
        Tables(s, dir, "documents").select(col("doc_id"), col("lang"))
          .write.mode("overwrite").format("parquet")
          .bucketBy(8, "doc_id").sortBy("doc_id").saveAsTable(dT)
        Tables(s, dir, "embeddings").select(col("vec_id"), col("label"))
          .write.mode("overwrite").format("parquet")
          .bucketBy(8, "vec_id").sortBy("vec_id").saveAsTable(eT)
      }
      s.table(dT).hint("merge")
        .join(s.table(eT), col("doc_id") === col("vec_id"))
        .select(col("doc_id"), col("lang"), col("label").cast("long").as("label"))
        .orderBy(col("doc_id"))
    })
}
