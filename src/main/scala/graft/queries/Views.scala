package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.core._

/** View-engine gate queries — SURVEY.md §2.A, oracle-checked.
  *
  * Each query drives the REAL pipeline end-to-end: wrap the sf `documents`
  * table as an archive (one row = one file whose contents are a JSON
  * record, the reference's operating shape), define views, index
  * (parquet state partitioned by origin), then run the reference read API
  * (`get`/`list`) and return its result for the driver's DuckDB compare.
  *
  * Every view here is a declarative [[MapDF]] — from_json/explode column
  * pipelines that stay inside Catalyst/codegen; the oracle SQL states the
  * same computation relationally.
  */
object Views {

  private val docSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  /** documents → archive of /NNNNNNNN.json files with JSON record bodies. */
  private def docsArchive(s: SparkSession, dir: String): TableArchive = {
    val docs = Tables(s, dir, "documents")
    new TableArchive(
      "dat://docs",
      docs.select(to_json(struct(col("doc_id"), col("lang"), col("source"),
        col("n_chars"))).as("body"), col("doc_id")),
      pathname = concat(lit("/"), lpad(col("doc_id").cast("string"), 8, "0"), lit(".json")),
      value = col("body"))
  }

  private def parsed(files: DataFrame): DataFrame =
    files.withColumn("j", from_json(col("value"), docSchema))

  /** The gate views, defined once; one `index()` pass materializes all of
    * them (the reference's own shape: N views over one archive ingest).
    */
  private val allViews: Seq[(String, ViewDef)] = Seq(
    "tags" -> ViewDef(Seq("/*.json"), MapDF { files =>
      val tags = parsed(files).select(
        col("origin"), col("url"), col("pathname"), col("j"),
        explode(array(
          struct(lit("lang").as("k"), col("j.lang").as("v")),
          struct(lit("source").as("k"), col("j.source").as("v")))).as("tag"))
      GraftFunctions.emitEntry(tags, Seq(col("tag.k"), col("tag.v")), col("j.doc_id"))
    }, None),
    "by-lang" -> ViewDef(Seq("/*.json"), MapDF { files =>
      GraftFunctions.emitEntry(parsed(files), Seq(col("j.lang")), col("j.doc_id"))
    }, None),
    "by-size" -> ViewDef(Seq("/*.json"), MapDF { files =>
      GraftFunctions.emitEntry(parsed(files),
        Seq(col("j.lang"), col("j.n_chars"), col("j.doc_id")), col("j.doc_id"))
    }, None),
    "lang-source" -> ViewDef(Seq("/*.json"), MapDF { files =>
      GraftFunctions.emitEntry(parsed(files),
        Seq(col("j.lang"), col("j.source")), lit(1))
    }, Some(Reduce.Count), materialize = true),
    "lang-count" -> ViewDef(Seq("/*.json"), MapDF { files =>
      GraftFunctions.emitEntry(parsed(files), Seq(col("j.lang")), lit(1))
    }, Some(Reduce.Count), materialize = true),
    "lang-chars" -> ViewDef(Seq("/*.json"), MapDF { files =>
      GraftFunctions.emitEntry(parsed(files), Seq(col("j.lang")), col("j.n_chars"))
    }, Some(Reduce.Sum), materialize = true),
    // reference-shaped compat map: user function over (value, meta),
    // running as a typed flatMap — the A1 MapFn path through the gate
    "mapfn-langs" -> ViewDef(Seq("/*.json"), MapFn { (value, meta) =>
      val rec = Json.parse(value).asInstanceOf[Map[String, Any]]
      Seq(rec("lang") -> rec("doc_id"))
    }, None),
    // associative user fold through the typed Aggregator path (A10)
    "assoc-maxchars" -> ViewDef(Seq("/*.json"), MapDF { files =>
      GraftFunctions.emitEntry(parsed(files), Seq(col("j.lang")), col("j.n_chars"))
    }, Some(Reduce.Assoc((a, b) =>
      math.max(a.asInstanceOf[Double], b.asInstanceOf[Double]))), materialize = true),
    // ORDER-SENSITIVE user fold (A10 Fold): csv of doc_ids in file order —
    // the reference's sequential (acc, value, key) replay (view.js:126)
    "fold-ids" -> ViewDef(Seq("/*.json"), MapDF { files =>
      GraftFunctions.emitEntry(parsed(files), Seq(col("j.lang")), col("j.doc_id"))
    }, Some(Reduce.Fold((acc, v, _) => {
      val s = Json.renderNum(v.asInstanceOf[Double])
      acc.map(_.asInstanceOf[String] + "," + s).getOrElse(s)
    }))),
    "zh-sizes" -> ViewDef(Seq("/*.json"), MapDF { files =>
      GraftFunctions.emitEntry(
        parsed(files).filter(col("j.lang") === "zh"),
        Seq(col("j.doc_id")), col("j.n_chars"))
    }, None))

  /** One shared engine per sf-dir: all views defined up front, the
    * documents archive indexed ONCE — production state is shared across
    * queries, not re-ingested per query. The cache remembers which
    * SparkSession built each engine: a second session in the same JVM
    * (multi-round harness) must not be served an engine pinned to a
    * stopped context. Build runs under a lock so two threads can't race
    * the expensive define+index.
    */
  private val engines =
    scala.collection.mutable.Map.empty[String, (SparkSession, Graft)]

  private def engine(s: SparkSession, dir: String): Graft = engines.synchronized {
    engines.get(dir) match {
      case Some((sess, db)) if (sess eq s) && !sess.sparkContext.isStopped => db
      case _ =>
        val db = new Graft(s, Files.createTempDirectory("graft-views").toString)
        allViews.foreach { case (n, v) => db.define(n, v) }
        db.index(docsArchive(s, dir))
        engines(dir) = (s, db)
        db
    }
  }

  val all: Seq[Q] = Seq(

    // A2+A13: map emits 0..N entries per file (explode over two tag kinds).
    Q("view_map_emit",
      """SELECT key_json, value_json FROM (
        |  SELECT '["lang","' || lang || '"]' AS key_json,
        |         CAST(doc_id AS VARCHAR) AS value_json,
        |         lpad(CAST(doc_id AS VARCHAR), 8, '0') AS ord
        |  FROM documents
        |  UNION ALL
        |  SELECT '["source","' || source || '"]', CAST(doc_id AS VARCHAR),
        |         lpad(CAST(doc_id AS VARCHAR), 8, '0')
        |  FROM documents)
        |ORDER BY key_json, ord""".stripMargin) { (s, dir) =>
      engine(s, dir).list("tags")
    },

    // A7: get() point lookup, multi-value per key ordered by emitting file.
    Q("view_get_multi",
      """SELECT '"en"' AS key_json, CAST(doc_id AS VARCHAR) AS value_json
        |FROM documents WHERE lang = 'en'
        |ORDER BY lpad(CAST(doc_id AS VARCHAR), 8, '0')""".stripMargin) { (s, dir) =>
      engine(s, dir).get("by-lang", "en")
    },

    // A8: list() ordered range scan; kb bounds push to the parquet scan.
    Q("view_list_range",
      """SELECT key_json, value_json FROM (
        |  SELECT '["' || lang || '",' || n_chars || ',' || doc_id || ']' AS key_json,
        |         CAST(doc_id AS VARCHAR) AS value_json,
        |         lang AS k1, n_chars AS k2, doc_id AS k3
        |  FROM documents
        |  WHERE (lang = 'en' AND n_chars >= 200) OR (lang > 'en' AND lang < 'fr'))
        |ORDER BY k1, k2, k3 LIMIT 50""".stripMargin) { (s, dir) =>
      engine(s, dir).list("by-size", ListOpts(
        gte = Some(Seq("en", 200)), lt = Some(Seq("fr")), limit = Some(50)))
    },

    // A9: compound keys, element-wise order (string, string).
    Q("view_compound_keys",
      """SELECT '["' || lang || '","' || source || '"]' AS key_json,
        |       CAST(count(*) AS VARCHAR) AS value_json
        |FROM documents GROUP BY lang, source
        |ORDER BY lang, source""".stripMargin) { (s, dir) =>
      engine(s, dir).list("lang-source")
    },

    // A10: reduced view — per-key fold compiled to a native aggregate.
    Q("view_reduce_count",
      """SELECT '"' || lang || '"' AS key_json,
        |       CAST(count(*) AS VARCHAR) AS value_json
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin) { (s, dir) =>
      engine(s, dir).list("lang-count")
    },

    // A10 variant: built-in Sum fold.
    Q("view_reduce_sum",
      """SELECT '"' || lang || '"' AS key_json,
        |       CAST(sum(n_chars) AS VARCHAR) AS value_json
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin) { (s, dir) =>
      engine(s, dir).list("lang-chars")
    },

    // A1 MapFn: the reference's (value, meta, emit) map shape end-to-end.
    Q("view_mapfn_langs",
      """SELECT '"' || lang || '"' AS key_json, CAST(doc_id AS VARCHAR) AS value_json
        |FROM documents
        |ORDER BY lang, lpad(CAST(doc_id AS VARCHAR), 8, '0')""".stripMargin) { (s, dir) =>
      engine(s, dir).list("mapfn-langs")
    },

    // A10 Fold: order-sensitive user fold replayed in (file_url, seq)
    // order; file order == zero-padded doc_id order, so the oracle's
    // string_agg ORDER BY doc_id states the same sequence.
    Q("view_reduce_fold",
      """SELECT '"' || lang || '"' AS key_json,
        |       '"' || string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) || '"' AS value_json
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin) { (s, dir) =>
      engine(s, dir).list("fold-ids")
    },

    // A10 Assoc: associative user fold (max) via the typed Aggregator.
    Q("view_reduce_assoc",
      """SELECT '"' || lang || '"' AS key_json,
        |       CAST(max(n_chars) AS VARCHAR) AS value_json
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin) { (s, dir) =>
      engine(s, dir).list("assoc-maxchars")
    },

    // A15: JSON file-value parsing inside the map (from_json, codegen'd),
    // numeric scalar keys ordered numerically.
    Q("view_json_parse",
      """SELECT CAST(doc_id AS VARCHAR) AS key_json,
        |       CAST(n_chars AS VARCHAR) AS value_json
        |FROM documents WHERE lang = 'zh'
        |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      engine(s, dir).list("zh-sizes")
    })
}
