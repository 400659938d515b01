package graft

import graft.SparkEntry

/** C38 `text_lm_score` — hand-computed bigram conditional probabilities
  * and the integer-exactness bounds the gate relies on.
  */
class LmScoreSpec extends SparkSpec {

  private def corpus(name: String, texts: Seq[String]): String = {
    import spark.implicits._
    val dir = s"target/tmp/lmscore-$name"
    texts.zipWithIndex
      .map { case (t, i) => (i.toLong, t, "en", "synth", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("C38 hand-computed conditional probabilities: p(w2|w1) = c2/cp in bp") {
    // corpus: "a b a b" and "a c"
    //   bigram counts: (a,b)=2 (b,a)=1 (a,c)=1; prefix totals: a=3, b=1
    //   p(a,b) = 20000 div 3 = 6666; p(b,a) = 10000; p(a,c) = 3333
    val out = SparkEntry.queries("text_lm_score")(spark, corpus("hand", Seq("a b a b", "a c")))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out(0L) == ((3L, 6666L + 10000L + 6666L, 23332L / 3)))
    assert(out(1L) == ((1L, 3333L, 3333L)))
  }

  test("C38 lm_bp is bounded to [0, 10000] and covers every >=2-token doc on real data") {
    val dir = sf("sf0.001")
    val out = SparkEntry.queries("text_lm_score")(spark, dir).collect()
    assert(out.nonEmpty)
    assert(out.forall(r => r.getLong(3) >= 0L && r.getLong(3) <= 10000L))
    val eligible = graft.core.Tables(spark, dir, "documents")
      .where(org.apache.spark.sql.functions.expr("size(split(text, ' ')) >= 2")).count()
    assert(out.length.toLong == eligible, "one score row per eligible document")
  }

  test("C38b hand-computed Kneser-Ney: discount + continuation term, per-term truncation") {
    // corpus: "a b a b" and "a c"
    //   c2: (a,b)=2 (b,a)=1 (a,c)=1; cp: a=3 (n1f=2), b=1 (n1f=1)
    //   n1r: a=1, b=1, c=1; ntypes=3; d = 3/4
    //   p(a,b) = ((8-3)*1e4) div 12 + (3*2*1*1e4) div 36 = 4166 + 1666 = 5832
    //   p(b,a) = ((4-3)*1e4) div 4  + (3*1*1*1e4) div 12 = 2500 + 2500 = 5000
    //   p(a,c) = ((4-3)*1e4) div 12 + (3*2*1*1e4) div 36 =  833 + 1666 = 2499
    // doc0 = (2*5832 + 1*5000) div 3 = 16664 div 3 = 5554; doc1 = 2499
    val out = SparkEntry.queries("text_lm_kn")(spark, corpus("kn", Seq("a b a b", "a c")))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out(0L) == ((3L, 16664L, 5554L)))
    assert(out(1L) == ((1L, 2499L, 2499L)))
  }

  test("C38b kn_bp bounded to [0, 10000], same doc coverage as C38, and discounts sure things") {
    val dir = sf("sf0.001")
    val kn = SparkEntry.queries("text_lm_kn")(spark, dir).collect()
    // P_KN is a proper distribution (the discounted mass re-enters via
    // the continuation term scaled by n1r/ntypes <= 1), so each observed
    // bigram's probability stays <= 1 and the truncating div keeps bp
    // inside [0, 10000]
    assert(kn.nonEmpty)
    assert(kn.forall(r => r.getLong(3) >= 0L && r.getLong(3) <= 10000L))
    val mle = SparkEntry.queries("text_lm_score")(spark, dir).collect()
    assert(kn.length == mle.length, "KN scores exactly the docs C38 scores")
    // a deterministic continuation (MLE p = 1) must lose mass under KN:
    // the discount strictly lowers every observed bigram's first term
    // and the continuation term returns at most d*n1f/cp of it
    val knDup = SparkEntry.queries("text_lm_kn")(spark,
        corpus("kndup", Seq("p q r s t", "p q r s t", "u v u w")))
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(knDup(0L) < 10000L && knDup(0L) > 5000L,
      "duplicated doc: high predictability, but discounted below certainty")
  }

  test("C38 a doc duplicated verbatim scores 10000 when its bigrams appear nowhere else") {
    // every bigram in the duplicated doc is deterministic given its
    // prefix (all prefix occurrences continue identically), so every
    // conditional probability is exactly 1.
    val out = SparkEntry.queries("text_lm_score")(spark,
        corpus("dup", Seq("p q r s t", "p q r s t", "u v u w")))
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(out(0L) == 10000L && out(1L) == 10000L)
    assert(out(2L) < 10000L, "mixed-continuation prefixes score below 1")
  }

  test("C38d hand-computed interpolated trigram: (3·p3 + 2·p2 + p1) div 6, per-term truncation") {
    // corpus: "a b a b a" and "a b c"
    //   c3: (a,b,a)=2 (b,a,b)=1 (a,b,c)=1; cp3: (a,b)=3 (b,a)=1
    //   c2: (a,b)=3 (b,a)=2 (b,c)=1; cp2: a=3 b=3
    //   c1: a=4 b=3 c=1; N=8
    //   (a,b,a): (3·(20000 div 3) + 2·(20000 div 3) + 40000 div 8) div 6
    //          = (19998 + 13332 + 5000) div 6 = 6388
    //   (b,a,b): (30000 + 20000 + 3750) div 6 = 8958
    //   (a,b,c): (9999 + 6666 + 1250) div 6 = 2985
    // doc0 = (2·6388 + 8958) div 3 = 21734 div 3 = 7244; doc1 = 2985
    val out = SparkEntry.queries("text_lm_trigram")(spark,
        corpus("tri", Seq("a b a b a", "a b c")))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out(0L) == ((3L, 21734L, 7244L)))
    assert(out(1L) == ((1L, 2985L, 2985L)))
  }

  test("C38e hand-computed stupid backoff: all four branches, α=2/5 nested truncation") {
    // corpus: "a b c d" x2, "x b c d e", "p d e q"
    //   c4: (a,b,c,d)=2 (x,b,c,d)=1 (b,c,d,e)=1 (p,d,e,q)=1
    //   cp4: (a,b,c)=2 (x,b,c)=1 (b,c,d)=1 (p,d,e)=1
    //   c3: (a,b,c)=2 (b,c,d)=3 (x,b,c)=1 (c,d,e)=1 (p,d,e)=1 (d,e,q)=1
    //   cp3: (a,b)=2 (b,c)=3 (x,b)=1 (c,d)=1 (p,d)=1 (d,e)=1
    //   c2: (a,b)=2 (b,c)=3 (c,d)=3 (x,b)=1 (d,e)=2 (p,d)=1 (e,q)=1
    //   cp2: a=2 b=3 c=3 x=1 d=2 p=1 e=1;  c1: q=1 ...; N=17
    // branch 1 (a,b,c,d): c4>=2 -> 20000 div 2 = 10000
    // branch 2 (x,b,c,d): c3(b,c,d)=3>=2 -> S3 = 30000 div 3 = 10000;
    //                     (2*10000) div 5 = 4000
    // branch 3 (b,c,d,e): c2(d,e)=2>=2 -> S2 = 20000 div 2 = 10000;
    //                     (2*((2*10000) div 5)) div 5 = 1600
    // branch 4 (p,d,e,q): S1 = 10000 div 17 = 588;
    //                     588 -> 1176 div 5 = 235 -> 470 div 5 = 94
    //                         -> 188 div 5 = 37
    val out = SparkEntry.queries("text_lm_backoff")(spark,
        corpus("sbo", Seq("a b c d", "a b c d", "x b c d e", "p d e q")))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out(0L) == ((1L, 10000L, 10000L)))
    assert(out(1L) == ((1L, 10000L, 10000L)))
    assert(out(2L) == ((2L, 4000L + 1600L, 2800L)))
    assert(out(3L) == ((1L, 37L, 37L)))
  }

  test("C38e sbo_bp bounded to [0, 10000], one row per >=4-token doc on real data") {
    val dir = sf("sf0.001")
    val out = SparkEntry.queries("text_lm_backoff")(spark, dir).collect()
    assert(out.nonEmpty)
    assert(out.forall(r => r.getLong(3) >= 0L && r.getLong(3) <= 10000L))
    val eligible = graft.core.Tables(spark, dir, "documents")
      .where(org.apache.spark.sql.functions.expr("size(split(text, ' ')) >= 4")).count()
    assert(out.length.toLong == eligible)
    // self-scoring with singleton pruning: backoff must actually fire
    // somewhere (scores strictly below the observed-4-gram floor of
    // (1*10000) div max_cp4 exist), or the threshold is dead code
    assert(out.exists(r => r.getLong(3) < 2000L),
      "no document ever backed off - the pruning threshold is dead code")
  }

  test("C38d lm3_bp bounded to [0, 10000], one row per >=3-token doc on real data") {
    val dir = sf("sf0.001")
    val out = SparkEntry.queries("text_lm_trigram")(spark, dir).collect()
    assert(out.nonEmpty)
    assert(out.forall(r => r.getLong(3) >= 0L && r.getLong(3) <= 10000L))
    val eligible = graft.core.Tables(spark, dir, "documents")
      .where(org.apache.spark.sql.functions.expr("size(split(text, ' ')) >= 3")).count()
    assert(out.length.toLong == eligible)
  }

  test("C38c buckets: per-lang tertiles balance to ±1 and score ranges stack head ≥ middle ≥ tail") {
    val dir = sf("sf0.001")
    val rows = SparkEntry.queries("text_lm_buckets")(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(rows.nonEmpty)
    val byLang = rows.groupBy(_._1)
    byLang.foreach { case (lang, bs) =>
      assert(bs.map(_._2).toSet == Set("head", "middle", "tail"), s"$lang missing a bucket")
      val ns = bs.map(_._3)
      assert(ns.max - ns.min <= 1, s"$lang tertiles unbalanced: ${ns.toSeq}")
      val m = bs.map(b => b._2 -> b).toMap
      // head scores at or above middle, middle at or above tail — the
      // ntile boundaries may share a bp value but can never invert
      assert(m("head")._5 >= m("middle")._6, s"$lang head/middle ranges invert")
      assert(m("middle")._5 >= m("tail")._6, s"$lang middle/tail ranges invert")
    }
    // bucket doc counts cover every scored (>= 2 token) document
    val scored = SparkEntry.queries("text_lm_score")(spark, dir).count()
    assert(rows.map(_._3).sum == scored)
  }

  test("C42c head-heavy mixture: conservation, arithmetic replay, shared-frame bucket parity") {
    val dir = sf("sf0.001")
    val mix = SparkEntry.queries("text_mixture_lm")(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(mix.nonEmpty)
    val budget = mix.map(_._4).sum / 2
    // every stratum's weight and rate replay from its own row; floors
    // lose at most 1 token per stratum against the budget
    mix.foreach { case (lang, bucket, _, nTokens, wm, alloc, rateBp) =>
      val m = bucket match { case "head" => 3L; case "middle" => 2L; case _ => 1L }
      assert(wm == m * math.sqrt(nTokens.toDouble).toLong, s"$lang/$bucket weight")
      assert(rateBp == alloc * 10000L / nTokens, s"$lang/$bucket rate")
    }
    val wsum = mix.map(_._5).sum
    mix.foreach { case (lang, bucket, _, _, wm, alloc, _) =>
      assert(alloc == budget * wm / wsum, s"$lang/$bucket allocation")
    }
    assert(mix.map(_._6).sum <= budget && mix.map(_._6).sum >= budget - mix.length)
    // the shared lmBucketed frame: per-(lang, bucket) doc counts agree
    // with text_lm_buckets exactly
    val buckets = SparkEntry.queries("text_lm_buckets")(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    mix.foreach { case (lang, bucket, nDocs, _, _, _, _) =>
      assert(buckets((lang, bucket)) == nDocs, s"$lang/$bucket doc-count drift")
    }
  }
}
