package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** JIT-compiled kernels for the compute-dense sketch/similarity inner
  * loops (minhash, simhash, hyperplane signatures, cosine).
  *
  * Why UDFs here and nowhere else: these loops run 10⁴-10⁵ primitive ops
  * per row. Catalyst's higher-order array functions evaluate those
  * interpreted (one Expression.eval + boxing per element — measured 84 s
  * for minhash at sf0.1), while a Scala UDF body JITs to tight machine
  * code (same query: ~3 s). The preference order stands — native
  * codegen'd functions for everything relational, a custom Expression if
  * these ever need doGenCode fusion — but a compiled kernel beats an
  * interpreted expression tree by ~30× and that dominates everything
  * else at 100 TB. All hashes are engine-internal (self-consistent),
  * deterministic, and seed-free.
  */
object Kernels extends Serializable {

  /** splitmix64 finalizer — the standard public-domain bit mixer. */
  @inline private def mix64(x0: Long): Long = {
    var x = x0
    x ^= (x >>> 33); x *= 0xFF51AFD7ED558CCDL
    x ^= (x >>> 33); x *= 0xC4CEB9FE1A85EC53L
    x ^ (x >>> 33)
  }

  @inline private def hashStr(s: String): Long = {
    var h = 1125899906842597L
    var i = 0
    while (i < s.length) { h = 31 * h + s.charAt(i); i += 1 }
    mix64(h)
  }

  private val P31 = 2147483647L // 2^31 - 1

  /** Codepoint polynomial hash mod 2³¹−1 — the SQL-RESTATABLE base hash
    * behind the integer dedup gates (`dedup_minhash_int` /
    * `dedup_simhash_int`): DuckDB computes the identical value as
    * `list_reduce(list_transform(range(1, length(s)+1), i ->
    * ord(substr(s,i,1))::BIGINT), (h,c) -> (h*31+c) % 2147483647)`, so
    * every signature derived from it is bit-identical cross-engine
    * (the C8l/C8m/C8n integer-determinism scheme applied to text).
    * Iterates CODEPOINTS, not UTF-16 units, to match `ord()` exactly on
    * non-BMP text; the fold seeds with the first codepoint (list_reduce
    * semantics) and the empty string hashes to 0 (list_reduce cannot
    * fold an empty list — the SQL side guards with CASE).
    */
  @inline private def hashCp(s: String): Long = {
    if (s.isEmpty) 0L
    else {
      var h = -1L
      var i = 0
      while (i < s.length) {
        val cp = s.codePointAt(i)
        h = if (h < 0) cp.toLong else (h * 31 + cp) % P31
        i += Character.charCount(cp)
      }
      h
    }
  }

  /** [[minhash128]] with the SQL-restatable [[hashCp]] base hash — every
    * slot value is an exact integer both engines can derive, which is
    * what lets `dedup_minhash_int` carry a full rows+schema+hash gate
    * (the float-free analogue of the production sketch; same affine
    * permutation family, same 128-slot layout).
    */
  val minhashInt128: Column => Column = {
    val f = udf { grams: Seq[String] =>
      val n = grams.size
      val hs = new Array[Long](n)
      var j = 0
      while (j < n) { hs(j) = hashCp(grams(j)); j += 1 }
      val sig = new Array[Long](128)
      var i = 0
      while (i < 128) {
        val a = 2L * i + 1; val b = 40503L * i
        var m = Long.MaxValue
        j = 0
        while (j < n) {
          val v = (hs(j) * a + b) % P31
          if (v < m) m = v
          j += 1
        }
        sig(i) = m
        i += 1
      }
      sig
    }
    c => f(c)
  }

  /** 48-bit SQL-restatable simhash over a word array (multiplicity
    * preserved, like [[simhash64]]): slot k's vote for word w is the low
    * bit of (hashCp(w)·(2654435761 + 2k) + k·2246822519) mod 2³¹−1 —
    * 48 single-bit hashes from one base hash, every step integer
    * arithmetic DuckDB restates verbatim. The multiplier must EXCEED the
    * modulus (the C8m `lshW` lesson, rediscovered here the hard way): a
    * small-multiplier form like h·(2k+1)+40503k stays below 2³¹−1 for
    * every short word, the mod never wraps, and the low bit degenerates
    * to parity(h)⊕parity(k) — identical vote patterns across all slots
    * collapsed signatures and emitted 10.1M hamming≤3 pairs at sf1 where
    * the 64-bit float form emits 13.9k. With the wrapping multiplier the
    * product h·(2.65e9+2k) ≤ 5.7e18 stays inside signed-64 on both
    * engines and every slot votes independently. 48 slots (not 64) keep
    * `sum(bit << k)` and the 2×24-bit pigeonhole blocks (radius 1,
    * Dedup.scala dedup_simhash_int) inside signed-BIGINT semantics both
    * engines share.
    */
  val simhashInt48: Column => Column = {
    val f = udf { words: Seq[String] =>
      val votes = new Array[Int](48)
      words.foreach { w =>
        val h = hashCp(w)
        var k = 0
        while (k < 48) {
          if (((h * (2654435761L + 2L * k) + k * 2246822519L) % P31 & 1L) == 1L) votes(k) += 1
          else votes(k) -= 1
          k += 1
        }
      }
      var sig = 0L
      var k = 0
      while (k < 48) { if (votes(k) > 0) sig |= (1L << k); k += 1 }
      sig
    }
    c => f(c)
  }

  /** 128-slot minhash signature over a string-gram array: slot i is the
    * min over grams of the affine permutation (h·(2i+1) + i·40503) mod p
    * of the gram's 31-bit base hash.
    */
  val minhash128: Column => Column = {
    val f = udf { grams: Seq[String] =>
      val n = grams.size
      val hs = new Array[Long](n)
      var j = 0
      while (j < n) { hs(j) = hashStr(grams(j)) & 0x7FFFFFFFL; j += 1 }
      val sig = new Array[Long](128)
      var i = 0
      while (i < 128) {
        val a = 2L * i + 1; val b = 40503L * i
        var m = Long.MaxValue
        j = 0
        while (j < n) {
          val v = (hs(j) * a + b) % P31
          if (v < m) m = v
          j += 1
        }
        sig(i) = m
        i += 1
      }
      sig
    }
    c => f(c)
  }

  /** Distinct word 3-grams of a word array (insertion order). The
    * equivalent transform/element_at/array_distinct expression chain
    * evaluates interpreted at ~21 µs/row; this JITs to ~0.5 µs.
    */
  /** n = 3 of [[gramsN]] (one implementation — Dedup and Text must never
    * disagree on gram semantics).
    */
  val grams3: Column => Column = c => gramsN(c, 3)

  /** Distinct adjacent word n-grams for arbitrary n — same contract as
    * [[grams3]] (first-occurrence order, set semantics). The interpreted
    * transform+concat_ws+array_distinct expression tree for this costs
    * one Expression.eval per element per function; the kernel is one JIT
    * loop per row.
    */
  /** All adjacent ' '-joined n-gram windows, in position order — the ONE
    * gram-assembly loop behind both [[gramsN]] and [[gramsMultiN]], so
    * set-form consumers (dedup, contamination) and count-form consumers
    * (LM counts) can never disagree on gram identity.
    */
  private def gramWindows(ws: Seq[String], n: Int): Array[String] = {
    if (ws.size < n) Array.empty[String]
    else {
      val out = new Array[String](ws.size - n + 1)
      var i = 0
      while (i + n - 1 < ws.size) {
        val sb = new StringBuilder(ws(i))
        var j = 1
        while (j < n) { sb.append(' ').append(ws(i + j)); j += 1 }
        out(i) = sb.toString
        i += 1
      }
      out
    }
  }

  val gramsN: (Column, Int) => Column = {
    val f = udf { (ws: Seq[String], n: Int) =>
      val seen = new java.util.LinkedHashSet[String]
      gramWindows(ws, n).foreach(seen.add)
      seen.toArray(new Array[String](seen.size))
    }
    (c, n) => f(c, org.apache.spark.sql.functions.lit(n))
  }

  /** ALL adjacent word n-grams, WITH multiplicity — the corpus-count
    * companion of [[gramsN]]'s distinct-set form (LM counts need every
    * occurrence; dedup/contamination need the set). Same JIT-loop
    * rationale as [[gramsN]].
    */
  val gramsMultiN: (Column, Int) => Column = {
    val f = udf { (ws: Seq[String], n: Int) => gramWindows(ws, n) }
    (c, n) => f(c, org.apache.spark.sql.functions.lit(n))
  }

  /** 128-bit digests of ALL adjacent word n-grams, WITH multiplicity —
    * the digest-only companion of [[gramsMultiN]] for consumers that
    * never look at gram TEXT (substring dedup, decontamination probes:
    * the digest is an engine-internal join/group key, no oracle
    * restates it and no query outputs it, so equality-of-results only
    * needs collision-freeness. The two differently-seeded polynomial
    * lanes share the input sequence, so the honest argument is the
    * BOUNDED-DEGREE one, not an ideal 2⁻¹²⁸: two distinct grams collide
    * on a lane only if their word-hash sequences make the lane's
    * degree-≤n difference polynomial vanish mod 2⁶⁴ — with pre-hashed
    * 64-bit word inputs and small n the per-pair odds are ≤ n·2⁻⁶⁴ per
    * lane and the lanes multiply under independent seeds; mix64
    * finalization only de-correlates banding, it cannot repair an
    * internal-state collision. For internal keys over realistic gram
    * populations this sits in the same practical no-collision class
    * the previous sha2-256 key occupied.
    *
    * r13 OPT (guide §1.2 per-task work): each word hashes ONCE
    * (hashStr) and the gram digest is a rolling polynomial over the
    * word-hash array — O(len) total vs O(len·n) string assembly + hash
    * per position, with zero gram-string allocation. Returns one
    * (h1, h2) struct per position 0..len−n, the exact position layout
    * of [[gramsMultiN]] under posexplode.
    */
  val wordGramHashes: (Column, Int) => Column = {
    val f = udf { (ws: Seq[String], n: Int) =>
      val len = ws.size
      if (len < n) Array.empty[(Long, Long)]
      else {
        val wh = new Array[Long](len)
        var i = 0
        while (i < len) { wh(i) = hashStr(ws(i)); i += 1 }
        val B1 = 0x9E3779B97F4A7C15L; val B2 = 0xC4CEB9FE1A85EC53L
        var p1 = 1L; var p2 = 1L
        i = 0
        while (i < n - 1) { p1 *= B1; p2 *= B2; i += 1 } // B^(n-1)
        val out = new Array[(Long, Long)](len - n + 1)
        var h1 = 0L; var h2 = 0L
        i = 0
        while (i < n) { h1 = h1 * B1 + wh(i); h2 = h2 * B2 + wh(i); i += 1 }
        out(0) = (mix64(h1), mix64(h2))
        var s0 = 1
        while (s0 <= len - n) {
          val hOut = wh(s0 - 1); val hIn = wh(s0 + n - 1)
          h1 = (h1 - hOut * p1) * B1 + hIn
          h2 = (h2 - hOut * p2) * B2 + hIn
          out(s0) = (mix64(h1), mix64(h2))
          s0 += 1
        }
        out
      }
    }
    (c, n) => f(c, org.apache.spark.sql.functions.lit(n))
  }

  /** Per-bigram DSIR bucket ids of a word array — bucket of bigram
    * (w_i, w_{i+1}) is (Σ_p ascii(c_p)·(1 + (131·p) % 997)) % 4096 over
    * the characters of "w_i w_{i+1}" at 1-based positions p, the exact
    * arithmetic of the C46/D14 oracle (`dsirOracleSql`'s ch/fb CTEs).
    * r13 OPT (guide §1.2): the previous form evaluated this as a nested
    * transform→aggregate→zip_with→split expression chain — interpreted
    * Catalyst evaluation per character per bigram (the measured ~30×
    * class this object exists for). The kernel walks the two words'
    * chars directly; no bigram string is ever allocated. Positions
    * iterate UTF-16 units exactly like the expression's split('') did,
    * and the corpus contract (lowercase-ASCII tokens, Tokenizer.scala)
    * keeps ascii()/charAt agreement exact.
    */
  val dsirBucketIds: Column => Column = {
    val f = udf { ws: Seq[String] =>
      val n = ws.size
      if (n < 2) Array.empty[Long]
      else {
        val out = new Array[Long](n - 1)
        var i = 0
        while (i < n - 1) {
          var s = 0L
          var p = 1
          val a = ws(i); val b = ws(i + 1)
          var j = 0
          while (j < a.length) {
            s += a.charAt(j).toLong * (1 + (131 * p) % 997); p += 1; j += 1
          }
          s += 32L * (1 + (131 * p) % 997); p += 1 // the joining space
          j = 0
          while (j < b.length) {
            s += b.charAt(j).toLong * (1 + (131 * p) % 997); p += 1; j += 1
          }
          out(i) = s % 4096
          i += 1
        }
        out
      }
    }
    c => f(c)
  }

  /** 128-bit digests of ALL n-CHARACTER grams of a string, one (h1, h2)
    * struct per char position 0..len−n — the character-grain companion
    * of [[wordGramHashes]] (same two-lane rolling polynomial + mix64,
    * same internal-key-only justification). Replaces the
    * substring(i, n) → sha2 per char position chain: no 50-char gram
    * strings are ever materialized and the hash work is O(len), not
    * O(len·n).
    *
    * POSITION UNIT CAVEAT (r13 advice): positions iterate UTF-16 code
    * units (charAt) exactly like the substring(i, n) expression this
    * replaced — Spark's substring counts codepoints, but the two agree
    * on BMP text, and the corpus contract (lowercase-ASCII tokens,
    * Tokenizer.scala) keeps them identical here. Feeding supplementary-
    * plane text would shift gram positions relative to a codepoint
    * oracle; a caller outside the ASCII contract must iterate
    * codePointAt/charCount instead.
    */
  val charGramHashes: (Column, Int) => Column = {
    val f = udf { (text: String, n: Int) =>
      val len = text.length
      if (len < n) Array.empty[(Long, Long)]
      else {
        val B1 = 0x9E3779B97F4A7C15L; val B2 = 0xC4CEB9FE1A85EC53L
        var p1 = 1L; var p2 = 1L
        var i = 0
        while (i < n - 1) { p1 *= B1; p2 *= B2; i += 1 } // B^(n-1)
        val out = new Array[(Long, Long)](len - n + 1)
        var h1 = 0L; var h2 = 0L
        i = 0
        while (i < n) {
          val c = text.charAt(i).toLong
          h1 = h1 * B1 + c; h2 = h2 * B2 + c; i += 1
        }
        out(0) = (mix64(h1), mix64(h2))
        var s0 = 1
        while (s0 <= len - n) {
          val cOut = text.charAt(s0 - 1).toLong
          val cIn = text.charAt(s0 + n - 1).toLong
          h1 = (h1 - cOut * p1) * B1 + cIn
          h2 = (h2 - cOut * p2) * B2 + cIn
          out(s0) = (mix64(h1), mix64(h2))
          s0 += 1
        }
        out
      }
    }
    (c, n) => f(c, org.apache.spark.sql.functions.lit(n))
  }

  /** 64-bit simhash over a word array: bit k is the sign of the ±1 votes
    * of each word-hash's bit k.
    */
  val simhash64: Column => Column = {
    val f = udf { words: Seq[String] =>
      val votes = new Array[Int](64)
      words.foreach { w =>
        val h = hashStr(w)
        var k = 0
        while (k < 64) {
          if (((h >>> k) & 1L) == 1L) votes(k) += 1 else votes(k) -= 1
          k += 1
        }
      }
      var sig = 0L
      var k = 0
      while (k < 64) { if (votes(k) > 0) sig |= (1L << k); k += 1 }
      sig
    }
    c => f(c)
  }

  /** Per-row adjacent-bigram statistics over a word array:
    * `[total, distinct, topCount]` — the inputs of the repetition
    * quality signal (Gopher-style duplicate-n-gram fraction). A kernel
    * rather than a groupBy: the statistic needs no cross-row data, so
    * shuffling the exploded gram stream (what the relational form does)
    * would move the whole corpus to compute a per-document number; this
    * runs at scan speed with zero exchange. Exact counting (hash map per
    * row, bounded by words-per-doc), no hashing tricks — matches the
    * oracle's relational count exactly.
    */
  val bigramStats: Column => Column = {
    val f = udf { ws: Seq[String] =>
      val counts = new java.util.HashMap[String, Long]()
      var i = 0
      val n = math.max(0, ws.size - 1) // 0- and 1-word docs: [0,0,0], not [-1,..]
      var top = 0L
      while (i < n) {
        val g = ws(i) + " " + ws(i + 1)
        val c = counts.merge(g, 1L, _ + _)
        if (c > top) top = c
        i += 1
      }
      Array(n.toLong, counts.size.toLong, top)
    }
    c => f(c)
  }

  /** Hashing-trick linear-classifier pass over a word array:
    * `[n_tokens, score]` where each non-empty token hashes into a 2^20
    * feature bucket and the bucket's weight is a deterministic integer in
    * [-1001, 1001]; score = Σ weights. One JIT loop per row — the
    * fastText-style quality-classifier shape (single pass, no shuffle,
    * no vocabulary table). Deliberately CROSS-ENGINE arithmetic (the
    * position-salted ascii polynomial of text_fingerprint, all integer):
    * the DuckDB oracle restates the identical hash relationally, so the
    * whole feature-hash → weight → sum path is hash-gated, not spec'd.
    * The hash-derived weights stand in for trained ones the way the
    * multimodal StubCodec stands in for a real decoder: swapping in a
    * learned weight table changes one array lookup, none of the plumbing.
    */
  val tokenWeightStats: Column => Column = {
    val f = udf { ws: Seq[String] =>
      var n = 0L
      var score = 0L
      ws.foreach { t =>
        if (t.nonEmpty) {
          n += 1
          var h = 0L
          // CODE POINTS, not UTF-16 units: the DuckDB oracle iterates
          // ascii(string_split(tok, '')) — per code point with a
          // code-point position index — so a non-BMP character (emoji,
          // astral CJK) must hash identically here, surrogate pairs
          // stepped as one position
          var i = 0  // code-point index (the oracle's subscript - 1)
          var ci = 0 // UTF-16 unit cursor
          while (ci < t.length) {
            val cp = t.codePointAt(ci)
            h += cp.toLong * (1L + (131L * (i + 1)) % 997L)
            ci += Character.charCount(cp)
            i += 1
          }
          score += (h % 1048576L) * 2654435761L % 2003L - 1001L
        }
      }
      Array(n, score)
    }
    c => f(c)
  }

  /** Per-token hashing-trick bucket ids (2^20 space) for the
    * weights-table classifier variant — the SAME token hash as
    * [[tokenWeightStats]] (code-point positions, surrogate-aware), so a
    * trained weights table keyed by bucket id drops in without
    * re-hashing the corpus. Empty tokens produce no bucket.
    */
  val tokenBuckets: Column => Column = {
    val f = udf { ws: Seq[String] =>
      ws.iterator.filter(_.nonEmpty).map { t =>
        var h = 0L
        var i = 0  // code-point index
        var ci = 0 // UTF-16 unit cursor
        while (ci < t.length) {
          val cp = t.codePointAt(ci)
          h += cp.toLong * (1L + (131L * (i + 1)) % 997L)
          ci += Character.charCount(cp)
          i += 1
        }
        h % 1048576L
      }.toArray
    }
    c => f(c)
  }

  /** Hashing-trick DOCUMENT VECTOR (Weinberger et al. 2009, the
    * sklearn HashingVectorizer form): each token's feature index is
    * h % dims and its sign the next hash bit ((h / dims) % 2 — the
    * unbiased signed-sum variant), over the SAME token hash as
    * [[tokenWeightStats]]/[[tokenBuckets]] (code-point positions,
    * surrogate-aware), so these vectors live in the same feature space
    * as the classifier family. One pass over the token array, empty
    * tokens contribute nothing; returns a dense Long[dims].
    */
  def featureHashVec(dims: Int): Column => Column = {
    val f = udf { ws: Seq[String] =>
      val v = new Array[Long](dims)
      ws.foreach { t =>
        if (t.nonEmpty) {
          var h = 0L
          var i = 0  // code-point index
          var ci = 0 // UTF-16 unit cursor
          while (ci < t.length) {
            val cp = t.codePointAt(ci)
            h += cp.toLong * (1L + (131L * (i + 1)) % 997L)
            ci += Character.charCount(cp)
            i += 1
          }
          val hh = h % 1048576L
          val d = (hh % dims).toInt
          v(d) += (if ((hh / dims) % 2 == 0) 1L else -1L)
        }
      }
      v
    }
    c => f(c)
  }

  /** Deterministic ±1 plane component for (t, j, i) — the shared sign
    * function of [[hyperplaneSig]] and [[hyperplaneSigs]].
    */
  @inline private def planeSign(t: Int, j: Int, i: Int): Double =
    if ((mix64(t * 131071L + j * 8191L + i) & 1L) == 0L) 1.0 else -1.0

  /** Per-JVM cache of the materialized sign planes for (L, bits, dim):
    * deriving each component through mix64 per ROW costs L·bits·dim
    * hash mixes per row (~9k for 24 tables × 6 bits × 64 dims); the
    * planes are row-invariant, so hash once per executor and reuse.
    */
  @transient private lazy val planeCache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int, Int), Array[Array[Double]]]

  private def planesFor(l: Int, bits: Int, n: Int): Array[Array[Double]] =
    planeCache.computeIfAbsent((l, bits, n), { key =>
      val (l0, b0, n0) = key
      Array.tabulate(l0 * b0) { tj =>
        val t = tj / b0; val j = tj % b0
        Array.tabulate(n0)(i => planeSign(t, j, i))
      }
    })

  /** b-bit random-hyperplane sign signature of an embedding under table
    * t; plane component (t, j, i) is a deterministic ±1 from a mixed hash.
    */
  val hyperplaneSig: (Column, Column, Column) => Column = {
    val f = udf { (emb: Seq[Double], t: Int, bits: Int) =>
      var sig = 0L
      var j = 0
      while (j < bits) {
        var s = 0.0
        var i = 0
        val n = emb.size
        while (i < n) {
          s += emb(i) * planeSign(t, j, i)
          i += 1
        }
        if (s >= 0) sig |= (1L << j)
        j += 1
      }
      sig
    }
    (e, t, b) => f(e, t, b)
  }

  /** ALL L table signatures in one call (array[long] of length L) — one
    * UDF crossing and one Seq unboxing per row instead of L, against the
    * cached sign planes. Signature (t, j) bits are identical to
    * [[hyperplaneSig]](t).
    */
  val hyperplaneSigs: (Column, Column, Column) => Column = {
    val f = udf { (emb: Seq[Double], l: Int, bits: Int) =>
      val n = emb.size
      val e = new Array[Double](n)
      var i = 0
      while (i < n) { e(i) = emb(i); i += 1 }
      val pl = planesFor(l, bits, n)
      val out = new Array[Long](l)
      var t = 0
      while (t < l) {
        var sig = 0L
        var j = 0
        while (j < bits) {
          val p = pl(t * bits + j)
          var s = 0.0
          i = 0
          while (i < n) { s += e(i) * p(i); i += 1 }
          if (s >= 0) sig |= (1L << j)
          j += 1
        }
        out(t) = sig
        t += 1
      }
      out
    }
    (e, l, b) => f(e, l, b)
  }

  /** BPE ENCODE: apply a learned merge table to one word — tokenizer
    * INFERENCE, the loop that runs once per distinct word when encoding
    * a corpus with a trained tokenizer. Standard rank-priority
    * application (Sennrich et al. 2016 apply_bpe): repeatedly find the
    * adjacent token pair with the best (lowest) learned rank and merge
    * all its occurrences greedy left-to-right (non-overlapping — "aaa"
    * under (a,a) gives ["aa","a"], the same rule as the trainer's
    * `Tokenizer.mergePair` fold), until no learnable pair remains.
    *
    * Rank-priority application is RESULT-equal to replaying the merges
    * one-per-pass in learned order (BpeEncodeSpec asserts it against
    * exactly that fold): merging never deletes a token between two
    * others, so two tokens adjacent at the end were adjacent at every
    * earlier step — a learnable pair skipped at its own rank's turn
    * cannot exist — and pairs involving a merge's OUTPUT token only
    * carry later ranks than the merge that created it.
    *
    * Kernel, not expression, per this file's contract: the loop is
    * O(len × merges-applied) map probes per word and runs over every
    * distinct word in a 100 TB vocabulary. The merge table itself is
    * bounded (30k entries ≈ 1 MB) and ships once per executor in the
    * closure, a broadcast in all but name.
    */
  /** Viterbi segmentation of a word under a unigram piece model
    * (piece → cost = −ln p), Kudo 2018's inference step. DP over end
    * positions; transitions try piece lengths 1..maxLen SHORTEST FIRST
    * with strict improvement, so exact-cost ties break to the
    * shortest-piece path deterministically. Returns (pieces, total
    * cost); THROWS on an unsegmentable word — under Viterbi-EM every
    * word's own current segmentation survives the M-step, so
    * reachability is an invariant and a gap is a bug, not data.
    *
    * Kernel, not expression, per this file's contract: O(len × maxLen)
    * map probes per word, once per DISTINCT word; the model is bounded
    * (operator contract) and ships once per executor in the closure.
    */
  def unigramViterbi(model: Map[String, Double], maxLen: Int): Column => Column = {
    val f = udf { t: String =>
      if (t == null) null
      else {
        val n = t.length
        val best = Array.fill(n + 1)(Double.MaxValue)
        val back = new Array[Int](n + 1) // piece length ending at i
        best(0) = 0.0
        var i = 1
        while (i <= n) {
          var l = 1
          val lmax = math.min(maxLen, i)
          while (l <= lmax) {
            if (best(i - l) < Double.MaxValue) {
              model.get(t.substring(i - l, i)) match {
                case Some(c) =>
                  val v = best(i - l) + c
                  if (v < best(i)) { best(i) = v; back(i) = l }
                case None =>
              }
            }
            l += 1
          }
          i += 1
        }
        if (best(n) == Double.MaxValue)
          throw new IllegalStateException(s"unigramViterbi: unsegmentable word '$t'")
        val out = new scala.collection.mutable.ArrayBuffer[String]
        var p = n
        while (p > 0) { out += t.substring(p - back(p), p); p -= back(p) }
        (out.reverseIterator.toArray.toSeq, best(n))
      }
    }
    c => f(c)
  }

  /** Greedy longest-match segmentation cost under the same model — the
    * comparison witness for the Viterbi-optimality gate. Returns the
    * greedy path's total cost, or null when greedy dead-ends (no piece
    * matches at some position); Viterbi's cost must be ≤ every
    * successful greedy cost.
    */
  def unigramGreedyCost(model: Map[String, Double], maxLen: Int): Column => Column = {
    val f = udf { t: String =>
      if (t == null) null
      else {
        var pos = 0
        var cost = 0.0
        var dead = false
        while (pos < t.length && !dead) {
          var l = math.min(maxLen, t.length - pos)
          var found = false
          while (l >= 1 && !found) {
            model.get(t.substring(pos, pos + l)) match {
              case Some(c) => cost += c; pos += l; found = true
              case None => l -= 1
            }
          }
          if (!found) dead = true
        }
        if (dead) null else java.lang.Double.valueOf(cost)
      }
    }
    c => f(c)
  }

  def bpeEncode(merges: Seq[(String, String)]): Column => Column = {
    val ms = merges.toArray
    val rank: Map[(String, String), Int] =
      ms.zipWithIndex.map { case (p, i) => (p, i) }.toMap
    val f = udf { t: String =>
      if (t == null) null
      else {
        var toks: Array[String] = {
          val a = new Array[String](t.length)
          var i = 0
          while (i < t.length) { a(i) = String.valueOf(t.charAt(i)); i += 1 }
          a
        }
        var done = toks.length < 2
        while (!done) {
          var best = Int.MaxValue
          var i = 0
          while (i < toks.length - 1) {
            val r = rank.getOrElse((toks(i), toks(i + 1)), Int.MaxValue)
            if (r < best) best = r
            i += 1
          }
          if (best == Int.MaxValue) done = true
          else {
            val (a, b) = ms(best)
            val out = new scala.collection.mutable.ArrayBuffer[String](toks.length)
            var j = 0
            while (j < toks.length) {
              if (j < toks.length - 1 && toks(j) == a && toks(j + 1) == b) {
                out += (a + b); j += 2
              } else { out += toks(j); j += 1 }
            }
            toks = out.toArray
            done = toks.length < 2
          }
        }
        toks
      }
    }
    c => f(c)
  }
}
