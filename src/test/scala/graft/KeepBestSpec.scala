package graft

/** C4c — quality-aware retention over near-dup clusters. Verified by
  * CROSS-CONSISTENCY with the two operators it composes: clusters must
  * be exactly dedup_clusters' clusters, and the kept member must be the
  * text_quality argmax (quality_bp desc, doc_id tie-break) within each —
  * so a regression in either composition leg, or a silent fall-back to
  * min-id canonical selection, fails here.
  */
class KeepBestSpec extends SparkSpec {

  test("dedup_keep_best: clusters match dedup_clusters; kept is the quality argmax") {
    val clusters = SparkEntry.queries("dedup_clusters")(spark, sf()).collect()
      .map(r => r.getLong(0) -> r.getString(2).split(",").map(_.toLong).toSet)
      .toMap
    val quality = SparkEntry.queries("text_quality")(spark, sf()).collect()
      .map(r => r.getLong(0) -> r.getLong(6)).toMap
    val kb = SparkEntry.queries("dedup_keep_best")(spark, sf()).collect()

    assert(kb.map(_.getLong(0)).toSet == clusters.keySet,
      "cluster ids drifted from dedup_clusters")
    kb.foreach { r =>
      val (cid, size, kept, keptQ) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      val dropped = r.getString(4).split(",").map(_.toLong).toSeq
      val members = clusters(cid)
      assert(size == members.size && (dropped.toSet + kept) == members,
        s"cluster $cid: {kept} ∪ dropped != dedup_clusters members")
      assert(dropped == dropped.sorted, s"cluster $cid: dropped_ids unsorted")
      val expect = members.toSeq.minBy(id => (-quality(id), id))
      assert(kept == expect && keptQ == quality(kept),
        s"cluster $cid: kept $kept != quality argmax $expect")
    }
    // the policy must actually differ from min-id canonical selection
    // somewhere, or this spec would pass on a dedup_clusters re-label
    assert(kb.exists(r => r.getLong(2) != r.getLong(0)),
      "no cluster keeps a non-min member — argmax untested by this corpus")
  }
}
