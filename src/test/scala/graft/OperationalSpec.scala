package graft

/** Property tests for the round-7 operational capabilities: the epoch
  * reshuffle's permutation guarantees (q74), the merge upsert's layout reuse
  * (q72), the incremental dedup's batch/corpus contract (q73), and the PQ
  * codes' reconstruction quality (q76). These assert the semantics the
  * DuckDB hash gate cannot see — "different order per epoch", "untouched
  * partitions' files unchanged", "reconstruction close to the original".
  */
class OperationalSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("q74: every epoch is a valid per-shard permutation, and epochs are different permutations") {
    val rows = SampleQueries.q74EpochReshuffle(spark, sf).collect()
      .map(r => (r.getInt(1), r.getLong(0), r.getInt(2), r.getInt(3))) // epoch, doc, shard, pos
    val byEpoch = rows.groupBy(_._1)
    byEpoch.keySet shouldBe (0 until SampleQueries.N_EPOCHS).toSet

    // validity: within each (epoch, shard), positions are exactly 1..n
    for ((_, es) <- byEpoch; (_, cell) <- es.groupBy(_._3))
      cell.map(_._4).sorted shouldBe (1 to cell.length)

    // difference: the fraction of docs landing on the SAME (shard, position)
    // in two epochs is the collision rate of two independent permutations
    // (~1/#shards at matching sizes) — far below 1. A deterministic-but-
    // equal "reshuffle" would score 1.0 and fail here.
    val perms = byEpoch.view.mapValues(_.map(t => t._2 -> ((t._3, t._4))).toMap).toMap
    for (a <- perms.keys; b <- perms.keys if a < b) {
      val docs = perms(a).keySet
      docs shouldBe perms(b).keySet // same corpus, re-ordered
      val same = docs.count(id => perms(a)(id) == perms(b)(id))
      val frac = same.toDouble / docs.size
      withClue(s"epochs $a vs $b identical-placement fraction $frac:") {
        frac should be < 0.5
      }
    }
  }
}
