package graft

/** Property tests for the operational-regime capabilities: the epoch
  * reshuffle's permutation guarantees (q74) and the merge upsert's
  * layout-reuse contract (q72). These assert the semantics the DuckDB hash
  * gate cannot see — "different order per epoch", "untouched partitions'
  * files byte-identical".
  */
class OperationalSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("q72: merge rewrites ONLY the affected partition; untouched partition files are byte-identical") {
    ScaleQueries.purgeLayouts(spark, sf, Seq("graft_corpus_base"))
    val otherLangs = Set("de", "es", "fr", "zh")

    // run 1: cold — builds the partitioned base, then merges the en batch
    val merged1 = ScaleQueries.q72MergeUpsert(spark, sf).count()
    val dir = java.nio.file.Paths.get(
      new java.net.URI(spark.conf.get("spark.sql.warehouse.dir")).getPath,
      s"graft_corpus_base_${ScaleQueries.sfTag(sf)}").toString
    val before = graft.operators.Merge.partitionFileInventory(dir, "lang", Set("en"))
    val beforeEn = graft.operators.Merge.partitionFileInventory(dir, "lang", otherLangs)

    // run 2: base layout reused (write-once spec intact), merge re-applied
    val merged2 = ScaleQueries.q72MergeUpsert(spark, sf).count()
    val after = graft.operators.Merge.partitionFileInventory(dir, "lang", Set("en"))
    val afterEn = graft.operators.Merge.partitionFileInventory(dir, "lang", otherLangs)

    // the contract: a merge touching only lang=en leaves every other
    // partition's files untouched — same names, sizes, mtimes, and bytes
    before should not be empty
    after shouldBe before
    // …while the affected partition really was rewritten (fresh task files)
    beforeEn should not be empty
    afterEn.keySet should not equal beforeEn.keySet
    // idempotent: the batch derives from the SOURCE table, so re-merging an
    // already-merged base reproduces the same corpus
    merged2 shouldBe merged1
    val docs = Tables.documents(spark, sf)
    val inserts = docs.filter(
      org.apache.spark.sql.functions.col("lang") === "en" &&
        org.apache.spark.sql.functions.pmod(
          org.apache.spark.sql.functions.col("doc_id"),
          org.apache.spark.sql.functions.lit(11)) === 5).count()
    merged1 shouldBe docs.count() + inserts
  }

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
