package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

import graft.operators.TextOps

/** Lexical retrieval over `documents` — the keyword-search half of the
  * retrieval story (the ANN family in [[SimilarityQueries]] is the other
  * half): BM25 scoring of a fixed query against the whole corpus, and
  * PMI-style bigram collocation mining of the corpus itself.
  *
  * Scale shape: BOTH queries are scan-shaped. q80 never builds an inverted
  * index — for a FIXED query the per-term term frequencies are per-row array
  * folds inside the scan (no explode, no per-term shuffle), the corpus
  * statistics (N, avgdl, per-term document frequencies) are ONE scalar
  * aggregate broadcast back, and the final top-k is TakeOrderedAndProject
  * (k rows per task, never a global sort). On 100 TB that is: two
  * column-pruned passes over `text`, zero keyed exchanges, one k-row
  * driver-side heap — the plan a hand-built sharded index would only beat
  * once queries-per-corpus-pass grows large.
  */
object RetrievalQueries {
  import Queries.Q

  /** The fixed query, in declared (summation) order. */
  private[graft] val Q_TERMS = Seq("vector", "merge", "scan")
  private val K1 = 1.2
  private val B = 0.75
  private val TOP_K = 20

  /** q80: BM25 retrieval — the classic probabilistic lexical ranker:
    * score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))
    * with idf(t) = ln(1 + (N − df + 0.5)/(df + 0.5)).
    *
    * Determinism contract (the q75 discipline): tf, dl, df, N are exact
    * integers (gated directly); avgdl and every score term are fixed-order
    * IEEE double trees the oracle replays term by term; `ln` is the one
    * non-bit-portable step (measured 1-ulp JVM-vs-DuckDB disagreements at
    * ~4e-4 rate on q75's corpus), so the gated score is quantized to
    * integer micro-points via floor(score·1e6) and the rank is derived
    * from the QUANTIZED score (desc, doc_id tiebreak) — never from the
    * raw double, so a sub-micro wiggle cannot flip the gated ordering.
    * A zero-tf term contributes an exact 0.0 in both engines, so the sum
    * needs no per-term conditionals. */
  /** (doc_id, dl, tf_<term>…): the in-scan per-document features — batch
    * query and streaming twin build these IDENTICAL columns (the windowed-
    * agg/sessionize "same builder" discipline, applied to retrieval). */
  private[graft] def perDocFeatures(docs: org.apache.spark.sql.DataFrame) = {
    val w = TextOps.words(col("text"))
    def tfCol(t: String): Column =
      size(filter(w, x => x === lit(t))).cast(LongType)
    docs.filter(col("text").isNotNull)
      .select(
        (col("doc_id") +: size(w).cast(LongType).as("dl") +:
          Q_TERMS.map(t => tfCol(t).as(s"tf_$t"))): _*)
  }

  /** ONE scalar aggregate for every corpus statistic BM25 needs. */
  private[graft] def corpusStats(perDoc: org.apache.spark.sql.DataFrame) = {
    val statCols =
      count(lit(1)).cast(DoubleType).as("n_docs") +:
        sum(col("dl")).as("sum_dl") +:
        Q_TERMS.map(t =>
          sum(when(col(s"tf_$t") > 0, 1L).otherwise(0L))
            .cast(DoubleType).as(s"df_$t"))
    perDoc.agg(statCols.head, statCols.tail: _*)
  }

  /** Scores features against a (broadcast) 1-row stats frame; emits every
    * hit (some query term present) with its quantized score. The const-key
    * equi-join form works identically for a batch frame and a streaming
    * feed (stream-static joins need an equi-condition; the 1-row stats
    * side broadcasts either way). */
  private[graft] def scoreAgainst(perDoc: org.apache.spark.sql.DataFrame,
                                  stats: org.apache.spark.sql.DataFrame) = {
    val avgdl = col("sum_dl").cast(DoubleType) / col("n_docs")
    def termScore(t: String): Column = {
      val tf = col(s"tf_$t").cast(DoubleType)
      val idf = log(lit(1.0) +
        (col("n_docs") - col(s"df_$t") + lit(0.5)) / (col(s"df_$t") + lit(0.5)))
      idf * (tf * lit(K1 + 1.0)) /
        (tf + lit(K1) * (lit(1.0) - lit(B) + lit(B) * col("dl") / avgdl))
    }
    val score = Q_TERMS.map(termScore).reduce(_ + _)
    perDoc.withColumn("__one", lit(1))
      .join(broadcast(stats.withColumn("__one", lit(1))), "__one")
      .select(
        col("doc_id") +: col("dl") +:
          Q_TERMS.map(t => col(s"tf_$t")) :+
          floor(score * lit(1000000.0)).cast(LongType).as("score_micro"): _*)
      .filter(Q_TERMS.map(t => col(s"tf_$t") > 0).reduce(_ || _))
  }

  val q80Bm25: Q = (s, d) => {
    val perDoc = perDocFeatures(Tables.documents(s, d))
    val hits = scoreAgainst(perDoc, corpusStats(perDoc))
    // Top-k FIRST (TakeOrderedAndProject: a k-row heap per scan task, never
    // a global sort), then rank the k survivors with a trivial window.
    hits
      .orderBy(col("score_micro").desc, col("doc_id"))
      .limit(TOP_K)
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("score_micro").desc, col("doc_id"))).cast(LongType))
  }

  /** q83: PMI bigram collocations — the corpus-statistics classic for
    * finding multi-word expressions ("new york", "machine learning") worth
    * treating as single tokens in a vocabulary build (complements q53's
    * unigram top-k). Pointwise mutual information compares the observed
    * bigram rate to the independence expectation; since log is monotone,
    * the gated statistic is the RAW ODDS RATIO
    *   r = (c_xy · N_uni²) / (N_bi · c_x · c_y)
    * — exact BIGINT products (ANSI mode faults on overflow rather than
    * corrupting; a >2^63-scale corpus upgrades them to DECIMAL) divided
    * ONCE into a double, so unlike q75/q80 nothing needs quantizing: the
    * ranking is bit-exact with zero transcendentals.
    *
    * Scale shape: two keyed count shuffles (bigrams, unigrams) that
    * collapse map-side; the unigram vocabulary broadcasts back onto the
    * bigram counts (bounded vocab — an unbounded-key corpus flips these
    * to a shuffle join, same semantics); corpus totals are one scalar
    * broadcast; top-k is a TakeOrderedAndProject heap. */
  private val PMI_MIN_COUNT = 5
  private val PMI_TOP_K = 50

  val q83PmiBigrams: Q = (s, d) => {
    val w = TextOps.words(col("text"))
    val docs = Tables.documents(s, d).filter(col("text").isNotNull)
    val uni = docs.select(explode(w).as("t"))
      .groupBy(col("t")).agg(count(lit(1)).as("c"))
    val bi = docs
      .select(explode(zip_with(
        slice(w, lit(1), size(w) - 1), slice(w, lit(2), size(w) - 1),
        (a, b) => struct(a.as("ta"), b.as("tb")))).as("p"))
      .select(col("p.ta").as("term_a"), col("p.tb").as("term_b"))
      .groupBy(col("term_a"), col("term_b")).agg(count(lit(1)).as("c_xy"))
    val tot = docs.agg(
      sum(size(w).cast(LongType)).as("n_uni"),
      sum((size(w) - 1).cast(LongType)).as("n_bi"))
    bi.filter(col("c_xy") >= PMI_MIN_COUNT)
      .join(broadcast(uni.withColumnRenamed("t", "term_a")
        .withColumnRenamed("c", "c_a")), Seq("term_a"))
      .join(broadcast(uni.withColumnRenamed("t", "term_b")
        .withColumnRenamed("c", "c_b")), Seq("term_b"))
      .crossJoin(broadcast(tot))
      .select(col("term_a"), col("term_b"), col("c_xy"), col("c_a"), col("c_b"),
        ((col("c_xy") * col("n_uni") * col("n_uni")).cast(DoubleType) /
          (col("n_bi") * col("c_a") * col("c_b")).cast(DoubleType))
          .as("pmi_ratio"))
      .orderBy(col("pmi_ratio").desc, col("term_a"), col("term_b"))
      .limit(PMI_TOP_K)
  }

  /** q90: BPE tokenizer training with BATCHED merge rounds — the
    * iterative pair-merge loop of Sennrich et al. 2016, run the way a
    * distributed vocab learner must: instead of one driver round trip per
    * merge, each round counts pairs ONCE, ranks the top [[BPE_CAND]]
    * candidates, and accepts up to [[BPE_BATCH]] of them whose symbols
    * are DISJOINT from every higher-ranked candidate (including its
    * concatenation — the conflict rule), then applies all accepted
    * replaces in rank order. Merging (a,b) can only change the counts of
    * pairs touching a or b, so disjoint batch-mates' counts and relative
    * order are exactly what sequential BPE saw at round START; sequential
    * may still interleave a merge newly CREATED within the round (e.g.
    * prefer a pair produced by an earlier batch-mate's merge), so merge
    * ORDER can diverge even on conflict-free batches — the OperationalSpec
    * examples are the cases where full equivalence holds, plus batch=1 ≡
    * the sequential learner verbatim. The oracle replays this identical
    * batched algorithm, so gating is exact either way. Tie-break
    * everywhere is (count desc, pair asc).
    *
    * Symbol sequences are strings with a TWO-space gap between symbols and
    * a one-space pad at each end, so "merge pair (x,y)" is the literal
    * replace of " x  y " with " xy " — each match consumes one space of
    * each neighboring gap and the replacement restores it, so adjacent
    * occurrences ("a b a b") all merge in one left-to-right pass, exactly
    * BPE's greedy non-overlapping application, with no token-boundary
    * false positives ("xa b" never matches " a  b "). Characters split by
    * codepoint (substr semantics) on both engines, so the zh corpus is
    * safe.
    *
    * Scale shape: the corpus collapses to the word-frequency table in one
    * keyed shuffle BEFORE any BPE work (the vocabulary, not the corpus, is
    * the working set — the classic trick that makes BPE training cheap at
    * 100 TB); each round is ONE pair-count aggregation over that bounded
    * table, one [[BPE_CAND]]-row TakeOrdered collect (model-sized, the
    * q195/q206 literal discipline — the accepted merges enter the next
    * plan as literals), and one localCheckpoint that pins the re-segmented
    * word table so lineage stays ONE round deep no matter how many rounds
    * run: R·B merges cost R driver syncs, not R·B, and the 10³–10⁴-merge
    * production regime is the same loop with bigger R. */
  private[graft] val BPE_BATCH = 8
  private[graft] val BPE_BATCH_ROUNDS = 6
  private[graft] val BPE_CAND = 48

  val q90BpeMerges: Q = (s, d) =>
    bpeState(Tables.documents(s, d), BPE_BATCH_ROUNDS, BPE_BATCH)._1

  /** The shared batched learner state: (learned merges, the word table's
    * final segmentation). q90 reports the merges; q102 reports the
    * encoding the merges induce — one machine, both views, so the two can
    * never drift. Merges carry (round, rank) — rank is the within-batch
    * acceptance order, so the full merge list is totally ordered. */
  private[graft] def bpeState(docs: org.apache.spark.sql.DataFrame,
                              rounds: Int, batch: Int) = {
    val spark = docs.sparkSession
    val wf = docs.filter(col("text").isNotNull)
      .select(explode(TextOps.words(col("text"))).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))
    val chars = transform(sequence(lit(1), length(col("word"))),
      i => substr(col("word"), i, lit(1)))
    var seqs = wf.select(col("word"), col("freq"),
      concat(lit(" "), array_join(chars, "  "), lit(" ")).as("seq"))
    val merges = scala.collection.mutable.ArrayBuffer
      .empty[(Int, Int, String, String, Long)]
    for (round <- 1 to rounds) {
      val toks = split(trim(col("seq")), "  ")
      // ONE count pass; the candidate window is model-sized (≤ BPE_CAND
      // rows via TakeOrderedAndProject), so the collect is a metadata
      // fetch, not a data collect
      val cand = seqs
        .select(col("freq"), explode(zip_with(
          slice(toks, lit(1), size(toks) - 1), slice(toks, lit(2), size(toks) - 1),
          (a, b) => struct(a.as("ta"), b.as("tb")))).as("p"))
        .groupBy(col("p.ta").as("term_a"), col("p.tb").as("term_b"))
        .agg(sum(col("freq")).as("pair_count"))
        .orderBy(col("pair_count").desc, col("term_a"), col("term_b"))
        .limit(BPE_CAND)
        .collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      // accept rule (replayed verbatim by the oracle's NOT EXISTS): a
      // candidate survives iff its symbols avoid every HIGHER-RANKED
      // candidate's {ta, tb, ta||tb} — the concatenation guard keeps a
      // later pair from touching a symbol a batch-mate just created;
      // first `batch` survivors (in rank order) are this round's merges
      val accepted = scala.collection.mutable.ArrayBuffer
        .empty[(String, String, Long)]
      for (i <- cand.indices if accepted.size < batch) {
        val (ta, tb, c) = cand(i)
        val conflict = cand.take(i).exists { case (pa, pb, _) =>
          val syms = Set(pa, pb, pa + pb)
          syms(ta) || syms(tb)
        }
        if (!conflict) accepted += ((ta, tb, c))
      }
      merges ++= accepted.zipWithIndex.map { case ((ta, tb, c), k) =>
        (round, k + 1, ta, tb, c)
      }
      // apply in rank order (disjointness makes the order immaterial, but
      // both engines fold in the same order anyway); localCheckpoint pins
      // the result so lineage never grows past one round
      val applied = accepted.foldLeft(col("seq")) { case (acc, (ta, tb, _)) =>
        replace(acc, lit(s" $ta  $tb "), lit(s" $ta$tb "))
      }
      seqs = seqs.select(col("word"), col("freq"), applied.as("seq"))
        .localCheckpoint(true)
    }
    import spark.implicits._
    val mergeDf = merges.toSeq
      .toDF("round", "merge_rank", "term_a", "term_b", "pair_count")
    (mergeDf, seqs)
  }

  /** The one-merge-per-round sequential learner (the pre-batching shape):
    * q90's semantic anchor — OperationalSpec proves bpeState(batch = 1)
    * reproduces it merge-for-merge and bit-for-bit on the real corpus,
    * and that batching itself is invisible when the batch is
    * conflict-free. Never the production path (R merges = R driver
    * round trips and R-deep lineage). */
  private[graft] def bpeStateSeq(docs: org.apache.spark.sql.DataFrame,
                                 rounds: Int) = {
    val wf = docs.filter(col("text").isNotNull)
      .select(explode(TextOps.words(col("text"))).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))
    val chars = transform(sequence(lit(1), length(col("word"))),
      i => substr(col("word"), i, lit(1)))
    var seqs = wf.select(col("word"), col("freq"),
      concat(lit(" "), array_join(chars, "  "), lit(" ")).as("seq"))
    val merges = (1 to rounds).map { round =>
      val toks = split(trim(col("seq")), "  ")
      val best = seqs
        .select(col("freq"), explode(zip_with(
          slice(toks, lit(1), size(toks) - 1), slice(toks, lit(2), size(toks) - 1),
          (a, b) => struct(a.as("ta"), b.as("tb")))).as("p"))
        .groupBy(col("p.ta").as("term_a"), col("p.tb").as("term_b"))
        .agg(sum(col("freq")).as("pair_count"))
        .orderBy(col("pair_count").desc, col("term_a"), col("term_b"))
        .limit(1)
      seqs = seqs.crossJoin(broadcast(best))
        .select(col("word"), col("freq"),
          replace(col("seq"),
            concat(lit(" "), col("term_a"), lit("  "), col("term_b"), lit(" ")),
            concat(lit(" "), col("term_a"), col("term_b"), lit(" "))).as("seq"))
      best.select(lit(round).as("round"), col("term_a"), col("term_b"),
        col("pair_count"))
    }
    (merges.reduce(_ union _), seqs)
  }

  /** q102: BPE encoding — APPLY the q90-learned merges: every corpus word
    * with its frequency and its final subword segmentation after
    * [[BPE_BATCH_ROUNDS]] batched rounds (the tokenizer-apply step between
    * "learn the vocab" and "pack the shards"; q17 counts whitespace
    * tokens, this produces the subword stream an LM actually consumes).
    *
    * Scale shape: identical to q90 — encoding operates on the DISTINCT
    * word table (one keyed count shuffle), and each batch of merges is a
    * literal fold of codegen'd string replaces over the checkpointed word
    * table, so R rounds add zero exchanges. Corpus text never re-scans
    * per round. A production-R (tens of thousands of merges) tokenizer
    * leaves the relational unroll for a per-partition priority-queue
    * encoder at the mapPartitions altitude; the semantics gated here are
    * the same. */
  val q102BpeEncode: Q = (s, d) => {
    val seqs = bpeState(Tables.documents(s, d), BPE_BATCH_ROUNDS, BPE_BATCH)._2
    val toks = split(trim(col("seq")), "  ")
    seqs.select(col("word"), col("freq"),
      size(toks).as("n_tokens"),
      concat_ws(" ", toks).as("tokens"))
  }

  /** q94: unigram LM surprisal scoring — the CCNet-style quality signal: a
    * document whose words are corpus-rare carries high average surprisal
    * (could be valuable rare content OR garbage; either way it's the
    * standard axis an LM-perplexity filter thresholds, here with the
    * corpus itself as the LM). Per word, surprisal is quantized to INTEGER
    * BITS: bits(w) = floor(log2(N / count(w))) computed EXACTLY as
    * bit-width minus one of the integer quotient (length(bin(N div c)) −
    * 1) — no transcendental ever evaluates, so unlike q75/q80 there is no
    * 1-ulp engine divergence to quantize away, and the per-doc BIGINT sums
    * are order-independent by construction (a per-word double-ln sum would
    * floor-diverge at the measured 4e-4 rate × 57k tokens ≈ 20 boundary
    * hits — unusable for a hash gate).
    *
    * Scale shape: the vocabulary aggregation is one keyed shuffle that
    * collapses map-side (q53's shape); the per-word bit costs broadcast
    * back onto the in-scan exploded words (bounded vocab — an unbounded
    * vocabulary flips this to a shuffle join, same semantics); the per-doc
    * regroup carries (doc_id, bits) longs. avg_bits is one exact IEEE
    * division per doc at the end. */
  val q94LmSurprisal: Q = (s, d) => {
    val docs = Tables.documents(s, d).filter(col("text").isNotNull)
    val toks = docs.select(col("doc_id"),
      explode(TextOps.words(col("text"))).as("t"))
    val vocab = toks.groupBy(col("t")).agg(count(lit(1)).as("c"))
    val total = vocab.agg(sum(col("c")).as("n_total"))
    val bits = vocab.crossJoin(broadcast(total))
      .select(col("t"), expr("length(bin(n_total div c)) - 1").as("bits"))
    toks.join(broadcast(bits), "t")
      .groupBy(col("doc_id")).agg(
        count(lit(1)).as("n_tokens"),
        sum(col("bits")).as("total_bits"))
      .withColumn("avg_bits",
        col("total_bits").cast(org.apache.spark.sql.types.DoubleType) /
          col("n_tokens"))
  }

  /** q106: bigram-LM surprisal — q94's unigram filter upgraded to the
    * CONDITIONAL model: each adjacent pair (a, b) costs
    * bits = ⌊log₂((c_a + V) / (c_ab + 1))⌋, the add-one-smoothed
    * P(b|a) = (c_ab + 1)/(c_a + V) in q94's integer-bit quantization —
    * bit-width of the BIGINT quotient, no transcendental, so per-doc
    * BIGINT sums are order-free and hash-exact (the reason q94 chose
    * integer bits: a double-ln sum would floor-diverge ~20× per corpus).
    * A doc full of common words in UNCOMMON orders — the word-salad spam
    * a unigram model scores as fluent — now pays for every surprising
    * transition. Smoothing guarantees c_a + V > c_ab, so every quotient
    * is ≥ 1 and bits ≥ 0.
    *
    * Scale shape: two corpus count shuffles (bigrams, unigrams) that
    * collapse map-side; V is a 1-row scalar broadcast; both count tables
    * broadcast back onto the in-scan bigram stream (bounded vocab — the
    * q83 note); the per-doc regroup carries (doc_id, bits) longs. */
  val q106BigramSurprisal: Q = (s, d) => {
    // Measured (r18 opt): rebalancing this scan was flat — the cost is the
    // downstream bigram aggregation, not the in-scan split. Kept in-scan.
    val docs = Tables.documents(s, d).filter(col("text").isNotNull)
    val w = TextOps.words(col("text"))
    val bigrams = docs.select(col("doc_id"), explode(zip_with(
        slice(w, lit(1), size(w) - 1), slice(w, lit(2), size(w) - 1),
        (a, b) => struct(a.as("ta"), b.as("tb")))).as("p"))
      .select(col("doc_id"), col("p.ta").as("ta"), col("p.tb").as("tb"))
    val uni = docs.select(explode(w).as("t"))
      .groupBy(col("t")).agg(count(lit(1)).as("c_a"))
    val bi = bigrams.groupBy(col("ta"), col("tb")).agg(count(lit(1)).as("c_ab"))
    val v = uni.agg(count(lit(1)).as("v"))
    bigrams
      .join(broadcast(bi), Seq("ta", "tb"))
      .join(broadcast(uni.withColumnRenamed("t", "ta")), Seq("ta"))
      .crossJoin(broadcast(v))
      .select(col("doc_id"),
        expr("length(bin((c_a + v) div (c_ab + 1))) - 1").as("bits"))
      .groupBy(col("doc_id")).agg(
        count(lit(1)).as("n_bigrams"),
        sum(col("bits")).as("total_bits"))
      .withColumn("avg_bits",
        col("total_bits").cast(org.apache.spark.sql.types.DoubleType) /
          col("n_bigrams"))
  }

  private val KN_SCALE = 1000000000000L // 10^12 fixed-point probability
  private val KN_TOPK = 100

  /** q204: interpolated KNESER–NEY bigram probabilities (Kneser & Ney '95;
    * Chen & Goodman '99, the smoothing every n-gram LM toolkit ships as
    * its default) — the q106 model upgraded from add-one to the estimator
    * that actually wins perplexity: absolute discount D = 3/4 off every
    * observed bigram, the freed mass backed off to the CONTINUATION
    * unigram P_cont(b) = N1+(·b)/NT — "how many contexts does b complete"
    * — which is what demotes high-count-but-one-context tokens
    * ("Francisco") that a raw unigram back-off overpromotes.
    *
    * Fixed-point exactness: with D = 3/4,
    *   P(b|a)·10¹² = ((4·c_ab − 3)·S) div (4·c_a)
    *               + (3·N1a·N1b·S) div (4·c_a·NT)
    * — two floor divisions over exact counts, order-free, hash-gated; the
    * second runs in DECIMAL(38,0) (Spark) / HUGEINT (DuckDB) because
    * N1a·N1b·10¹² clears 2⁶³ on a real vocabulary. c_a is the BIGRAM
    * context total Σ_b c_ab (doc-final tokens excluded) — the correct KN
    * denominator, derived from the bigram table itself so numerator and
    * denominator cannot drift.
    *
    * Scale shape: bigrams stream from the scan (q106's zip_with, no
    * materialization); one keyed count shuffle; context and continuation
    * tables are vocab-bounded broadcasts (q83's note); NT is a 1-row
    * scalar; the top-K lands in TakeOrderedAndProject under the total
    * order (c_ab desc, ta, tb) — no global sort. */
  val q204KneserNey: Q = (s, d) => {
    val docs = Tables.documents(s, d).filter(col("text").isNotNull)
    val w = TextOps.words(col("text"))
    val bigrams = docs.select(explode(zip_with(
        slice(w, lit(1), size(w) - 1), slice(w, lit(2), size(w) - 1),
        (a, b) => struct(a.as("ta"), b.as("tb")))).as("p"))
      .select(col("p.ta").as("ta"), col("p.tb").as("tb"))
    val bc = bigrams.groupBy(col("ta"), col("tb")).agg(count(lit(1)).as("c_ab"))
    val ctx = bc.groupBy(col("ta"))
      .agg(sum(col("c_ab")).as("c_a"), count(lit(1)).as("n1a"))
    val cont = bc.groupBy(col("tb")).agg(count(lit(1)).as("n1b"))
    val nt = bc.agg(count(lit(1)).as("nt"))
    bc.join(broadcast(ctx), "ta").join(broadcast(cont), "tb")
      .crossJoin(broadcast(nt))
      .select(col("ta"), col("tb"), col("c_ab"), col("c_a"),
        col("n1a"), col("n1b"), col("nt"),
        (expr(s"((4 * c_ab - 3) * $KN_SCALE) div (4 * c_a)") +
          expr(s"CAST((CAST(3 * n1a AS DECIMAL(38,0)) * n1b * $KN_SCALE) " +
            "div (4 * c_a * nt) AS BIGINT)")).as("p_kn_fp"))
      .orderBy(col("c_ab").desc, col("ta"), col("tb")).limit(KN_TOPK)
  }

  /** q117: DSIR-style importance-weighted data selection (Xie et al. 2023,
    * "Data Selection for Language Models via Importance Resampling"): score
    * every document by how much more likely its text is under a TARGET
    * domain's hashed-unigram LM than under the raw-corpus LM, then select
    * the docs whose mean per-token log-ratio is ≥ 0 — "more target-like
    * than raw". The target here is the German sub-corpus (any domain
    * label works: the machinery only needs a target predicate); features
    * are words hashed into [[DSIR_B]] buckets (the paper's hashed n-gram
    * trick, which bounds BOTH distributions at [[DSIR_B]] rows no matter
    * the vocabulary).
    *
    * Determinism: the per-bucket log-ratio
    * log2(P_t(b)/P_r(b)) with add-one smoothing
    * P_t(b) = (ct+1)/(Nt+B), P_r(b) = (cr+1)/(Nr+B)
    * is quantized to INTEGER BITS by q94's rule applied to the cross-
    * multiplied BIGINT quotient: num = (ct+1)·(Nr+B), den = (cr+1)·(Nt+B),
    * bits = len(bin(num div den)) − 1 when num ≥ den else
    * 1 − len(bin(den div num)) — no transcendental, so per-doc BIGINT sums
    * are order-free and the ≥ 0 selection threshold is the exact integer
    * cross-multiplication of "mean bits ≥ 0" (q114's discipline). Products
    * stay ≤ tokens², far inside BIGINT at any tested SF (at true corpus
    * scale the counts themselves cap the product; rescale both sides by a
    * common shift if a corpus ever approaches 2^31 tokens).
    *
    * Scale shape: ONE token scan builds both distributions (conditional
    * sums per bucket — a [[DSIR_B]]-row table, one map-side-combined
    * shuffle); totals are a 1-row broadcast; the 256-row bits table
    * broadcasts back onto the in-scan token stream; the per-doc regroup
    * carries (doc_id, lang, bits) — the corpus never joins an
    * assignment table and never shuffles text. */
  private val DSIR_B = 256L
  private val DSIR_TARGET = "de"
  private val DSIR_SALT = "dsir:"

  val q117DsirSelection: Q = (s, d) => {
    // one md5 per TOKEN (~100× |docs|) fused into the scan — rebalance
    // (layout-adaptive, no-op at many-row-group inputs) so the token
    // hashing runs at core width
    val docs = Tables.spreadForCompute(
      Tables.documents(s, d).filter(col("text").isNotNull)
        .select(col("doc_id"), col("lang"), col("text")),
      col("doc_id"))
    val bucketed = docs
      .select(col("doc_id"), col("lang"),
        explode(TextOps.words(col("text"))).as("t"))
      .select(col("doc_id"), col("lang"),
        pmod(TextOps.hash60(concat(lit(DSIR_SALT), col("t"))), lit(DSIR_B)).as("b"))
    val cnt = bucketed.groupBy(col("b")).agg(
      sum(when(col("lang") === DSIR_TARGET, 1L).otherwise(0L)).as("ct"),
      sum(when(col("lang") =!= DSIR_TARGET, 1L).otherwise(0L)).as("cr"))
    // totals as an unpartitioned window over the 256-row count table: a
    // separate .agg would re-plan (and re-scan) the whole count subtree —
    // a second full token pass — where this is a 256-row single-partition
    // window (q94 pays that extra scan; bounded-B makes it avoidable here)
    val totW = org.apache.spark.sql.expressions.Window.partitionBy()
    val bits = cnt
      .withColumn("nt", sum(col("ct")).over(totW))
      .withColumn("nr", sum(col("cr")).over(totW))
      .select(col("b"),
        ((col("ct") + lit(1L)) * (col("nr") + lit(DSIR_B))).as("num"),
        ((col("cr") + lit(1L)) * (col("nt") + lit(DSIR_B))).as("den"))
      .select(col("b"),
        when(col("num") >= col("den"), expr("length(bin(num div den)) - 1"))
          .otherwise(lit(1) - expr("length(bin(den div num))")).as("bits"))
    bucketed.join(broadcast(bits), Seq("b"))
      .groupBy(col("doc_id"), col("lang")).agg(
        count(lit(1)).as("n_tokens"),
        sum(col("bits")).as("total_bits"))
      .select(col("doc_id"), col("lang"), col("n_tokens"), col("total_bits"),
        (col("total_bits") >= 0L).as("selected"))
  }

  /** q135: inverted-index construction — the batch-build artifact behind
    * every keyword search system (q80 deliberately scores a FIXED query
    * with no index; this builds the index for the many-queries regime):
    * per term, the document-frequency, the first posting, and the
    * remaining postings DELTA-GAP encoded (the classic posting-list
    * compression primitive — sorted ids stored as small gaps). Postings
    * are sorted doc_id sets, so the encoding is fully deterministic; gaps
    * ship as a CSV string (the gate hashes scalars, and the string IS the
    * serialized artifact). The [[IDX_MIN_DF]] floor keeps the demo output
    * bounded — a production build shards the full vocabulary instead of
    * truncating it.
    *
    * Scale shape: one tokenize scan, one (term, doc) distinct + term-keyed
    * list aggregation (both collapse map-side); the posting arrays never
    * re-shuffle after assembly. */
  private val IDX_MIN_DF = 20

  val q135InvertedIndex: Q = (s, d) => {
    val toks = Tables.documents(s, d).filter(col("text").isNotNull)
      .select(col("doc_id"), explode(TextOps.words(col("text"))).as("t"))
      .distinct()
    toks.groupBy(col("t"))
      .agg(sort_array(collect_set(col("doc_id"))).as("p"))
      .withColumn("df", size(col("p")).cast(LongType))
      .filter(col("df") >= IDX_MIN_DF)
      .select(col("t"), col("df"),
        element_at(col("p"), 1).as("first_id"),
        concat_ws(",", transform(
          sequence(lit(2), size(col("p"))),
          i => (element_at(col("p"), i) - element_at(col("p"), i - 1))
            .cast(org.apache.spark.sql.types.StringType))).as("gaps"))
  }

  /** q139: phrase search over positional postings — the evaluation-side
    * twin of q135's index BUILD: the corpus's top-[[PHRASE_TOP]] word
    * bigrams become the "query log", and each phrase is answered the way
    * a positional inverted index answers it — join the first term's
    * postings (doc_id, pos) to the second term's postings at pos+1 —
    * yielding per-phrase occurrence and document counts. Repeated
    * occurrences inside one document make n_occ > n_docs, so the gate
    * distinguishes positional evaluation from mere co-occurrence.
    *
    * Scale shape: the query terms broadcast-prune the token stream IN
    * SCAN (BroadcastHashJoin against the ≤2·PHRASE_TOP term set), so the
    * posting join shuffles only the pruned postings — the corpus never
    * shuffles for evaluation. Query-log mining itself is one doc-keyed
    * lead() window — in production the phrase list is an input (or a
    * q115-style materialized artifact), and only the pruned-postings path
    * pays per query. */
  private val PHRASE_TOP = 5

  val q139PhraseSearch: Q = (s, d) => {
    import org.apache.spark.sql.expressions.Window
    // Measured (r18 opt): rebalancing this scan was flat — the cost is the
    // per-doc window + phrase aggregation, not the in-scan split.
    val toks = Tables.documents(s, d).filter(col("text").isNotNull)
      .select(col("doc_id"), posexplode(TextOps.words(col("text"))))
      .withColumnRenamed("col", "t")
    val wDoc = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val topq = toks
      .withColumn("nx", lead(col("t"), 1).over(wDoc))
      .filter(col("nx").isNotNull)
      .groupBy(col("t"), col("nx")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("t"), col("nx"))
      .limit(PHRASE_TOP)
      .select(col("t").as("q1"), col("nx").as("q2"))
    val terms = topq.select(explode(array(col("q1"), col("q2"))).as("qt")).distinct()
    val p = toks.join(broadcast(terms), col("t") === col("qt")).drop("qt")
    val hits = p.select(col("doc_id"), col("pos"), col("t").as("t1"))
      .join(p.select(col("doc_id").as("d2"), col("pos").as("p2"), col("t").as("t2")),
        col("doc_id") === col("d2") && col("p2") === col("pos") + 1)
      .join(broadcast(topq), col("t1") === col("q1") && col("t2") === col("q2"), "left_semi")
    hits.groupBy(concat_ws(" ", col("t1"), col("t2")).as("phrase"))
      .agg(count(lit(1)).as("n_occ"),
        countDistinct(col("doc_id")).as("n_docs"))
  }

  /** q97: TF-IDF top terms per document — the keyword-extraction classic
    * (and the feature behind sparse retrieval indexes and topic labels):
    * for every document, the [[TFIDF_TOP]] terms maximizing
    * tf·idf with idf = ln(1 + N/df). Complements q80 (fixed query, whole
    * corpus scored) with the transpose (every doc, its own best terms).
    *
    * Determinism: tf/df/N are exact integers; the single `ln` follows the
    * q80 discipline — quantize to integer micro-points and rank BY the
    * quantized score (desc, term tiebreak) so a 1-ulp JVM-vs-DuckDB wiggle
    * cannot flip the gated ordering.
    *
    * Scale shape: the corpus is tokenized ONCE — df is a count window
    * over the (doc_id, term) counts keyed by term, not a groupBy that
    * would re-derive tf in a second subtree (DataFrame reuse duplicates
    * the whole scan+explode+agg: measured plan had TWO Generate passes)
    * and not a collected vocabulary broadcast (no bounded-vocab
    * assumption — any term cardinality shuffles the same collapsed
    * counts). So: one (doc_id, term) count exchange, one term-keyed
    * window exchange, one doc-keyed rank window exchange whose rank<=3
    * filter pushes into WindowGroupLimit, plus a 1-row N broadcast from a
    * doc_id-only second scan. No global sort, no driver-side data. */
  private val TFIDF_TOP = 3

  val q97TfidfTerms: Q = (s, d) => {
    val docs = Tables.documents(s, d).filter(col("text").isNotNull)
    val tf = docs
      .select(col("doc_id"), explode(TextOps.words(col("text"))).as("term"))
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    tf.withColumn("df", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("term"))))
      .crossJoin(broadcast(nDocs))
      .select(col("doc_id"), col("term"), col("tf"), col("df"),
        floor(col("tf").cast(DoubleType) *
          log(lit(1.0) +
            col("n_docs").cast(DoubleType) / col("df").cast(DoubleType)) *
          lit(1000000.0)).cast(LongType).as("tfidf_micro"))
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("doc_id"))
          .orderBy(col("tfidf_micro").desc, col("term"))))
      .filter(col("rank") <= TFIDF_TOP)
  }

  /** q98: hybrid retrieval via reciprocal rank fusion — the standard RAG
    * recipe: run the lexical ranker (q80's BM25 top-20) and the vector
    * ranker (exact cosine top-20 against a fixed query embedding, q23's
    * fold contract) independently, then fuse on
    * rrf(d) = Σ_lists 1/(k + rank_d) with k = [[RRF_K]], missing-from-list
    * contributing 0. Rank fusion needs only the two k-row rank lists —
    * never the underlying scores — which is exactly why it composes
    * heterogeneous retrievers at any corpus scale.
    *
    * Determinism: ranks are exact integers; rrf is two correctly-rounded
    * IEEE divisions added in fixed (lex, vec) order — no transcendental,
    * so the RAW double is gated (no quantization needed; the q23/q81 raw
    * double discipline).
    *
    * Scale shape: two independent scan-shaped top-k jobs (each a
    * TakeOrderedAndProject k-row heap — q80's shape; the vector side
    * broadcasts the 1-row query embedding), then a full outer join of two
    * ≤k-row lists and a ≤2k-row rank window: everything after the scans is
    * constant-size regardless of corpus size. */
  private[graft] val RRF_K = 60
  private val HYBRID_K = 20

  val q98HybridRrf: Q = (s, d) => {
    import org.apache.spark.sql.expressions.Window
    val lex = q80Bm25(s, d).select(col("doc_id"), col("rank").as("lex_rank"))
    val cos = SimilarityQueries.cosineFnFor(s)
    val qv = Tables.embeddings(s, d).filter(col("vec_id") === 0)
      .select(col("embedding").as("q_emb"))
    val vec = Tables.embeddings(s, d).filter(col("vec_id") =!= 0)
      .crossJoin(broadcast(qv))
      .select(col("vec_id").as("doc_id"),
        cos(col("q_emb"), col("embedding")).as("sim"))
      .orderBy(col("sim").desc, col("doc_id")).limit(HYBRID_K)
      .withColumn("vec_rank", row_number().over(
        Window.orderBy(col("sim").desc, col("doc_id"))).cast(LongType))
      .select(col("doc_id"), col("vec_rank"))
    def rrfTerm(rank: Column): Column =
      coalesce(lit(1.0) / (lit(RRF_K.toDouble) + rank.cast(DoubleType)),
        lit(0.0))
    lex.join(vec, Seq("doc_id"), "full_outer")
      .select(col("doc_id"), col("lex_rank"), col("vec_rank"),
        (rrfTerm(col("lex_rank")) + rrfTerm(col("vec_rank"))).as("rrf"))
      .withColumn("fused_rank", row_number().over(
        Window.orderBy(col("rrf").desc, col("doc_id"))))
  }

  /** q187: deterministic weighted NEGATIVE SAMPLING — the word2vec /
    * contrastive-training primitive: 1000 draws from the unigram
    * distribution smoothed to n^(3/4) (Mikolov et al. 2013's exponent,
    * which up-weights rare words without letting stopwords dominate).
    *
    * Two determinism tricks make it hash-gateable where the textbook
    * implementation is irreproducible:
    *  - the SMOOTHED WEIGHT is w = ⌊√(c·⌊√c⌋)⌋ ≈ c^(3/4) — a composition
    *    of two integer square roots instead of exp(0.75·ln c), so no
    *    transcendental exists to 1-ulp-diverge; both engines evaluate the
    *    identical floor∘sqrt∘int pipeline (and sqrt is IEEE
    *    correctly-rounded everywhere, unlike pow/ln);
    *  - each draw k is a PURE FUNCTION of k: u_k = hash60("neg:"||k) mod
    *    W + 1, so any failed batch of draws re-materializes identically —
    *    the q74 replayability contract applied to sampling.
    * The draw resolves by inverse CDF: vocabulary words carry cumulative
    * weight intervals [cumlo, cumhi] and draw u lands in exactly one
    * interval — the q177 broadcast-interval probe, so the draw set never
    * pays a keyed exchange. The per-word interval walk is a window over
    * the VOCABULARY (bounded state, the q90/q163 argument; an unbounded
    * id space would route through q100's range-partitioned rank instead).
    * P(word) ∝ w exactly — frequent corpus words ("data", "line") must
    * surface in a 1000-draw sample; the gate sees every (k, u, word)
    * triple, not a summary. */
  private val NEG_K = 1000L

  val q187NegativeSampling: Q = (s, d) => {
    import org.apache.spark.sql.expressions.Window
    def isqrt(x: Column) = floor(sqrt(x.cast(DoubleType))).cast(LongType)
    val wt = Tables.documents(s, d)
      .select(explode(split(trim(col("text")), "\\s+")).as("word"))
      .filter(col("word") =!= "")
      .groupBy(col("word")).agg(count(lit(1)).as("c"))
      .withColumn("w", isqrt(col("c") * isqrt(col("c"))))
    val cum = wt
      .withColumn("cumhi", sum(col("w")).over(Window.orderBy(col("word"))
        .rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("cumlo", col("cumhi") - col("w") + 1)
    val tot = cum.agg(max(col("cumhi")).as("wtot"))
    val draws = s.range(NEG_K).select(col("id").as("k"))
      .crossJoin(broadcast(tot))
      .select(col("k"),
        (pmod(TextOps.hash60(concat(lit("neg:"), col("k").cast(
          org.apache.spark.sql.types.StringType))), col("wtot")) + 1).as("u"))
    draws.join(broadcast(cum),
        col("u") >= col("cumlo") && col("u") <= col("cumhi"))
      .select(col("k"), col("u"), col("word"), col("c"), col("w"))
  }

  val queries: Map[String, Q] = Map(
    "q187_negative_sampling" -> q187NegativeSampling,
    "q80_bm25" -> q80Bm25,
    "q83_pmi_bigrams" -> q83PmiBigrams,
    "q90_bpe_merges" -> q90BpeMerges,
    "q102_bpe_encode" -> q102BpeEncode,
    "q106_bigram_surprisal" -> q106BigramSurprisal,
    "q204_kneser_ney" -> q204KneserNey,
    "q94_lm_surprisal" -> q94LmSurprisal,
    "q97_tfidf_terms" -> q97TfidfTerms,
    "q98_hybrid_rrf" -> q98HybridRrf,
    "q117_dsir_selection" -> q117DsirSelection,
    "q135_inverted_index" -> q135InvertedIndex,
    "q139_phrase_search" -> q139PhraseSearch)

  private def tfSql(t: String): String =
    s"CAST(len(list_filter(w, x -> x = '$t')) AS BIGINT)"

  private def termScoreSql(t: String): String =
    s"""(ln(1.0::DOUBLE + (n_docs - df_$t + 0.5::DOUBLE) / (df_$t + 0.5::DOUBLE))
       |   * (CAST(tf_$t AS DOUBLE) * ${K1 + 1.0}::DOUBLE)
       |   / (CAST(tf_$t AS DOUBLE)
       |      + $K1::DOUBLE * (1.0::DOUBLE - $B::DOUBLE
       |                       + $B::DOUBLE * CAST(dl AS DOUBLE) / avgdl)))""".stripMargin

  /** One batched round of the oracle replay: pair counts → ranked top-
    * [[BPE_CAND]] window → the NOT EXISTS conflict filter (verbatim the
    * engine's accept rule: symbols must avoid every higher-ranked
    * candidate's {ta, tb, ta||tb}) → first [[BPE_BATCH]] survivors →
    * all accepted replaces folded over the word table in rank order
    * (merges encoded "ta tb" — symbols never contain spaces). */
  private def bpeRoundCtes(r: Int): String =
    s"""p$r AS MATERIALIZED (SELECT t[CAST(i AS INTEGER)] AS ta, t[CAST(i + 1 AS INTEGER)] AS tb,
       |    CAST(sum(freq) AS BIGINT) AS cnt
       |  FROM (SELECT freq, string_split(trim(seq), '  ') AS t FROM s${r - 1}),
       |    UNNEST(range(1, len(t))) x(i)
       |  GROUP BY 1, 2),
       |c$r AS MATERIALIZED (SELECT ta, tb, cnt,
       |    row_number() OVER (ORDER BY cnt DESC, ta, tb) AS rk
       |  FROM p$r ORDER BY cnt DESC, ta, tb LIMIT $BPE_CAND),
       |a$r AS MATERIALIZED (SELECT ta, tb, cnt, rk,
       |    row_number() OVER (ORDER BY rk) AS arank
       |  FROM c$r i
       |  WHERE NOT EXISTS (SELECT 1 FROM c$r j WHERE j.rk < i.rk
       |    AND (i.ta IN (j.ta, j.tb, j.ta || j.tb)
       |      OR i.tb IN (j.ta, j.tb, j.ta || j.tb)))
       |  ORDER BY rk LIMIT $BPE_BATCH),
       |s$r AS MATERIALIZED (SELECT word, freq,
       |    list_reduce(list_prepend(seq,
       |      (SELECT coalesce(list(ta || ' ' || tb ORDER BY rk),
       |              CAST([] AS VARCHAR[])) FROM a$r)),
       |      (x, y) -> replace(x,
       |        ' ' || split_part(y, ' ', 1) || '  ' || split_part(y, ' ', 2) || ' ',
       |        ' ' || split_part(y, ' ', 1) || split_part(y, ' ', 2) || ' ')) AS seq
       |  FROM s${r - 1})""".stripMargin

  /** The shared learner replay (wf → s0 → c/a/s per round), reused by the
    * q90 merges view and the q102 encoding view. */
  private lazy val bpeCtes: String =
    s"""WITH wf AS MATERIALIZED (
       |  SELECT w AS word, count(*) AS freq
       |  FROM (SELECT unnest(regexp_split_to_array(trim(text), '\\s+')) AS w
       |        FROM documents WHERE text IS NOT NULL) t
       |  WHERE len(w) > 0
       |  GROUP BY 1),
       |s0 AS MATERIALIZED (SELECT word, freq,
       |    ' ' || array_to_string(list_transform(range(1, len(word) + 1),
       |      i -> substr(word, CAST(i AS INTEGER), 1)), '  ') || ' ' AS seq
       |  FROM wf),
       |${(1 to BPE_BATCH_ROUNDS).map(bpeRoundCtes).mkString(",\n")}""".stripMargin

  private lazy val bpeSql: String =
    s"""$bpeCtes
       |${(1 to BPE_BATCH_ROUNDS).map(r =>
           s"SELECT CAST($r AS INTEGER) AS round, CAST(arank AS INTEGER) AS merge_rank, ta AS term_a, tb AS term_b, cnt AS pair_count FROM a$r")
         .mkString("\nUNION ALL ")}""".stripMargin

  private lazy val bpeEncodeSql: String =
    s"""$bpeCtes
       |SELECT word, freq,
       |  CAST(len(string_split(trim(seq), '  ')) AS INTEGER) AS n_tokens,
       |  array_to_string(string_split(trim(seq), '  '), ' ') AS tokens
       |FROM s$BPE_BATCH_ROUNDS""".stripMargin

  val oracle: Map[String, String] = Map(
    // Same double-isqrt weights, same md5 draws, same interval resolve.
    "q187_negative_sampling" ->
      s"""WITH wc AS (SELECT u.w AS word, CAST(count(*) AS BIGINT) AS c
         |  FROM documents, unnest(string_split_regex(trim(text), '\\s+')) AS u(w)
         |  WHERE u.w <> '' GROUP BY 1),
         |wt AS (SELECT word, c,
         |    CAST(floor(sqrt(CAST(c * CAST(floor(sqrt(CAST(c AS DOUBLE)))
         |      AS BIGINT) AS DOUBLE))) AS BIGINT) AS w
         |  FROM wc),
         |cl AS (SELECT word, c, w,
         |    CAST(sum(w) OVER (ORDER BY word
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cumhi,
         |    CAST(sum(w) OVER (ORDER BY word
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         |      - w + 1 AS cumlo
         |  FROM wt),
         |tot AS (SELECT max(cumhi) AS wtot FROM cl),
         |dr AS (SELECT t.k, CAST(CAST(('0x' || substr(md5('neg:'
         |        || CAST(t.k AS VARCHAR)), 1, 15)) AS UBIGINT)
         |      % (SELECT wtot FROM tot) AS BIGINT) + 1 AS u
         |  FROM range($NEG_K) AS t(k))
         |SELECT dr.k, dr.u, cl.word, cl.c, cl.w
         |FROM dr JOIN cl ON dr.u BETWEEN cl.cumlo AND cl.cumhi""".stripMargin,
    // Same integer-bit surprisal: bit-width of the BIGINT quotient, no
    // transcendental on either side.
    "q94_lm_surprisal" ->
      """WITH toks AS (SELECT doc_id,
        |    unnest(regexp_split_to_array(trim(text), '\s+')) AS t
        |  FROM documents WHERE text IS NOT NULL),
        |vocab AS (SELECT t, count(*) AS c FROM toks GROUP BY t),
        |tot AS (SELECT CAST(sum(c) AS BIGINT) AS n_total FROM vocab),
        |bits AS (SELECT t,
        |    CAST(length(format('{:b}', n_total // c)) - 1 AS INTEGER) AS bits
        |  FROM vocab, tot)
        |SELECT doc_id, count(*) AS n_tokens,
        |  CAST(sum(bits) AS BIGINT) AS total_bits,
        |  CAST(sum(bits) AS DOUBLE) / count(*) AS avg_bits
        |FROM toks JOIN bits USING (t)
        |GROUP BY doc_id""".stripMargin,
    "q90_bpe_merges" -> bpeSql,
    // Same 1-based adjacency, same total order on the query log, same
    // per-phrase occurrence vs distinct-document counts.
    "q139_phrase_search" ->
      """WITH d AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w
        |    FROM documents WHERE text IS NOT NULL),
        |toks AS (SELECT doc_id, i AS pos, w[CAST(i AS INTEGER)] AS t
        |    FROM d, unnest(generate_series(1, len(w))) AS u(i)),
        |big AS (SELECT a.t AS t1, b.t AS t2, a.doc_id
        |    FROM toks a JOIN toks b
        |      ON a.doc_id = b.doc_id AND b.pos = a.pos + 1),
        |topq AS (SELECT t1, t2, count(*) AS n FROM big GROUP BY 1, 2
        |    ORDER BY n DESC, t1, t2 LIMIT 5)
        |SELECT t1 || ' ' || t2 AS phrase,
        |  CAST(count(*) AS BIGINT) AS n_occ,
        |  CAST(count(DISTINCT b.doc_id) AS BIGINT) AS n_docs
        |FROM big b JOIN topq USING (t1, t2) GROUP BY 1""".stripMargin,
    // Same sorted posting sets, same delta-gap serialization.
    "q135_inverted_index" ->
      """WITH tok AS (SELECT DISTINCT doc_id, t FROM (
        |    SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS t
        |    FROM documents WHERE text IS NOT NULL)),
        |p AS (SELECT t, CAST(count(*) AS BIGINT) AS df,
        |    list_sort(list(doc_id)) AS ps
        |  FROM tok GROUP BY t HAVING count(*) >= 20)
        |SELECT t, df, ps[1] AS first_id,
        |  array_to_string(list_transform(range(2, CAST(df AS INTEGER) + 1),
        |    i -> CAST(ps[CAST(i AS INTEGER)] - ps[CAST(i AS INTEGER) - 1] AS VARCHAR)),
        |    ',') AS gaps
        |FROM p""".stripMargin,
    // Same hashed buckets (md5 idiom), same cross-multiplied integer-bit
    // log-ratio, same ≥ 0 selection — bit-identical by construction.
    "q117_dsir_selection" ->
      s"""WITH toks AS (SELECT doc_id, lang,
         |    unnest(regexp_split_to_array(trim(text), '\\s+')) AS t
         |  FROM documents WHERE text IS NOT NULL),
         |bt AS (SELECT doc_id, lang,
         |    CAST(('0x' || substr(md5('$DSIR_SALT' || t), 1, 15)) AS UBIGINT)
         |      % $DSIR_B AS b
         |  FROM toks),
         |cnt AS (SELECT b,
         |    CAST(sum(CASE WHEN lang = '$DSIR_TARGET' THEN 1 ELSE 0 END) AS BIGINT) AS ct,
         |    CAST(sum(CASE WHEN lang <> '$DSIR_TARGET' THEN 1 ELSE 0 END) AS BIGINT) AS cr
         |  FROM bt GROUP BY b),
         |tot AS (SELECT CAST(sum(ct) AS BIGINT) AS nt,
         |    CAST(sum(cr) AS BIGINT) AS nr FROM cnt),
         |wt AS (SELECT b, (ct + 1) * (nr + $DSIR_B) AS num,
         |    (cr + 1) * (nt + $DSIR_B) AS den FROM cnt, tot),
         |bits AS (SELECT b, CASE WHEN num >= den
         |    THEN CAST(length(format('{:b}', num // den)) - 1 AS INTEGER)
         |    ELSE CAST(1 - length(format('{:b}', den // num)) AS INTEGER)
         |    END AS bits
         |  FROM wt)
         |SELECT doc_id, lang, count(*) AS n_tokens,
         |  CAST(sum(bits) AS BIGINT) AS total_bits,
         |  CAST(sum(bits) AS BIGINT) >= 0 AS selected
         |FROM bt JOIN bits USING (b)
         |GROUP BY doc_id, lang""".stripMargin,
    // Same integer-bit trick as q94, lifted to the smoothed conditional.
    // Same whitespace tokens, same count tables, same two floor
    // divisions (HUGEINT where Spark runs DECIMAL(38,0)), same top-K
    // total order.
    "q204_kneser_ney" ->
      s"""WITH docs AS (SELECT doc_id,
         |    regexp_split_to_array(trim(text), '\\s+') AS w
         |  FROM documents WHERE text IS NOT NULL),
         |bg AS (SELECT w[CAST(i AS INTEGER)] AS ta,
         |              w[CAST(i + 1 AS INTEGER)] AS tb
         |       FROM docs, UNNEST(range(1, len(w))) r(i)),
         |bc AS (SELECT ta, tb, CAST(count(*) AS BIGINT) AS c_ab
         |       FROM bg GROUP BY ta, tb),
         |ctx AS (SELECT ta, CAST(sum(c_ab) AS BIGINT) AS c_a,
         |    CAST(count(*) AS BIGINT) AS n1a FROM bc GROUP BY ta),
         |cont AS (SELECT tb, CAST(count(*) AS BIGINT) AS n1b
         |         FROM bc GROUP BY tb),
         |nt AS (SELECT CAST(count(*) AS BIGINT) AS nt FROM bc)
         |SELECT ta, tb, c_ab, c_a, n1a, n1b, nt,
         |  ((4 * c_ab - 3) * $KN_SCALE) // (4 * c_a)
         |    + CAST((CAST(3 * n1a AS HUGEINT) * n1b * $KN_SCALE)
         |        // (CAST(4 AS HUGEINT) * c_a * nt) AS BIGINT) AS p_kn_fp
         |FROM bc JOIN ctx USING (ta) JOIN cont USING (tb), nt
         |ORDER BY c_ab DESC, ta, tb LIMIT $KN_TOPK""".stripMargin,
    "q106_bigram_surprisal" ->
      """WITH docs AS (SELECT doc_id,
        |    regexp_split_to_array(trim(text), '\s+') AS w
        |  FROM documents WHERE text IS NOT NULL),
        |bg AS (SELECT doc_id, w[CAST(i AS INTEGER)] AS ta,
        |              w[CAST(i + 1 AS INTEGER)] AS tb
        |       FROM docs, UNNEST(range(1, len(w))) r(i)),
        |uni AS (SELECT unnest(w) AS t FROM docs),
        |uc AS (SELECT t, count(*) AS c_a FROM uni GROUP BY t),
        |bc AS (SELECT ta, tb, count(*) AS c_ab FROM bg GROUP BY ta, tb),
        |vv AS (SELECT count(*) AS v FROM uc),
        |scored AS (SELECT doc_id,
        |    CAST(length(format('{:b}', (uc.c_a + v) // (bc.c_ab + 1))) - 1
        |      AS INTEGER) AS bits
        |  FROM bg JOIN bc USING (ta, tb) JOIN uc ON uc.t = bg.ta, vv)
        |SELECT doc_id, count(*) AS n_bigrams,
        |  CAST(sum(bits) AS BIGINT) AS total_bits,
        |  CAST(sum(bits) AS DOUBLE) / count(*) AS avg_bits
        |FROM scored
        |GROUP BY doc_id""".stripMargin,
    "q102_bpe_encode" -> bpeEncodeSql,
    "q80_bm25" -> bm25RankedSql,
    // Nested q80 replay + cosine top-20 replay (q23's fold contract) +
    // the two-term IEEE rrf sum in fixed (lex, vec) order.
    "q98_hybrid_rrf" ->
      s"""WITH lex AS (SELECT doc_id, rank AS lex_rank
         |  FROM ($bm25RankedSql) bm),
         |qv AS (SELECT embedding AS q_emb FROM embeddings WHERE vec_id = 0),
         |vs AS (SELECT vec_id AS doc_id,
         |    ${SimilarityQueries.cosineSql("q_emb", "e.embedding")} AS sim
         |  FROM embeddings e, qv WHERE vec_id <> 0),
         |vtop AS (SELECT doc_id,
         |    CAST(row_number() OVER (ORDER BY sim DESC, doc_id) AS BIGINT)
         |      AS vec_rank
         |  FROM vs QUALIFY vec_rank <= $HYBRID_K),
         |f AS (SELECT coalesce(l.doc_id, v.doc_id) AS doc_id,
         |    l.lex_rank, v.vec_rank,
         |    coalesce(1.0::DOUBLE / (60.0::DOUBLE + CAST(l.lex_rank AS DOUBLE)),
         |             0.0::DOUBLE)
         |    + coalesce(1.0::DOUBLE / (60.0::DOUBLE + CAST(v.vec_rank AS DOUBLE)),
         |               0.0::DOUBLE) AS rrf
         |  FROM lex l FULL OUTER JOIN vtop v ON l.doc_id = v.doc_id)
         |SELECT doc_id, lex_rank, vec_rank, rrf,
         |  CAST(row_number() OVER (ORDER BY rrf DESC, doc_id) AS INTEGER)
         |    AS fused_rank
         |FROM f""".stripMargin) ++ moreOracle

  private lazy val bm25RankedSql: String =
      s"""WITH perdoc AS (
         |  SELECT doc_id, CAST(len(w) AS BIGINT) AS dl,
         |    ${Q_TERMS.map(t => s"${tfSql(t)} AS tf_$t").mkString(",\n    ")}
         |  FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS w
         |        FROM documents WHERE text IS NOT NULL)),
         |stats AS (
         |  SELECT CAST(count(*) AS DOUBLE) AS n_docs, sum(dl) AS sum_dl,
         |    ${Q_TERMS.map(t =>
             s"CAST(sum(CASE WHEN tf_$t > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df_$t")
               .mkString(",\n    ")}
         |  FROM perdoc),
         |scored AS (
         |  SELECT doc_id, dl, ${Q_TERMS.map(t => s"tf_$t").mkString(", ")},
         |    CAST(floor((${Q_TERMS.map(termScoreSql).mkString("\n      + ")})
         |      * 1000000.0::DOUBLE) AS BIGINT) AS score_micro
         |  FROM perdoc, (SELECT *, CAST(sum_dl AS DOUBLE) / n_docs AS avgdl
         |                FROM stats)
         |  WHERE ${Q_TERMS.map(t => s"tf_$t > 0").mkString(" OR ")})
         |SELECT doc_id, dl, ${Q_TERMS.map(t => s"tf_$t").mkString(", ")},
         |  score_micro,
         |  CAST(row_number() OVER (ORDER BY score_micro DESC, doc_id) AS BIGINT)
         |    AS rank
         |FROM scored
         |QUALIFY rank <= $TOP_K""".stripMargin

  // Same quantized-micro ln discipline as q80; rank derived from the
  // quantized score so the ordering is ulp-proof.
  private lazy val moreOracle: Map[String, String] = Map(
    "q97_tfidf_terms" ->
      s"""WITH d AS (SELECT doc_id, text FROM documents WHERE text IS NOT NULL),
         |t AS (SELECT doc_id,
         |    unnest(regexp_split_to_array(trim(text), '\\s+')) AS term
         |  FROM d),
         |tf AS (SELECT doc_id, term, count(*) AS tf FROM t GROUP BY 1, 2),
         |df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
         |n AS (SELECT count(*) AS n_docs FROM d),
         |scored AS (
         |  SELECT tf.doc_id, tf.term, tf.tf, df.df,
         |    CAST(floor(CAST(tf.tf AS DOUBLE)
         |      * ln(1.0::DOUBLE
         |           + CAST(n_docs AS DOUBLE) / CAST(df.df AS DOUBLE))
         |      * 1000000.0::DOUBLE) AS BIGINT) AS tfidf_micro
         |  FROM tf JOIN df USING (term), n),
         |r AS (SELECT *, CAST(row_number() OVER (PARTITION BY doc_id
         |    ORDER BY tfidf_micro DESC, term) AS INTEGER) AS rank
         |  FROM scored)
         |SELECT doc_id, term, tf, df, tfidf_micro, rank
         |FROM r WHERE rank <= $TFIDF_TOP""".stripMargin,
    "q83_pmi_bigrams" ->
      s"""WITH docs AS (
         |  SELECT regexp_split_to_array(trim(text), '\\s+') AS w
         |  FROM documents WHERE text IS NOT NULL),
         |uni AS (SELECT unnest(w) AS t FROM docs),
         |uc AS (SELECT t, count(*) AS c FROM uni GROUP BY t),
         |bi AS (SELECT w[CAST(i AS INTEGER)] AS term_a,
         |              w[CAST(i + 1 AS INTEGER)] AS term_b
         |       FROM docs, UNNEST(range(1, len(w))) r(i)),
         |bc AS (SELECT term_a, term_b, count(*) AS c_xy
         |       FROM bi GROUP BY term_a, term_b),
         |tot AS (SELECT CAST(sum(len(w)) AS BIGINT) AS n_uni,
         |               CAST(sum(len(w) - 1) AS BIGINT) AS n_bi
         |        FROM docs)
         |SELECT term_a, term_b, c_xy, a.c AS c_a, b.c AS c_b,
         |  CAST(c_xy * n_uni * n_uni AS DOUBLE)
         |    / CAST(n_bi * a.c * b.c AS DOUBLE) AS pmi_ratio
         |FROM bc JOIN uc a ON a.t = term_a JOIN uc b ON b.t = term_b, tot
         |WHERE c_xy >= $PMI_MIN_COUNT
         |ORDER BY pmi_ratio DESC, term_a, term_b
         |LIMIT $PMI_TOP_K""".stripMargin)
}
