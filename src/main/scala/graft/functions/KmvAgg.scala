package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed KMV (k-minimum-values) sketch aggregator: the bounded, mergeable
  * state is the k SMALLEST DISTINCT hash values seen — the order-statistic
  * member of the mergeable-sketch family (Bar-Yossef et al. 2002). Unlike
  * the window-rank formulation (shuffle every distinct hash, rank, cut at
  * k), this buffer partial-aggregates map-side, so the exchange carries at
  * most k longs per (group, task) — the only shape that survives a
  * billion-key group. Union-merge is "k smallest of the concatenation",
  * which is exactly [[merge]] — so stored states from different days /
  * partitions / streams combine without touching raw data.
  *
  * Everything is exact integer order statistics on a deterministic hash:
  * any task order, combiner tree, or partitioning yields the identical
  * state, which is why a SKETCH query can be hash-gated at all.
  */
object KmvAgg {
  final case class KmvBuf(items: List[Long])

  /** Insert into an asc-sorted bounded distinct list. O(k) per row. */
  private def insert(buf: List[Long], x: Long, k: Int): List[Long] =
    if (buf.contains(x)) buf
    else {
      val (lo, hi) = buf.span(_ < x)
      (lo ::: x :: hi).take(k)
    }

  def kMin(k: Int): Aggregator[Long, KmvBuf, Seq[Long]] =
    new Aggregator[Long, KmvBuf, Seq[Long]] {
      override def zero: KmvBuf = KmvBuf(Nil)
      override def reduce(b: KmvBuf, h: Long): KmvBuf = KmvBuf(insert(b.items, h, k))
      override def merge(b1: KmvBuf, b2: KmvBuf): KmvBuf =
        KmvBuf(b2.items.foldLeft(b1.items)((acc, x) => insert(acc, x, k)))
      override def finish(r: KmvBuf): Seq[Long] = r.items
      override def bufferEncoder: Encoder[KmvBuf] = ExpressionEncoder[KmvBuf]()
      override def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder[Seq[Long]]()
    }
}
