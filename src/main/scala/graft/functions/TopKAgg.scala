package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed partial top-k aggregator (`Aggregator[IN, BUF, OUT]`).
  *
  * The window-rank formulation of per-group top-k shuffles EVERY scored row
  * to its group's reducer; this aggregator keeps a bounded k-element buffer
  * that Spark merges map-side first, so the shuffle carries at most k rows
  * per (group, map task) — the only shape that survives |corpus| ≫ k.
  *
  * Ordering is (score desc, id asc): fully deterministic, same tie-break as
  * the window formulation, so both produce identical output (spec-pinned).
  */
object TopKAgg {
  final case class Scored(neighbor_id: Long, sim: Double)
  final case class TopKBuf(items: List[Scored])

  /** Insert into a desc-sorted bounded list. O(k) per row — k is small. */
  private def insert(buf: List[Scored], x: Scored, k: Int): List[Scored] = {
    val (before, after) = buf.span(s =>
      s.sim > x.sim || (s.sim == x.sim && s.neighbor_id < x.neighbor_id))
    (before ::: x :: after).take(k)
  }

  def topK(k: Int): Aggregator[Scored, TopKBuf, Seq[Scored]] =
    new Aggregator[Scored, TopKBuf, Seq[Scored]] {
      override def zero: TopKBuf = TopKBuf(Nil)
      override def reduce(b: TopKBuf, a: Scored): TopKBuf = TopKBuf(insert(b.items, a, k))
      override def merge(b1: TopKBuf, b2: TopKBuf): TopKBuf =
        TopKBuf(b2.items.foldLeft(b1.items)((acc, x) => insert(acc, x, k)))
      override def finish(r: TopKBuf): Seq[Scored] = r.items
      override def bufferEncoder: Encoder[TopKBuf] = ExpressionEncoder[TopKBuf]()
      override def outputEncoder: Encoder[Seq[Scored]] = ExpressionEncoder[Seq[Scored]]()
    }
}
