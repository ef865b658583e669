package graft.sources

import java.util.concurrent.atomic.{AtomicBoolean, AtomicLong}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.expressions.{NamedReference, SortDirection, SortOrder}
import org.apache.spark.sql.connector.expressions.aggregate.{Aggregation, Count, CountStar, Max, Min, Sum}
import org.apache.spark.sql.connector.read.partitioning.{KeyGroupedPartitioning, Partitioning => V2Partitioning, UnknownPartitioning}
import org.apache.spark.sql.connector.metric.{CustomMetric, CustomSumMetric, CustomTaskMetric}
import org.apache.spark.sql.connector.read.{Batch, HasPartitionKey, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, Statistics, SupportsPushDownAggregates, SupportsPushDownFilters, SupportsPushDownLimit, SupportsPushDownOffset, SupportsPushDownRequiredColumns, SupportsPushDownTopN, SupportsReportPartitioning, SupportsReportStatistics, SupportsRuntimeFiltering}
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, In, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types.{IntegerType, LongType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** `graft-series` — a full DataSource V2 TableProvider: the engine's
  * demonstration that a CUSTOM source participates in Catalyst's
  * planning the way a warehouse extraction connector must at 100 TB.
  * The table is a deterministic integer series `[start, end)` with
  * schema `(id BIGINT NOT NULL, fill STRING)` (`fill` is a 64-char
  * constant payload standing in for the wide columns a real feed
  * carries), split into `slices` even input partitions.
  *
  * Three planning-time contracts, each spec-pinned (SeriesSourceSpec):
  *
  *  - FILTER PUSHDOWN (`SupportsPushDownFilters`): >, >=, <, <=, = on
  *    `id` narrow the range before partitions are planned — slices that
  *    fall entirely outside the residual range are never created, so
  *    pruning is visible as FEWER partitions and fewer rows emitted
  *    (the source-side counters exist for the spec), not as rows
  *    filtered after the fact. Pushed filters are still re-applied by
  *    Spark only if NOT fully consumed: conjuncts the source absorbs
  *    exactly are removed from the post-scan Filter.
  *  - COLUMN PRUNING (`SupportsPushDownRequiredColumns`): a query that
  *    never touches `fill` gets readers that never materialize the
  *    payload (the spec pins the no-`fill`-materialized flag) — the
  *    DSv2 equivalent of parquet ReadSchema pruning.
  *  - STATISTICS (`SupportsReportStatistics`): row count and byte size
  *    of the RESIDUAL range (post-pushdown), so the planner's join-side
  *    decisions (broadcast thresholds, AQE) see the pruned volume, not
  *    the declared one.
  *  - LIMIT / TOP-N / OFFSET (`SupportsPushDownLimit` / `...TopN` /
  *    `...Offset`): paging windows absorb COMPLETELY (Spark deletes its
  *    own Sort/Limit/Offset operators); a pushed top-N plans one
  *    partition emitting in the requested order — see the ScanBuilder
  *    note for the combined-pushdown arithmetic.
  *
  * The series content is engine-portable by construction (`id` is the
  * value itself), so the DuckDB oracle for queries over this source is
  * `range(lo, hi)` plus the same md5/hash60 arithmetic the engine's
  * deterministic derivations use everywhere else — a cross-engine gate
  * over a source that owns its own planning. */
class SeriesSource extends TableProvider
    with org.apache.spark.sql.sources.DataSourceRegister {
  override def shortName(): String = "graft-series"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SeriesSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table =
    new SeriesTable(
      properties.asScala.getOrElse("start", "0").toLong,
      properties.asScala.getOrElse("end",
        sys.error("graft-series requires option 'end'")).toLong,
      properties.asScala.getOrElse("slices", "32").toInt)
}

object SeriesSource {
  /** `slice` is the partition index the row lives in — constant within an
    * input partition by construction (the reader stamps its own slice's
    * index), which is exactly what [[KeyGroupedPartitioning]] over
    * `identity(slice)` promises. It exists for the storage-partitioned
    * join: two series with the same layout joining on
    * `(id, slice)` co-locate partition-for-partition with NO exchange. */
  val schema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("slice", IntegerType, nullable = false),
    StructField("fill", StringType, nullable = false)))
  val FillPayload = "x" * 64
  /** Per-row width for reported statistics: id + slice + the payload. */
  val RowBytes: Long = 8L + 4L + FillPayload.length

  // Test-only observability (single-JVM local mode): rows actually emitted
  // by readers, and whether any reader materialized the payload column.
  val rowsEmitted = new AtomicLong(0)
  val fillMaterialized = new AtomicBoolean(false)
}

private class SeriesTable(start: Long, end: Long, slices: Int)
    extends Table with SupportsRead {
  require(start <= end, s"graft-series: start $start > end $end")
  require(slices > 0, s"graft-series: slices must be positive, got $slices")
  override def name(): String = s"graft_series($start,$end,$slices)"
  override def schema(): StructType = SeriesSource.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new SeriesScanBuilder(start, end, slices)
}

/** Folds id-range conjuncts into [lo, hi) at planning time. Fully-absorbed
  * conjuncts are consumed (not returned as residual), so the physical plan
  * carries no redundant re-filter for them. */
private class SeriesScanBuilder(start: Long, end: Long, slices: Int)
    extends ScanBuilder
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns
    with SupportsPushDownAggregates with SupportsPushDownLimit
    with SupportsPushDownTopN with SupportsPushDownOffset {
  private var lo = start
  private var hi = end
  private var pushed = Array.empty[Filter]
  private var required = SeriesSource.schema
  private var aggTags: Option[Seq[String]] = None
  private var limitCap: Option[Int] = None
  private var skipOffset: Int = 0
  private var topNOrdered = false
  private var topNDesc = false

  /** LIMIT / TOP-N / OFFSET PUSHDOWN — the paging surfaces a warehouse
    * connector answers remotely (`ORDER BY k LIMIT n OFFSET m` shipped to
    * the source, never paid as a full scan + sort). Spark's contract
    * (V2ScanRelationPushDown): the pushed limit caps the PREFIX of the
    * source's row stream and the pushed offset then skips within it — for
    * `df.offset(n).limit(m)` Spark pushes limit = m+n, offset = n — so the
    * scan emits the index window [offset, limit) of the (ordered) stream.
    * All three report COMPLETE pushdown (`isPartiallyPushed` = false: the
    * window arithmetic is globally exact, not per-partition), so Spark
    * deletes its own Sort/Limit/Offset operators. A pushed top-N
    * additionally collapses planning to ONE partition emitting in the
    * requested order — with Spark's Sort gone, row order IS the scan's
    * partition order, and a multi-slice scan would only promise per-slice
    * order. Declines while an aggregate is pushed (and vice versa): the
    * two rewrites never compose — Spark's rule order prevents it, and the
    * guards keep the invariant local. */
  override def pushLimit(limit: Int): Boolean = {
    if (aggTags.isDefined) return false
    limitCap = Some(limit); true
  }
  override def isPartiallyPushed(): Boolean = false
  override def pushTopN(orders: Array[SortOrder], limit: Int): Boolean = {
    if (aggTags.isDefined || orders.length != 1) return false
    val o = orders(0)
    val onId = o.expression match {
      case n: NamedReference => n.fieldNames.toSeq == Seq("id")
      case _ => false
    }
    // null ordering is irrelevant: id is declared NOT NULL
    if (!onId) return false
    topNOrdered = true
    topNDesc = o.direction == SortDirection.DESCENDING
    limitCap = Some(limit); true
  }
  override def pushOffset(offset: Int): Boolean = {
    if (aggTags.isDefined) return false
    skipOffset = offset; true
  }

  /** AGGREGATE PUSHDOWN: ungrouped COUNT/MIN/MAX/SUM over `id` are pure
    * arithmetic on a slice's [lo, hi) — each planned slice answers with
    * ONE row and zero scanned values, the shape a warehouse connector
    * pushes a `SELECT count(*), max(ts) FROM huge_table WHERE range` in.
    * Partial pushdown (`supportCompletePushDown` = false): Spark still
    * runs the final merge over the per-slice rows, so any slicing is
    * correct by the aggregates' mergeability. Anything else — grouping,
    * DISTINCT, an aggregate over `fill` — declines, and Spark falls back
    * to scanning rows through the normal pruned path. */
  override def supportCompletePushDown(agg: Aggregation): Boolean = false
  override def pushAggregation(agg: Aggregation): Boolean = {
    if (agg.groupByExpressions.nonEmpty) return false
    // never compose with a pushed limit/top-N/offset window (see above)
    if (limitCap.isDefined || skipOffset > 0) return false
    // EMPTY residual range: decline. Pushed partials would plan zero
    // slices, and Spark's final merge rewrites the pushed count to a
    // Sum over the partial column — Sum over no rows is NULL where
    // count(*) over an empty scan must be 0. Declining routes the empty
    // scan through Spark's own aggregate, which gets all the empty-input
    // semantics (count 0, min/max/sum NULL) right for free.
    if (math.min(hi, end) <= math.max(lo, start)) return false
    def isId(e: org.apache.spark.sql.connector.expressions.Expression) =
      e match {
        case n: NamedReference => n.fieldNames.toSeq == Seq("id")
        case _ => false
      }
    val tags = agg.aggregateExpressions.toSeq.map {
      case _: CountStar => Some("count")
      // count(id) ≡ count(*): id is declared NOT NULL
      case c: Count if !c.isDistinct && isId(c.column) => Some("count")
      case m: Min if isId(m.column) => Some("min")
      case m: Max if isId(m.column) => Some("max")
      case s: Sum if !s.isDistinct && isId(s.column) => Some("sum")
      case _ => None
    }
    if (tags.contains(None)) false
    else { aggTags = Some(tags.flatten); true }
  }

  /** Comparison literals arrive boxed and may be Int or Long depending on
    * how the predicate was written; anything else is left residual. */
  private def longVal(a: Any): Option[Long] = a match {
    case l: java.lang.Long => Some(l)
    case i: java.lang.Integer => Some(i.toLong)
    case _ => None
  }

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val MaxV = Long.MaxValue
    val (absorbed, residual) = filters.partition {
      // Long.MaxValue edges are handled WITHOUT the +1 (it would wrap to
      // Long.MinValue and — because an absorbed conjunct is never
      // re-applied by Spark — silently return the wrong rows): ids live
      // in [start, end) with end <= MaxV, so `id > MaxV` and `id = MaxV`
      // are vacuously false (collapse to empty) and `id <= MaxV` is
      // vacuously true (no-op).
      case GreaterThan("id", v) if longVal(v).isDefined =>
        val x = longVal(v).get
        if (x == MaxV) lo = end else lo = math.max(lo, x + 1); true
      case GreaterThanOrEqual("id", v) if longVal(v).isDefined =>
        lo = math.max(lo, longVal(v).get); true
      case LessThan("id", v) if longVal(v).isDefined =>
        hi = math.min(hi, longVal(v).get); true
      case LessThanOrEqual("id", v) if longVal(v).isDefined =>
        val x = longVal(v).get
        if (x != MaxV) hi = math.min(hi, x + 1); true
      case EqualTo("id", v) if longVal(v).isDefined =>
        val x = longVal(v).get
        if (x == MaxV) lo = end
        else { lo = math.max(lo, x); hi = math.min(hi, x + 1) }
        true
      case _ => false
    }
    pushed = absorbed
    residual
  }
  override def pushedFilters(): Array[Filter] = pushed
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan =
    new SeriesScan(start, end, math.max(lo, start), math.min(hi, end),
      slices, required, aggTags, limitCap, skipOffset, topNOrdered, topNDesc)
}

private class SeriesScan(start: Long, end: Long, lo: Long, hi: Long,
    slices: Int, required: StructType, aggTags: Option[Seq[String]],
    limitCap: Option[Int], skipOffset: Int, ordered: Boolean, desc: Boolean)
    extends Scan with Batch with SupportsReportStatistics
    with SupportsRuntimeFiltering with SupportsReportPartitioning {
  /** The pushed limit/offset window over the filter-residual range: limit
    * caps the stream's prefix, offset skips within it (Spark's combined-
    * pushdown arithmetic — see the ScanBuilder note), and a descending
    * top-N mirrors the window to the top of the range. All saturating —
    * no boundary here can leave [startResidual, endResidual]. */
  private val (resLo, resHi) = {
    val lo0 = lo
    val hi0 = math.max(hi, lo) // empty residual collapses to 0 rows
    val span = hi0 - lo0
    val skip = math.min(skipOffset.toLong, span)
    val cap = limitCap.map(l => math.min(l.toLong, span)).getOrElse(span)
    if (!desc) (lo0 + skip, lo0 + math.max(cap, skip))
    else (hi0 - math.max(cap, skip), hi0 - skip)
  }

  /** RUNTIME FILTERING (the DSv2 dynamic-partition-pruning analog): a
    * join above this scan with a selective build side hands the build's
    * key set to [[filter]] before partitions are (re)planned — slices
    * containing none of the keys are never planned, and surviving
    * slices' readers walk the key list directly instead of the range
    * (emitting only rows that CAN join is always sound for the inner/
    * semi joins the optimizer injects runtime filters for). Cannot
    * co-occur with aggregate pushdown: runtime filters are injected for
    * a JOIN directly above the scan, aggregate pushdown only fires for
    * an Aggregate directly above it. */
  @volatile private var runtimeIds: Option[Array[Long]] = None
  override def filterAttributes(): Array[NamedReference] =
    Array(org.apache.spark.sql.connector.expressions.Expressions.column("id"))
  override def filter(filters: Array[Filter]): Unit = filters.foreach {
    case In("id", vs) =>
      val ids = vs.flatMap {
        case l: java.lang.Long => Some(l.toLong)
        case i: java.lang.Integer => Some(i.toLong)
        case _ => None
      }
      // only absorb if every value translated — a partial set would
      // wrongly drop rows for the untranslated values
      if (ids.length == vs.length)
        runtimeIds = Some(ids.distinct.sorted)
    case _ => () // advisory: unabsorbed runtime filters just skip pruning
  }

  /** With an aggregation pushed, the scan's output IS the per-slice
    * partial-aggregate row (Spark maps final-merge functions to these
    * columns by position). */
  override def readSchema(): StructType = aggTags match {
    case Some(tags) => StructType(tags.zipWithIndex.map { case (t, i) =>
      StructField(s"agg_${i}_$t", LongType, nullable = false) })
    case None => required
  }
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-series [$start,$end) residual=[$resLo,$resHi) " +
      s"cols=${required.fieldNames.mkString(",")}" +
      aggTags.map(t => s" pushedAgg=[${t.mkString(",")}]").getOrElse("") +
      limitCap.map(l => s" pushedLimit=$l").getOrElse("") +
      (if (skipOffset > 0) s" pushedOffset=$skipOffset" else "") +
      (if (ordered) s" pushedOrder=id ${if (desc) "DESC" else "ASC"}" else "")

  /** Slices are laid over the DECLARED range so their boundaries are
    * stable under pushdown; slices disjoint from the residual range are
    * dropped here — at planning time, before any task exists. */
  override def planInputPartitions(): Array[InputPartition] = {
    // A pushed top-N plans ONE partition emitting in the requested order:
    // Spark deleted its Sort, so global order must be the scan's own.
    if (ordered) {
      // the single ordered partition spans slice boundaries, so the
      // reader derives each id's REAL slice from the declared layout
      // (sliceOf) — stamping the partition index would silently report
      // slice=0 for every row
      val s = SeriesSlice(resLo, resHi, index = 0,
        wantFill = required.fieldNames.contains("fill"),
        wantId = required.fieldNames.contains("id"),
        wantSlice = required.fieldNames.contains("slice"),
        aggTags = aggTags,
        ids = runtimeIds.map(_.filter(v => v >= resLo && v < resHi)),
        descending = desc,
        sliceOf = Some((start, end - start,
          math.min(slices.toLong, math.max(end - start, 1L)).toInt)))
      return if (s.lo < s.hi && s.ids.forall(_.nonEmpty)) Array(s)
        else Array.empty
    }
    val n = math.min(slices.toLong, math.max(end - start, 1L)).toInt
    val span = end - start
    // BigInt for the boundary products: span * i overflows Long once the
    // declared range passes ~Long.MaxValue/slices, and wrapped boundaries
    // would duplicate/drop ids. Planning-time only, ≤ `slices` multiplies.
    (0 until n).iterator.map { i =>
      val sLo = start + (BigInt(span) * i / n).toLong
      val sHi = start + (BigInt(span) * (i + 1) / n).toLong
      val cLo = math.max(sLo, resLo)
      val cHi = math.min(sHi, resHi)
      SeriesSlice(cLo, cHi, index = i,
        wantFill = required.fieldNames.contains("fill"),
        wantId = required.fieldNames.contains("id"),
        wantSlice = required.fieldNames.contains("slice"),
        aggTags = aggTags,
        ids = runtimeIds.map(_.filter(v => v >= cLo && v < cHi)))
    }.filter(s => s.lo < s.hi && s.ids.forall(_.nonEmpty))
      .toArray[InputPartition]
  }

  /** STORAGE-PARTITIONED JOIN: each slice is keyed by its own index
    * (`identity(slice)`, a constant within the partition), so two series
    * with the same declared layout report IDENTICAL partitionings and a
    * join carrying `slice` in its keys co-locates partition-for-partition
    * with no exchange on either side (`spark.sql.sources.v2.bucketing
    * .enabled`) — the connector-owned analog of bucketed tables.
    * Reported only when `slice` survives column pruning: the identity
    * key must resolve against the scan's actual output. */
  override def outputPartitioning(): V2Partitioning = {
    val parts = planInputPartitions()
    // a pushed top-N's single partition spans slice boundaries — its
    // slice values VARY within the partition, so KeyGroupedPartitioning's
    // constant-per-partition promise would be a lie there
    if (readSchema().fieldNames.contains("slice") && !ordered)
      new KeyGroupedPartitioning(
        Array(org.apache.spark.sql.connector.expressions.Expressions
          .identity("slice")), parts.length)
    else new UnknownPartitioning(parts.length)
  }

  override def createReaderFactory(): PartitionReaderFactory =
    SeriesReaderFactory

  /** V2 CUSTOM METRICS: the source-side row count as a first-class SQL
    * metric (aggregated from per-reader task metrics) — the same signal
    * the test-only counter carries, but visible to any observer of the
    * executed plan. */
  override def supportedCustomMetrics(): Array[CustomMetric] =
    Array(new SeriesRowsEmittedMetric)

  override def estimateStatistics(): Statistics = new Statistics {
    // With an aggregation pushed, the scan emits one partial row per
    // planned slice — reporting the residual RANGE here would hand the
    // planner a multi-GB estimate for a ≤`slices`-row relation and flip
    // downstream broadcast/AQE decisions the wrong way.
    private val (rows, rowBytes) = aggTags match {
      case Some(tags) =>
        (planInputPartitions().length.toLong, 8L * math.max(tags.length, 1))
      case None => (math.max(resHi - resLo, 0L), SeriesSource.RowBytes)
    }
    override def sizeInBytes(): java.util.OptionalLong =
      java.util.OptionalLong.of(rows * rowBytes)
    override def numRows(): java.util.OptionalLong =
      java.util.OptionalLong.of(rows)
  }
}

private case class SeriesSlice(lo: Long, hi: Long, index: Int,
    wantFill: Boolean, wantId: Boolean, wantSlice: Boolean,
    aggTags: Option[Seq[String]],
    ids: Option[Array[Long]] = None,
    descending: Boolean = false,
    // (declaredStart, declaredSpan, sliceCount): set when this partition
    // spans slice boundaries and the reader must derive per-id slices
    sliceOf: Option[(Long, Long, Int)] = None)
    extends InputPartition with HasPartitionKey {
  override def partitionKey(): InternalRow =
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](index))
}

private object SeriesReaderFactory extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val s = p.asInstanceOf[SeriesSlice]
    s.aggTags match {
      case Some(tags) => return new PartitionReader[InternalRow] {
        // the slice's whole contribution is arithmetic: one row, no scan.
        // Sum via BigInt so (lo+hi)·span cannot overflow en route even for
        // ranges up to 2^31 ids; the result itself must fit a long (the
        // caller's contract — same as Spark's own long-sum aggregate).
        private var done = false
        private var emitted = 0L
        override def currentMetricsValues(): Array[CustomTaskMetric] =
          Array(SeriesTaskMetric(emitted))
        override def next(): Boolean = { val r = !done; done = true; r }
        override def get(): InternalRow = {
          SeriesSource.rowsEmitted.incrementAndGet()
          emitted += 1
          val row = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(tags.length)
          tags.zipWithIndex.foreach { case (t, i) =>
            val v: Long = t match {
              case "count" => s.hi - s.lo
              case "min" => s.lo
              case "max" => s.hi - 1
              case "sum" =>
                ((BigInt(s.lo) + (s.hi - 1)) * (s.hi - s.lo) / 2).toLong
            }
            row.update(i, v)
          }
          row
        }
        override def close(): Unit = ()
      }
      case None => // fall through to the row reader below
    }
    new PartitionReader[InternalRow] {
      // runtime-filtered slices walk the surviving key list directly —
      // the reader never visits the ids the join cannot match
      private val idsArr = s.ids.orNull
      private var idx = if (s.descending && idsArr != null) idsArr.length else -1
      private var cur = if (s.descending) s.hi else s.lo - 1
      private val width = (if (s.wantId) 1 else 0) +
        (if (s.wantSlice) 1 else 0) + (if (s.wantFill) 1 else 0)
      private val fill = UTF8String.fromString(SeriesSource.FillPayload)
      private var emitted = 0L
      override def currentMetricsValues(): Array[CustomTaskMetric] =
        Array(SeriesTaskMetric(emitted))
      override def next(): Boolean =
        if (idsArr != null) {
          if (s.descending) { idx -= 1; idx >= 0 }
          else { idx += 1; idx < idsArr.length }
        } else {
          if (s.descending) { cur -= 1; cur >= s.lo }
          else { cur += 1; cur < s.hi }
        }
      // inverse of the planner's boundary staircase sLo(i) = start +
      // floor(span*i/n): the greatest i with sLo(i) <= v, exact via the
      // same BigInt arithmetic the boundaries use
      private def sliceIdx(v: Long): Int = s.sliceOf match {
        case Some((st, sp, n)) =>
          (((BigInt(v - st) + 1) * n + sp - 1) / sp - 1).toInt
        case None => s.index
      }
      override def get(): InternalRow = {
        SeriesSource.rowsEmitted.incrementAndGet()
        emitted += 1
        val v = if (idsArr != null) idsArr(idx) else cur
        val row = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(width)
        var i = 0
        if (s.wantId) { row.update(i, v); i += 1 }
        // columns emit in schema order (id, slice, fill) — the pruned
        // readSchema preserves declared order, so the positions line up
        if (s.wantSlice) { row.update(i, sliceIdx(v)); i += 1 }
        if (s.wantFill) {
          SeriesSource.fillMaterialized.set(true)
          row.update(i, fill)
        }
        row
      }
      override def close(): Unit = ()
    }
  }
}

private class SeriesRowsEmittedMetric extends CustomSumMetric {
  override def name(): String = "rowsEmitted"
  override def description(): String = "rows emitted by graft-series readers"
}

private case class SeriesTaskMetric(value: Long) extends CustomTaskMetric {
  override def name(): String = "rowsEmitted"
}
