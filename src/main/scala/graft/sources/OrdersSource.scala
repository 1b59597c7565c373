package graft.sources

import java.util

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability}
import org.apache.spark.sql.connector.expressions.{NamedReference, Transform}
import org.apache.spark.sql.connector.expressions.aggregate.{AggregateFunc, Aggregation, Count, CountStar, Max, Min, Sum}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, In, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** A from-scratch DataSource V2 batch connector: the deterministic
  * order-event generator exposed as a real Spark table
  * (`spark.read.format("graft.sources.OrdersSource")`), the way a
  * custom wire format or internal feed would be wired into this engine
  * when no stock connector exists (the Kafka-source seam documented in
  * [[graft.streaming.OrderStream]] is the streaming face of the same
  * idea).
  *
  * Scale behaviour is the point of the exemplar:
  *   - **partition planning**: the id space [0, rows) splits into
  *     `parts` contiguous `InputPartition`s — each task generates only
  *     its slice, nothing materializes on the driver;
  *   - **filter pushdown** (`SupportsPushDownFilters`): `order_id`
  *     range predicates are accepted at planning time and (a) prune
  *     whole partitions whose range can't match, (b) narrow the
  *     generation bounds inside surviving partitions — the DSv2
  *     analogue of parquet row-group pruning (`OrdersSourceSpec`
  *     asserts both);
  *   - **column pruning** (`SupportsPushDownRequiredColumns`): readers
  *     only compute the projected columns.
  *
  * Row content is pure integer arithmetic on the row id (same catalog
  * trick as [[graft.streaming.OrderProducer]]), so the DuckDB oracle
  * regenerates the identical table from `range()`.
  */
class OrdersSource extends org.apache.spark.sql.connector.catalog.TableProvider {

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    OrdersSource.Schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new OrdersTable(
      properties.getOrDefault("rows", "1000").toLong,
      properties.getOrDefault("parts", "8").toInt)
}

object OrdersSource {
  val Schema: StructType = StructType(Seq(
    StructField("order_id", LongType, nullable = false),
    StructField("product", StringType, nullable = false),
    StructField("price_cents", LongType, nullable = false),
    // Partition-constant by construction: bucket = order_id div
    // ceil(rows/parts), i.e. the slice index — the column
    // SupportsReportPartitioning clusters on.
    StructField("bucket", LongType, nullable = false)))

  val Products: Array[String] =
    Array("Laptop", "Mouse", "Keyboard", "Monitor",
      "Webcam", "Headset", "Dock", "Cable")

  // floorMod, not %: the multiply wraps negative past id ~3.5e9 (and
  // ~1.2e15 for the price), where a plain % would hand Products a
  // negative index. Identical to % for every id below the wrap, so the
  // oracle's (i * k) % m stays bit-equal over any queried range.
  def product(id: Long): String =
    Products(java.lang.Math.floorMod(id * 2654435761L, 8L).toInt)
  def priceCents(id: Long): Long =
    java.lang.Math.floorMod(id * 7919L, 99000L) + 1000L

  /** Revenue by product over the connector with BOTH `order_id` bounds
    * pushed into the source (partition pruning + in-partition bound
    * narrowing); the oracle regenerates the identical rows from
    * `range()`. Input dir is unused — the source IS the data. */
  def revenueQuery(spark: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    spark.read.format("graft.sources.OrdersSource")
      .option("rows", "20000").option("parts", "8").load()
      .filter(col("order_id") >= 2000 && col("order_id") < 18000)
      .groupBy("product")
      .agg(count(lit(1)).as("n_orders"),
        sum("price_cents").as("total_cents"))
  }

  /** Price-stats rollup whose WHOLE first aggregation stage runs inside
    * the connector ([[OrdersScanBuilder.pushAggregation]]): each of the
    * 8 readers emits ≤8 per-group partial rows for its 25k-id slice and
    * Spark merges them — 200k generated rows never leave the source.
    * The oracle regenerates the identical table from `range()`. */
  def aggPushdownQuery(spark: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    spark.read.format("graft.sources.OrdersSource")
      .option("rows", "200000").option("parts", "8").load()
      .groupBy("product")
      .agg(count(lit(1)).as("n_orders"),
        sum("price_cents").as("total_cents"),
        min("price_cents").as("min_cents"),
        max("price_cents").as("max_cents"))
  }

  val queries: Map[String, (org.apache.spark.sql.SparkSession, String) =>
      org.apache.spark.sql.DataFrame] =
    Map("q_dsv2_source" -> revenueQuery,
      "q_dsv2_agg" -> aggPushdownQuery)

  val oracles: Map[String, String] = Map(
    "q_dsv2_source" ->
      """WITH ids AS (SELECT unnest(range(2000, 18000)) AS i),
        |o AS (SELECT
        |  ['Laptop','Mouse','Keyboard','Monitor',
        |   'Webcam','Headset','Dock','Cable']
        |    [CAST((i * 2654435761) % 8 AS INT) + 1] AS product,
        |  (i * 7919) % 99000 + 1000 AS price_cents
        |  FROM ids)
        |SELECT product, count(*) AS n_orders,
        |       CAST(sum(price_cents) AS BIGINT) AS total_cents
        |FROM o GROUP BY 1""".stripMargin,
    "q_dsv2_agg" ->
      """WITH ids AS (SELECT unnest(range(0, 200000)) AS i),
        |o AS (SELECT
        |  ['Laptop','Mouse','Keyboard','Monitor',
        |   'Webcam','Headset','Dock','Cable']
        |    [CAST((i * 2654435761) % 8 AS INT) + 1] AS product,
        |  (i * 7919) % 99000 + 1000 AS price_cents
        |  FROM ids)
        |SELECT product, count(*) AS n_orders,
        |       CAST(sum(price_cents) AS BIGINT) AS total_cents,
        |       min(price_cents) AS min_cents,
        |       max(price_cents) AS max_cents
        |FROM o GROUP BY 1""".stripMargin)
}

private class OrdersTable(rows: Long, parts: Int)
    extends Table with SupportsRead {
  override def name(): String = s"graft_orders($rows)"
  override def schema(): StructType = OrdersSource.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new OrdersScanBuilder(rows, parts,
      options.getOrDefault("rowsPerBatch", "250").toLong)
}

/** One pushed aggregate column: how a reader folds a row id into its
  * per-group accumulator slot. All accepted functions accumulate in a
  * single Long (count, sum, min, max over the two integer columns), so a
  * group's state is one `Array[Long]`. */
private[graft] sealed trait PushedAgg {
  def init: Long
  def fold(acc: Long, id: Long): Long
}
private[graft] case object AggCountRow extends PushedAgg {
  val init = 0L; def fold(acc: Long, id: Long): Long = acc + 1
}
private[graft] final case class AggSum(col: Long => Long) extends PushedAgg {
  val init = 0L; def fold(acc: Long, id: Long): Long = acc + col(id)
}
private[graft] final case class AggMin(col: Long => Long) extends PushedAgg {
  val init = Long.MaxValue; def fold(acc: Long, id: Long): Long = math.min(acc, col(id))
}
private[graft] final case class AggMax(col: Long => Long) extends PushedAgg {
  val init = Long.MinValue; def fold(acc: Long, id: Long): Long = math.max(acc, col(id))
}

private class OrdersScanBuilder(rows: Long, parts: Int, rowsPerBatch: Long)
    extends ScanBuilder with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns with SupportsPushDownAggregates
    with SupportsPushDownLimit with SupportsPushDownTopN {

  private var lo = 0L
  private var hi = rows
  private val pushed = mutable.ArrayBuffer.empty[Filter]
  private var required: StructType = OrdersSource.Schema
  private var pushedAgg: Option[(Seq[String], Seq[PushedAgg])] = None

  /** LIMIT pushdown (`SupportsPushDownLimit`): ids are generated in
    * order, so a LIMIT n over the (already filter-narrowed) slice can
    * stop generation at lo + n — the other `parts − 1` readers plan
    * empty or truncated slices instead of generating rows a
    * LocalLimit would immediately discard. Declared PARTIAL
    * (`isPartiallyPushed` = true): Spark keeps its own limit above the
    * scan, so correctness never depends on the source's counting —
    * the pushdown only prunes generation, which is the scalable part.
    * Declined under a pushed aggregation (the limit applies to
    * post-aggregation rows, not scan rows). */
  override def pushLimit(limit: Int): Boolean = {
    if (pushedAgg.isDefined) false
    else {
      hi = math.min(hi, math.addExact(lo, limit.toLong))
      true
    }
  }

  /** TOP-N pushdown (`SupportsPushDownTopN`): ORDER BY order_id
    * [ASC|DESC] LIMIT n keeps only the first/last n ids of the slice —
    * the generated-source face of "the data is stored sorted on the
    * key, serve the heads". Only a single-column ordering on
    * `order_id` qualifies (any other sort key would need a real sort);
    * PARTIAL like [[pushLimit]], so Spark's Sort+Limit stay above the
    * scan as the correctness net. */
  override def pushTopN(
      orders: Array[org.apache.spark.sql.connector.expressions.SortOrder],
      limit: Int): Boolean = {
    import org.apache.spark.sql.connector.expressions.SortDirection
    if (pushedAgg.isDefined || orders.length != 1) return false
    val so = orders(0)
    if (!fieldOf(so.expression()).contains("order_id")) return false
    so.direction() match {
      case SortDirection.ASCENDING =>
        hi = math.min(hi, math.addExact(lo, limit.toLong)); true
      case SortDirection.DESCENDING =>
        lo = math.max(lo, hi - limit.toLong); true
      case _ => false
    }
  }

  override def isPartiallyPushed(): Boolean = true

  private def fieldOf(e: org.apache.spark.sql.connector.expressions.Expression): Option[String] =
    e match {
      case nr: NamedReference if nr.fieldNames.length == 1 => Some(nr.fieldNames()(0))
      case _ => None
    }

  private def longGen(name: String): Option[Long => Long] = name match {
    case "order_id" => Some(identity[Long])
    case "price_cents" => Some(OrdersSource.priceCents)
    case _ => None // product is a string — min/max/sum over it stay post-scan
  }

  /** Aggregate pushdown (`SupportsPushDownAggregates`), deliberately
    * PARTIAL (`supportCompletePushDown` stays false): each of the
    * `parts` readers folds its id slice into at most |groups| rows and
    * Spark plans the final merge (sum-of-sums, sum-of-counts,
    * min-of-mins, max-of-maxes) above the scan. That is the shape that
    * scales — generation AND first-stage aggregation stay distributed
    * across executors, only group-sized partials cross the wire, and no
    * single reader has to see the whole id space (complete pushdown
    * would force exactly that). Accepted: COUNT(*) / COUNT(col) /
    * SUM / MIN / MAX of the integer columns, grouped by plain columns;
    * DISTINCT or anything else declines the whole aggregation (Spark
    * then aggregates the raw scan — correct, just unpushed). */
  override def pushAggregation(agg: Aggregation): Boolean = {
    val groups = agg.groupByExpressions.toSeq.map(fieldOf)
    val funcs = agg.aggregateExpressions.toSeq.map {
      case _: CountStar => Some(AggCountRow)
      case c: Count if !c.isDistinct =>
        // every generated column is non-null, so COUNT(col) == COUNT(*)
        fieldOf(c.column).map(_ => AggCountRow)
      case s: Sum if !s.isDistinct => fieldOf(s.column).flatMap(longGen).map(AggSum)
      case m: Min => fieldOf(m.column).flatMap(longGen).map(AggMin)
      case m: Max => fieldOf(m.column).flatMap(longGen).map(AggMax)
      case _: AggregateFunc => None
    }
    val known = Set("order_id", "product", "price_cents")
    if (groups.forall(_.exists(known)) && funcs.forall(_.isDefined) && funcs.nonEmpty) {
      pushedAgg = Some((groups.flatten, funcs.flatten)); true
    } else false
  }

  /** Catalyst hands numeric literals as whatever boxed type the user
    * wrote (`Long` from a long literal, `Integer` from an int one);
    * accepting only one silently drops pruning for the other. */
  private def asLong(v: Any): Option[Long] = v match {
    case l: java.lang.Long => Some(l)
    case i: java.lang.Integer => Some(i.longValue)
    case _ => None
  }

  /** Every range shape on `order_id` narrows the generated [lo, hi):
    * `=v` as [v, v+1), `>v` as [v+1, ∞), `<=v` as (−∞, v+1). Anything
    * unrecognized stays a post-scan filter — correct, just unpruned.
    * The three `l + 1` shapes decline `l == Long.MaxValue` (the +1
    * would wrap negative and, because accepted filters are consumed
    * rather than re-applied, silently flip the result set); declined
    * predicates just stay post-scan filters. */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val exclusive = (v: Any) => asLong(v).filter(_ < Long.MaxValue)
    filters.filter { f =>
      val bound = f match {
        case GreaterThanOrEqual("order_id", v) => asLong(v).map(l => (l, hi))
        case GreaterThan("order_id", v) => exclusive(v).map(l => (l + 1, hi))
        case LessThan("order_id", v) => asLong(v).map(l => (lo, l))
        case LessThanOrEqual("order_id", v) => exclusive(v).map(l => (lo, l + 1))
        case EqualTo("order_id", v) => exclusive(v).map(l => (l, l + 1))
        case _ => None
      }
      bound match {
        case Some((newLo, newHi)) =>
          lo = math.max(lo, newLo); hi = math.min(hi, newHi)
          pushed += f; false
        case None => true // stays a post-scan filter
      }
    }
  }
  override def pushedFilters(): Array[Filter] = pushed.toArray

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = pushedAgg match {
    case Some((groupCols, aggs)) =>
      new OrdersAggScan(rows, parts, lo, hi, groupCols, aggs)
    case None => new OrdersScan(rows, parts, lo, hi, required, rowsPerBatch)
  }
}

/** Scan face of a pushed (partial) aggregation: same pruned id slices
  * as [[OrdersScan]], but each reader emits its slice's per-group
  * accumulator rows instead of raw rows. Output schema follows the
  * DSv2 contract — group-by columns first, then one column per
  * aggregate (all Long here). */
private[graft] class OrdersAggScan(rows: Long, parts: Int, lo: Long, hi: Long,
    groupCols: Seq[String], aggs: Seq[PushedAgg]) extends Scan with Batch {

  def pushedBounds: (Long, Long) = (lo, hi)

  override def readSchema(): StructType = StructType(
    groupCols.map(c => OrdersSource.Schema(OrdersSource.Schema.fieldIndex(c))) ++
      aggs.zipWithIndex.map { case (_, i) =>
        StructField(s"agg_$i", LongType, nullable = false) })

  override def toBatch: Batch = this
  override def description(): String =
    s"graft_orders rows=$rows PushedBounds=[$lo, $hi) " +
      s"PushedAggregation=[${aggs.mkString(", ")}] groupBy=[${groupCols.mkString(", ")}]"

  override def planInputPartitions(): Array[InputPartition] = {
    val per = math.max(1L, (rows + parts - 1) / parts)
    (0 until parts).iterator
      .map(p => OrdersRange(math.max(p * per, lo),
        math.min(math.min((p + 1) * per, rows), hi), p.toLong))
      .filter(r => r.start < r.end)
      .toArray[InputPartition]
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new OrdersAggReaderFactory(groupCols, aggs)
}

private class OrdersAggReaderFactory(groupCols: Seq[String], aggs: Seq[PushedAgg])
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val r = p.asInstanceOf[OrdersRange]
    new PartitionReader[InternalRow] {
      // Group key generators from the pruned group-by columns only.
      private val keyGens: Array[Long => Any] = groupCols.toArray.map {
        case "order_id" => (i: Long) => java.lang.Long.valueOf(i)
        case "product" => (i: Long) => OrdersSource.product(i)
        case "price_cents" => (i: Long) => java.lang.Long.valueOf(OrdersSource.priceCents(i))
      }
      private val out: Iterator[InternalRow] = {
        val accs = mutable.LinkedHashMap.empty[Seq[Any], Array[Long]]
        var id = r.start
        while (id < r.end) {
          val key = keyGens.map(_(id)).toSeq
          val acc = accs.getOrElseUpdate(key, aggs.map(_.init).toArray)
          var j = 0
          while (j < acc.length) { acc(j) = aggs(j).fold(acc(j), id); j += 1 }
          id += 1
        }
        accs.iterator.map { case (key, acc) =>
          InternalRow.fromSeq(key.map {
            case s: String => UTF8String.fromString(s)
            case v => v
          } ++ acc)
        }
      }
      override def next(): Boolean = out.hasNext
      override def get(): InternalRow = out.next()
      override def close(): Unit = ()
    }
  }
}

/** `bucket` is the slice index — constant across the range by
  * construction (each slice is one `per`-sized id block), which is what
  * lets it serve as the partition key for reported partitioning. */
private case class OrdersRange(start: Long, end: Long, bucket: Long)
    extends InputPartition
    with org.apache.spark.sql.connector.read.HasPartitionKey {
  override def partitionKey(): InternalRow = InternalRow(bucket)
}

private case class OrdersOffset(id: Long) extends Offset {
  override def json(): String = id.toString
}

private[graft] class OrdersScan(rows: Long, parts: Int, lo: Long, hi: Long,
    required: StructType, rowsPerBatch: Long)
    extends Scan with Batch with SupportsRuntimeFiltering
    with org.apache.spark.sql.connector.read.SupportsReportPartitioning {

  private val per = math.max(1L, (rows + parts - 1) / parts)

  /** REPORTED PARTITIONING (`SupportsReportPartitioning`): each slice
    * holds exactly one `bucket` value, so the scan reports
    * KeyGroupedPartitioning(bucket) and Spark (with
    * spark.sql.sources.v2.bucketing.enabled) plans bucket-clustered
    * aggregations and storage-partitioned joins with NO Exchange above
    * this scan — the DSv2 face of bucketing, the same shuffle
    * elimination a bucketed table write buys, owned by the connector. */
  override def outputPartitioning():
      org.apache.spark.sql.connector.read.partitioning.Partitioning =
    new org.apache.spark.sql.connector.read.partitioning.KeyGroupedPartitioning(
      Array(org.apache.spark.sql.connector.expressions.Expressions
        .identity("bucket")),
      planInputPartitions().length)

  /** Structural view of the consumed id bounds, for tests — asserting
    * on these beats substring-matching [[description]]'s formatting. */
  def pushedBounds: (Long, Long) = (lo, hi)

  // Runtime (post-planning) narrowing — the DSv2 dynamic-partition-
  // pruning seam: when this scan sits under a join whose other side is
  // selective, Spark evaluates the build side FIRST and hands the join
  // keys here as an In filter before input partitions are planned.
  // [rlo, rhi) narrows the id span (pruning whole slices); `ids` keeps
  // the exact surviving keys so readers emit ONLY them instead of
  // generating and discarding the rest of the slice.
  private var rlo = lo
  private var rhi = hi
  private var ids: Array[Long] = null

  /** Runtime-narrowed bounds + surviving-key count, for tests. */
  def runtimeState: (Long, Long, Option[Int]) =
    (rlo, rhi, Option(ids).map(_.length))

  override def filterAttributes():
      Array[org.apache.spark.sql.connector.expressions.NamedReference] =
    Array(org.apache.spark.sql.connector.expressions.Expressions.column("order_id"))

  override def filter(filters: Array[Filter]): Unit = filters.foreach {
    case In("order_id", values) =>
      val vs = values.collect {
        case l: java.lang.Long => l.longValue
        case i: java.lang.Integer => i.longValue
      }.filter(v => v >= rlo && v < rhi).sorted.distinct
      ids = vs
      rlo = if (vs.isEmpty) rhi else math.max(rlo, vs.head)
      rhi = if (vs.isEmpty) rlo else math.min(rhi, vs.last + 1)
    case EqualTo("order_id", v) =>
      (v match {
        case l: java.lang.Long => Some(l.longValue)
        case i: java.lang.Integer => Some(i.longValue)
        case _ => None
      }).foreach { l =>
        rlo = math.max(rlo, l); rhi = math.min(rhi, l + 1)
      }
    case _ => () // unrecognized runtime filters are advisory — ignore
  }

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft_orders rows=$rows PushedBounds=[$lo, $hi)"

  private def slices(from: Long, until: Long): Array[InputPartition] =
    (0 until parts).iterator
      .map(p => OrdersRange(math.max(p * per, from),
        math.min(math.min((p + 1) * per, rows), until), p.toLong))
      .filter(r => r.start < r.end)
      .toArray[InputPartition]

  /** Split [0, rows) evenly, clamp each slice to the pushed (and, when
    * present, runtime) bounds and drop slices the bounds empty out —
    * partition-level pruning. */
  override def planInputPartitions(): Array[InputPartition] = slices(rlo, rhi)

  override def createReaderFactory(): PartitionReaderFactory =
    new OrdersReaderFactory(required, ids, per)

  /** Streaming face: the same id space consumed incrementally. Offsets
    * are positions in the id space (`rowsPerBatch` ids admitted per
    * micro-batch); each batch's [start, end) re-partitions through the
    * identical slicing, and restart recovery is the checkpointed offset
    * replayed through `deserializeOffset` — the consumer-group
    * commit/seek semantics of the reference's Kafka consumer, expressed
    * as a DSv2 stream. */
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new MicroBatchStream {
      private var planned = lo
      override def initialOffset(): Offset = OrdersOffset(lo)
      override def latestOffset(): Offset = {
        planned = math.min(planned + rowsPerBatch, hi)
        OrdersOffset(planned)
      }
      override def deserializeOffset(json: String): Offset = {
        // Restart path: never let latestOffset fall behind the
        // checkpointed position.
        planned = math.max(planned, json.toLong)
        OrdersOffset(json.toLong)
      }
      override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] =
        slices(start.asInstanceOf[OrdersOffset].id,
          end.asInstanceOf[OrdersOffset].id)
      override def createReaderFactory(): PartitionReaderFactory =
        new OrdersReaderFactory(required, null, per, columnar = false)
      override def commit(end: Offset): Unit = ()
      override def stop(): Unit = ()
    }
}

/** `runtimeIds`, when non-null, is the sorted surviving key set from a
  * runtime (DPP) filter: readers walk only their slice of it instead of
  * generating the whole id range and discarding misses. */
private class OrdersReaderFactory(required: StructType,
    runtimeIds: Array[Long], per: Long, columnar: Boolean = true)
    extends PartitionReaderFactory {

  /** COLUMNAR (vectorized) read path: contiguous generation fills
    * `ColumnarBatch`es of `OnHeapColumnVector`s directly — Spark's
    * whole-stage codegen then consumes columns without a per-row
    * conversion boundary, the same batch shape the parquet vectorized
    * reader hands up. The runtime-filtered (DPP) walk stays on the
    * row reader (its sparse id list defeats the dense fill that makes
    * a vector batch worth building), as does the streaming face
    * (`columnar = false` there — micro-batches are latency-bound, not
    * scan-bound). */
  override def supportColumnarReads(p: InputPartition): Boolean =
    columnar && runtimeIds == null

  override def createColumnarReader(p: InputPartition):
      PartitionReader[org.apache.spark.sql.vectorized.ColumnarBatch] = {
    import org.apache.spark.sql.execution.vectorized.OnHeapColumnVector
    import org.apache.spark.sql.vectorized.ColumnarBatch
    val r = p.asInstanceOf[OrdersRange]
    new PartitionReader[ColumnarBatch] {
      private val batchRows = 4096
      private var cur = r.start
      private var batch: ColumnarBatch = null
      // One filler per pruned column, resolved once.
      private val fill: Array[(OnHeapColumnVector, Int, Long) => Unit] =
        required.fields.map(_.name).map {
          case "order_id" =>
            (v: OnHeapColumnVector, i: Int, id: Long) => v.putLong(i, id)
          case "price_cents" =>
            (v: OnHeapColumnVector, i: Int, id: Long) =>
              v.putLong(i, OrdersSource.priceCents(id))
          case "product" =>
            (v: OnHeapColumnVector, i: Int, id: Long) => {
              val b = OrdersSource.product(id)
                .getBytes(java.nio.charset.StandardCharsets.UTF_8)
              v.putByteArray(i, b); ()
            }
          case "bucket" =>
            (v: OnHeapColumnVector, i: Int, id: Long) =>
              v.putLong(i, id / per)
        }
      override def next(): Boolean = {
        if (batch != null) { batch.close(); batch = null }
        if (cur >= r.end) false
        else {
          val n = math.min(batchRows.toLong, r.end - cur).toInt
          val vecs = required.fields
            .map(f => new OnHeapColumnVector(n, f.dataType))
          var i = 0
          while (i < n) {
            var c = 0
            while (c < fill.length) { fill(c)(vecs(c), i, cur + i); c += 1 }
            i += 1
          }
          batch = new ColumnarBatch(
            vecs.toArray[org.apache.spark.sql.vectorized.ColumnVector], n)
          cur += n
          true
        }
      }
      override def get(): ColumnarBatch = batch
      override def close(): Unit = { if (batch != null) batch.close() }
    }
  }

  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val r = p.asInstanceOf[OrdersRange]
    new PartitionReader[InternalRow] {
      // Column generators resolved once per reader from the pruned schema.
      private val gens: Array[Long => Any] = required.fields.map(_.name).map {
        case "order_id" => (i: Long) => i
        case "product" => (i: Long) =>
          UTF8String.fromString(OrdersSource.product(i))
        case "price_cents" => (i: Long) => OrdersSource.priceCents(i)
        case "bucket" => (i: Long) => i / per
      }
      // Either walk the runtime id list (from the first id ≥ start) or
      // the contiguous slice.
      private var pos =
        if (runtimeIds == null) -1
        else {
          var i = java.util.Arrays.binarySearch(runtimeIds, r.start)
          if (i < 0) i = -i - 1
          i - 1
        }
      private var id = r.start - 1
      override def next(): Boolean =
        if (runtimeIds == null) { id += 1; id < r.end }
        else {
          pos += 1
          pos < runtimeIds.length && { id = runtimeIds(pos); id < r.end }
        }
      override def get(): InternalRow = InternalRow.fromSeq(gens.map(_(id)))
      override def close(): Unit = ()
    }
  }
}
