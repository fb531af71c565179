package graft.sources.v2

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 connector modeling the reference's paged Cassandra scan
  * (`datacrawler.py:133-184`: CQL SELECT with fetch_size paging, column
  * list, and token-range parallelism) as idiomatic Spark:
  *
  *  - **one `InputPartition` per page** (`fetch_size` rows) — the
  *    reference's unit of dispatch becomes Spark's unit of parallelism,
  *    so a 1000-executor cluster drains pages concurrently where the
  *    reference round-robins them over a thread pool;
  *  - **`SupportsPushDownRequiredColumns`** — the projected column list
  *    reaches the source (the CQL `SELECT col1, col2` seat); unselected
  *    columns are never materialized;
  *  - **`SupportsPushDownFilters`** — id-range predicates narrow the page
  *    range BEFORE partitions are planned (the token-range/primary-key
  *    restriction seat): pages outside the range are never created, the
  *    exact analogue of unprobed-partition pruning;
  *  - **`SupportsPushDownLimit`** — `LIMIT n` caps the range (the
  *    reference's `limit_fetch`);
  *  - **`SupportsPushDownAggregates`** — ungrouped COUNT(*)/MIN/MAX over
  *    the monotone columns are answered from RANGE ARITHMETIC with no
  *    rows generated at all (COMPLETE pushdown: the plan has no aggregate
  *    node left) — the exact seat of the reference's server-side
  *    `SELECT count(*) FROM table` pre-scan (`datacrawler.py:186-200`),
  *    which Cassandra likewise answers without streaming rows.
  *
  * Rows are a PURE FUNCTION of the row index and the `seed` option
  * (payload = md5 hex of `"$seed#$i"`), standing in for the remote table:
  * deterministic generation is what lets the DuckDB oracle recompute the
  * entire scan — content included — from `generate_series`, making this
  * connector gate exact where mock-source gates are usually rows-only.
  * A real Cassandra binding replaces [[PagedReader]]'s generator with a
  * driver session; every pushdown hook stays as-is.
  */
class PagedSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-paged"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    PagedSource.Schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val opts = new CaseInsensitiveStringMap(properties)
    new PagedTable(
      opts.getOrDefault("rows", "100000").toLong,
      opts.getOrDefault("fetchsize", "8192").toInt,
      opts.getOrDefault("seed", "s42"))
  }
}

object PagedSource {
  /** Diagnostic: page readers actually created (shared-JVM local mode
    * only — the runtime-filtering spec reads it to prove pages were
    * pruned, not just re-filtered). */
  val ReadersCreated = new java.util.concurrent.atomic.AtomicLong(0)

  val Schema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("bucket", IntegerType, nullable = false),
    StructField("payload", StringType, nullable = false),
    StructField("modified_ts", LongType, nullable = false)))

  val TsBase = 1700000000000L

  def payload(seed: String, i: Long): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    md.digest(s"$seed#$i".getBytes("UTF-8"))
      .map(b => f"${b & 0xff}%02x").mkString
  }
}

class PagedTable(rows: Long, fetchSize: Int, seed: String)
  extends Table with SupportsRead {
  override def name(): String = s"graft_paged($rows)"
  override def schema(): StructType = PagedSource.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new PagedScanBuilder(rows, fetchSize, seed)
}

class PagedScanBuilder(rows: Long, fetchSize: Int, seed: String)
  extends ScanBuilder with SupportsPushDownFilters
  with SupportsPushDownRequiredColumns with SupportsPushDownLimit
  with SupportsPushDownAggregates {

  private var lo = 0L
  private var hi = rows
  private var pruned: StructType = PagedSource.Schema
  private var pushed: Array[Filter] = Array.empty
  private var aggPushed: Option[
    org.apache.spark.sql.connector.expressions.aggregate.Aggregation] = None
  private var aggSchema: StructType = PagedSource.Schema

  private def asLong(v: Any): Option[Long] = v match {
    case l: Long => Some(l)
    case i: Int => Some(i.toLong)
    case s: Short => Some(s.toLong)
    case b: Byte => Some(b.toLong)
    case _ => None
  }

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val residual = filters.filterNot {
      case GreaterThanOrEqual("id", v) => asLong(v).exists { l =>
        lo = math.max(lo, l); true }
      case GreaterThan("id", v) => asLong(v).exists { l =>
        lo = math.max(lo, l + 1); true }
      case LessThan("id", v) => asLong(v).exists { l =>
        hi = math.min(hi, l); true }
      case LessThanOrEqual("id", v) => asLong(v).exists { l =>
        hi = math.min(hi, l + 1); true }
      case EqualTo("id", v) => asLong(v).exists { l =>
        lo = math.max(lo, l); hi = math.min(hi, l + 1); true }
      case _ => false
    }
    pushed = filters.diff(residual)
    residual
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(required: StructType): Unit =
    // preserve source field order regardless of projection order; after an
    // aggregate pushdown the "columns" are the agg results — keep them
    if (aggPushed.isEmpty)
      pruned = StructType(PagedSource.Schema.fields
        .filter(f => required.fieldNames.contains(f.name)))

  override def pushLimit(n: Int): Boolean = {
    // exact only because every pushed filter is FULLY evaluated by the
    // range (no residual semantics hide rows)
    hi = math.min(hi, lo + n)
    true
  }

  /** Which aggregations the range can answer arithmetically: ungrouped
    * COUNT(*) plus MIN/MAX of `id` / `modified_ts` (both strictly
    * monotone in the row index, so the extremes are the range endpoints).
    * Anything else — grouped, count(col), min/max of non-monotone
    * columns — declines and takes the ordinary row-scan path. */
  private def aggResultSchema(
      agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation)
      : Option[StructType] = {
    import org.apache.spark.sql.connector.expressions.aggregate.{CountStar, Max, Min}
    import org.apache.spark.sql.connector.expressions.NamedReference
    def monotoneCol(
        e: org.apache.spark.sql.connector.expressions.Expression): Boolean =
      e match {
        case r: NamedReference => r.fieldNames.length == 1 &&
          (r.fieldNames()(0) == "id" || r.fieldNames()(0) == "modified_ts")
        case _ => false
      }
    if (agg.groupByExpressions().nonEmpty) return None
    val fields = agg.aggregateExpressions().zipWithIndex.map {
      case (_: CountStar, i) =>
        StructField(s"agg_$i", LongType, nullable = false)
      case (m: Min, i) if monotoneCol(m.column) =>
        StructField(s"agg_$i", LongType, nullable = true)
      case (m: Max, i) if monotoneCol(m.column) =>
        StructField(s"agg_$i", LongType, nullable = true)
      case _ => return None
    }
    Some(StructType(fields))
  }

  override def supportCompletePushDown(
      agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation)
      : Boolean = aggResultSchema(agg).isDefined

  override def pushAggregation(
      agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation)
      : Boolean = aggResultSchema(agg) match {
    case Some(s) => aggPushed = Some(agg); aggSchema = s; true
    case None => false
  }

  override def build(): Scan = aggPushed match {
    case Some(agg) =>
      new PagedAggScan(lo, math.max(lo, hi), agg, aggSchema)
    case None => new PagedScan(lo, math.max(lo, hi), fetchSize, seed, pruned)
  }
}

/** One partition, one row: the aggregate answered from the filtered
  * range's endpoints — no row generation, the connector-level
  * `SELECT count(*)` (correct under complete pushdown directly, and
  * under a partial-merge plan too, since count-sum / min-min / max-max
  * over the single row are identity). Empty range → count 0, min/max
  * NULL (global-aggregate SQL semantics). */
class PagedAggScan(lo: Long, hi: Long,
    agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation,
    schema: StructType) extends Scan with Batch {
  override def readSchema(): StructType = schema
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-paged AGG-PUSHDOWN range=[$lo,$hi) " +
      agg.aggregateExpressions().map(_.toString).mkString(", ")
  override def planInputPartitions(): Array[InputPartition] =
    Array(PageRange(lo, hi))
  override def createReaderFactory(): PartitionReaderFactory =
    new PagedAggReaderFactory(agg)
}

class PagedAggReaderFactory(
    agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation)
  extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val r = p.asInstanceOf[PageRange]
    new PagedAggReader(r.start, r.end, agg)
  }
}

class PagedAggReader(lo: Long, hi: Long,
    agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation)
  extends PartitionReader[InternalRow] {
  import org.apache.spark.sql.connector.expressions.aggregate.{CountStar, Max, Min}
  import org.apache.spark.sql.connector.expressions.NamedReference

  private var emitted = false
  private val empty = hi <= lo

  private def endpoint(e: org.apache.spark.sql.connector.expressions.Expression,
      max: Boolean): Any =
    if (empty) null
    else {
      val i = if (max) hi - 1 else lo
      e.asInstanceOf[NamedReference].fieldNames()(0) match {
        case "id" => i
        case "modified_ts" => PagedSource.TsBase + i * 1000L
      }
    }

  override def next(): Boolean = { val first = !emitted; emitted = true; first }
  override def get(): InternalRow = InternalRow.fromSeq(
    agg.aggregateExpressions().toSeq.map {
      case _: CountStar => math.max(hi - lo, 0L)
      case m: Min => endpoint(m.column, max = false)
      case m: Max => endpoint(m.column, max = true)
    })
  override def close(): Unit = ()
}

case class PageRange(start: Long, end: Long) extends InputPartition

/** Batch scan with RUNTIME filtering ([[SupportsRuntimeFiltering]]) —
  * the dynamic-partition-pruning analogue for connectors: when this scan
  * sits under a join whose other side is selective, Spark executes that
  * side first (AQE), turns the join keys into an `In("id", ...)` runtime
  * filter, and calls [[filter]] BEFORE partitions are planned — so pages
  * containing none of the probed ids are never created, the exact
  * production shape of a point-lookup join against a paged store
  * (Cassandra token-range pruning from a driving dim). Runtime filters
  * are best-effort page-level pruning: the join above re-applies the
  * exact predicate, so the reader stays a plain range generator. */
class PagedScan(val lo: Long, val hi: Long, val fetchSize: Int,
    seed: String, prunedSchema: StructType)
  extends Scan with Batch with SupportsRuntimeFiltering {
  // runtime-narrowed id set (None = no runtime filter arrived)
  private var runtimeIds: Option[Array[Long]] = None

  override def filterAttributes():
      Array[org.apache.spark.sql.connector.expressions.NamedReference] =
    Array(org.apache.spark.sql.connector.expressions.Expressions.column("id"))

  override def filter(filters: Array[Filter]): Unit = filters.foreach {
    case In("id", vs) =>
      val longs = vs.flatMap {
        case l: Long => Some(l)
        case i: Int => Some(i.toLong)
        case _ => None
      }
      if (longs.length == vs.length) runtimeIds = Some(longs.sorted)
    case EqualTo("id", v: Long) => runtimeIds = Some(Array(v))
    case _ => () // best-effort: unrecognized runtime filters prune nothing
  }

  override def readSchema(): StructType = prunedSchema
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-paged range=[$lo,$hi) fetch=$fetchSize cols=${prunedSchema.fieldNames.mkString(",")}"
  override def planInputPartitions(): Array[InputPartition] = {
    val all = (lo until hi by fetchSize.toLong)
      .map(s => PageRange(s, math.min(s + fetchSize, hi)))
    val kept = runtimeIds match {
      case Some(ids) => all.filter(p =>
        ids.exists(v => v >= p.start && v < p.end))
      case None => all
    }
    kept.map(p => p: InputPartition).toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new PagedReaderFactory(seed, prunedSchema.fieldNames)
  override def toMicroBatchStream(checkpointLocation: String):
      streaming.MicroBatchStream =
    new PagedMicroBatchStream(lo, hi, fetchSize, seed, prunedSchema)
}

/** The reference's checkpoint_pages resume as NATIVE streaming offsets:
  * the offset IS the next row index (= page boundary), so a restarted
  * query resumes exactly where the checkpoint says — the Redis page-DONE
  * set (`datacrawler.py:202-209`) replaced by Spark's offset log, with
  * exactly-once delivery from the deterministic generator. Each
  * micro-batch covers [start, end) and splits into fetch-size pages like
  * the batch path. */
class PagedMicroBatchStream(lo: Long, hi: Long, fetchSize: Int,
    seed: String, prunedSchema: StructType)
  extends streaming.MicroBatchStream {
  import org.apache.spark.sql.connector.read.streaming.Offset

  private case class RowOffset(v: Long) extends Offset {
    override def json(): String = v.toString
  }

  override def initialOffset(): Offset = RowOffset(lo)
  override def latestOffset(): Offset = RowOffset(hi)
  override def deserializeOffset(json: String): Offset =
    RowOffset(json.trim.toLong)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  override def planInputPartitions(start: Offset, end: Offset):
      Array[InputPartition] = {
    val s = start.asInstanceOf[RowOffset].v
    val e = end.asInstanceOf[RowOffset].v
    (s until e by fetchSize.toLong)
      .map(p => PageRange(p, math.min(p + fetchSize, e)): InputPartition)
      .toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new PagedReaderFactory(seed, prunedSchema.fieldNames)
}

class PagedReaderFactory(seed: String, fields: Array[String])
  extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    PagedSource.ReadersCreated.incrementAndGet()
    val r = p.asInstanceOf[PageRange]
    new PagedReader(r.start, r.end, seed, fields)
  }
}

class PagedReader(start: Long, end: Long, seed: String,
    fields: Array[String]) extends PartitionReader[InternalRow] {
  private var i = start - 1
  override def next(): Boolean = { i += 1; i < end }
  override def get(): InternalRow = InternalRow.fromSeq(fields.toSeq.map {
    case "id" => i
    case "bucket" => (i % 32).toInt
    case "payload" => UTF8String.fromString(PagedSource.payload(seed, i))
    case "modified_ts" => PagedSource.TsBase + i * 1000L
  })
  override def close(): Unit = ()
}
