package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.expressions.NamedReference
import org.apache.spark.sql.connector.expressions.aggregate.{Aggregation, CountStar, Max, Min}
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownAggregates, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsTriggerAvailableNow}
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types.{LongType, StringType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Custom DataSourceV2 connector — a deterministic synthetic documents
  * table (`doc_id, text, lang, source, n_chars`), the full connector
  * ladder a real source needs at 100 TB:
  *
  *   - **partition planning**: `rows` split into `partitions` disjoint
  *     id ranges, each read by an independent task — the source scales
  *     out like a parquet directory does;
  *   - **column pruning** ([[SupportsPushDownRequiredColumns]]): only
  *     requested columns are GENERATED — `select(doc_id)` never builds
  *     a text body (the analogue of not reading parquet pages);
  *   - **filter pushdown** ([[SupportsPushDownFilters]]): `doc_id`
  *     range/equality predicates narrow each partition's id range BEFORE
  *     generation, and fully-covered partitions plan away to nothing —
  *     the analogue of row-group/partition elision.
  *
  * Rows are a pure function of (doc_id, seed): reading twice, at any
  * parallelism, with any pushdown, yields identical data — the property
  * every test in the repo leans on for parquet inputs, provided here by
  * construction. Usage:
  * `spark.read.format(classOf[SynthDocsSource].getName)
  *   .option("rows", n).option("partitions", p).option("seed", s).load()`
  */
class SynthDocsSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SynthDocs.Schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    // options are case-insensitive everywhere else in DSv2 — wrap the
    // raw map so `rowsPerBatch`/`rowsperbatch`/`ROWSPERBATCH` all bind
    val opts = new CaseInsensitiveStringMap(properties)
    new SynthDocsTable(
      opts.getLong("rows", 1000L),
      opts.getInt("partitions", 8),
      opts.getLong("seed", 42L),
      opts.getLong("rowsperbatch", 100L))
  }
}

object SynthDocs {
  val Schema: StructType = new StructType()
    .add("doc_id", LongType, nullable = false)
    .add("text", StringType, nullable = false)
    .add("lang", StringType, nullable = false)
    .add("source", StringType, nullable = false)
    .add("n_chars", LongType, nullable = false)

  private val Langs = Array("en", "en", "en", "de", "es", "fr", "zh")
  private val Vocab = Array("the", "a", "table", "row", "scan", "merge",
    "hash", "sort", "key", "value", "batch", "window", "stream", "part",
    "fast", "slow", "spark", "line", "agg", "join")

  /** splitmix64 — the standard public-domain mix; pure function of x. */
  def mix(x: Long): Long = {
    var z = x + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  def textOf(id: Long, seed: Long): String = {
    val h = mix(id ^ seed)
    val n = 20 + (Math.floorMod(h, 31L)).toInt // 20..50 tokens
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < n) {
      if (i > 0) sb.append(' ')
      sb.append(Vocab(Math.floorMod(mix(h + i), Vocab.length.toLong).toInt))
      i += 1
    }
    sb.toString
  }

  def langOf(id: Long, seed: Long): String =
    Langs(Math.floorMod(mix(id ^ seed ^ 7L), Langs.length.toLong).toInt)

  def sourceOf(id: Long): String = "src" + Math.floorMod(id, 20L)
}

class SynthDocsTable(rows: Long, partitions: Int, seed: Long,
    rowsPerBatch: Long = 100L)
    extends Table with SupportsRead {
  override def name(): String = s"synth_docs($rows)"
  override def schema(): StructType = SynthDocs.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new SynthDocsScanBuilder(rows, partitions, seed, rowsPerBatch)
}

/** Builder accumulating pruning + pushdown, then freezing into a Scan. */
class SynthDocsScanBuilder(rows: Long, partitions: Int, seed: Long,
    rowsPerBatch: Long = 100L)
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters with SupportsPushDownAggregates {

  private var required: StructType = SynthDocs.Schema
  private var lo: Long = 0L         // inclusive id bound from pushed filters
  private var hi: Long = rows - 1L  // inclusive
  private var pushed: Array[Filter] = Array.empty
  private var aggResult: Option[Seq[Any]] = None // answered from metadata

  override def pruneColumns(requiredSchema: StructType): Unit =
    // preserve generation-schema field order regardless of projection order
    required = new StructType(
      SynthDocs.Schema.fields.filter(f => requiredSchema.fieldNames.contains(f.name)))

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, rejected) = filters.partition {
      case EqualTo("doc_id", _: Long) => true
      case GreaterThan("doc_id", _: Long) => true
      case GreaterThanOrEqual("doc_id", _: Long) => true
      case LessThan("doc_id", _: Long) => true
      case LessThanOrEqual("doc_id", _: Long) => true
      case _ => false
    }
    accepted.foreach {
      case EqualTo(_, v: Long) => lo = math.max(lo, v); hi = math.min(hi, v)
      // strict bounds at Long extremes must SATURATE, not wrap — a wrapped
      // `v + 1` would silently turn an always-false predicate into all-rows
      // (the filter is accepted, so Spark never re-checks it)
      case GreaterThan(_, v: Long) =>
        if (v == Long.MaxValue) { lo = 1; hi = 0 } else lo = math.max(lo, v + 1)
      case GreaterThanOrEqual(_, v: Long) => lo = math.max(lo, v)
      case LessThan(_, v: Long) =>
        if (v == Long.MinValue) { lo = 1; hi = 0 } else hi = math.min(hi, v - 1)
      case LessThanOrEqual(_, v: Long) => hi = math.min(hi, v)
      case _ =>
    }
    pushed = accepted
    // ranges are applied EXACTLY, so accepted filters need no re-check;
    // still return them as residuals-free per the v2 contract (empty =
    // source guarantees them)
    rejected
  }

  override def pushedFilters(): Array[Filter] = pushed

  /** COUNT(*) / COUNT(doc_id) / MIN(doc_id) / MAX(doc_id) are pure
    * functions of the (filter-clipped) id range — answered from METADATA
    * with zero row generation, the analogue of answering from parquet
    * footer stats. Runs AFTER filter pushdown per the v2 contract, so
    * the clipped [lo,hi] is what gets summarized. */
  override def supportCompletePushDown(agg: Aggregation): Boolean =
    aggAnswer(agg).isDefined

  override def pushAggregation(agg: Aggregation): Boolean = {
    aggResult = aggAnswer(agg)
    aggResult.isDefined
  }

  private def isDocId(e: org.apache.spark.sql.connector.expressions.Expression) =
    e match {
      case r: NamedReference => r.fieldNames.sameElements(Array("doc_id"))
      case _ => false
    }

  private def aggAnswer(agg: Aggregation): Option[Seq[Any]] = {
    if (agg.groupByExpressions.nonEmpty) return None
    val n = math.max(0L, hi - lo + 1)
    val vals = agg.aggregateExpressions.map {
      case _: CountStar => Some(n)
      case c: org.apache.spark.sql.connector.expressions.aggregate.Count
          if isDocId(c.column) && !c.isDistinct => Some(n)
      case m: Min if isDocId(m.column) => Some(if (n == 0) null else lo)
      case m: Max if isDocId(m.column) => Some(if (n == 0) null else hi)
      case _ => None
    }
    if (vals.forall(_.isDefined)) Some(vals.map(_.get).toSeq) else None
  }

  override def build(): Scan = aggResult match {
    case Some(row) => new SynthDocsAggScan(lo, hi, row)
    case None => new SynthDocsScan(lo, hi, rows, partitions, seed, required, rowsPerBatch)
  }
}

/** Metadata-answered aggregate: one partition, one pre-computed row. */
class SynthDocsAggScan(lo: Long, hi: Long, row: Seq[Any]) extends Scan with Batch {
  override def readSchema(): StructType = {
    var st = new StructType()
    row.indices.foreach(i => st = st.add(s"agg_$i", LongType, nullable = true))
    st
  }
  override def toBatch: Batch = this
  override def description(): String = s"SynthDocsAggScan ids=[$lo,$hi] metadata-only"
  override def planInputPartitions(): Array[InputPartition] =
    Array(SynthDocsPartition(0, 0, 0))
  override def createReaderFactory(): PartitionReaderFactory = {
    val vals = row.toArray
    (_: InputPartition) => new PartitionReader[InternalRow] {
      private var done = false
      override def next(): Boolean = { val r = !done; done = true; r }
      override def get(): InternalRow = InternalRow.fromSeq(vals.toIndexedSeq)
      override def close(): Unit = ()
    }
  }
}

class SynthDocsScan(lo: Long, hi: Long, rows: Long, partitions: Int,
    seed: Long, required: StructType, rowsPerBatch: Long = 100L)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new SynthDocsMicroBatch(lo, hi, rows, partitions, seed, required, rowsPerBatch)
  override def description(): String =
    s"SynthDocsScan ids=[$lo,$hi] cols=${required.fieldNames.mkString(",")}"

  override def planInputPartitions(): Array[InputPartition] = {
    // partition the ORIGINAL id space, then clip each split by the pushed
    // range — fully-excluded splits plan away entirely (partition elision)
    val per = math.max(1L, (rows + partitions - 1) / partitions)
    (0L until rows by per).flatMap { start =>
      val s0 = math.max(start, lo)
      val e0 = math.min(start + per - 1, hi)
      if (s0 <= e0) Some(SynthDocsPartition(s0, e0, seed): InputPartition) else None
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new SynthDocsReaderFactory(required)
}

/** Offset = count of doc ids emitted so far (ids arrive in order). */
case class SynthDocsOffset(n: Long) extends Offset {
  override def json(): String = n.toString
}

/** Micro-batch side of the connector: the same deterministic id space
  * arrives `rowsPerBatch` ids per trigger until `rows` is reached.
  * Offsets are plain emitted-row counts — restart from a checkpoint
  * resumes mid-stream and regenerates IDENTICAL rows (purity of
  * (doc_id, seed) is what makes the source exactly-once replayable,
  * the property a real log-backed source gets from its log).
  *
  * Restart safety: `latestOffset` must never REGRESS below an offset
  * the engine has already committed — a fresh instance starts its pace
  * counter at 0, so the counter is clamped up by every offset the
  * engine echoes back through `deserializeOffset`/`planInputPartitions`
  * (those carry the checkpointed positions on recovery). Under
  * Trigger.AvailableNow the engine snapshots ONE target offset up
  * front, so `prepareForTriggerAvailableNow` reports the full cap —
  * run-to-completion processes everything, as that trigger promises.
  * Note: Spark's micro-batch planner builds this via
  * `newScanBuilder(options).build()` WITHOUT pruning/pushdown today;
  * the pushed [lo,hi] id bounds are still honored here defensively so
  * a future planner that does push filters cannot make the stream emit
  * rows the plan no longer re-filters. */
class SynthDocsMicroBatch(lo: Long, hi: Long, rows: Long, partitions: Int,
    seed: Long, required: StructType, rowsPerBatch: Long)
    extends MicroBatchStream with SupportsTriggerAvailableNow {
  // Driver-side high-watermark for latestOffset. MicroBatchExecution
  // drives every mutator (latestOffset/deserializeOffset/commit/
  // planInputPartitions) from its single stream-execution thread today;
  // @volatile makes the watermark safe if the engine ever splits those
  // calls across threads (they are never concurrent, only re-threaded).
  @volatile private var reported = 0L

  override def initialOffset(): Offset = SynthDocsOffset(0L)
  override def latestOffset(): Offset = {
    reported = math.min(rows, reported + rowsPerBatch)
    SynthDocsOffset(reported)
  }
  // admission-control variant (the one the engine calls for a source
  // implementing SupportsAdmissionControl): paces from the ENGINE's start
  // offset, so a freshly-constructed instance can never regress below a
  // checkpointed position even before deserializeOffset clamps it
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val s0 = start.asInstanceOf[SynthDocsOffset].n
    reported = math.min(rows, math.max(reported, s0) + rowsPerBatch)
    SynthDocsOffset(reported)
  }
  override def prepareForTriggerAvailableNow(): Unit = reported = rows
  override def deserializeOffset(json: String): Offset = {
    val n = java.lang.Long.parseLong(json)
    reported = math.max(reported, n) // recovery: never pace below a checkpoint
    SynthDocsOffset(n)
  }
  override def commit(end: Offset): Unit =
    reported = math.max(reported, end.asInstanceOf[SynthDocsOffset].n)
  override def stop(): Unit = ()

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s0 = math.max(start.asInstanceOf[SynthDocsOffset].n, lo)
    val e0 = math.min(end.asInstanceOf[SynthDocsOffset].n - 1, hi) // excl-end offset
    reported = math.max(reported, end.asInstanceOf[SynthDocsOffset].n)
    if (s0 > e0) return Array.empty
    val span = e0 - s0 + 1
    val per = math.max(1L, (span + partitions - 1) / partitions)
    (s0 to e0 by per).map { from =>
      SynthDocsPartition(from, math.min(from + per - 1, e0), seed): InputPartition
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new SynthDocsReaderFactory(required)
}

case class SynthDocsPartition(from: Long, to: Long, seed: Long) extends InputPartition

class SynthDocsReaderFactory(required: StructType)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val sp = p.asInstanceOf[SynthDocsPartition]
    new PartitionReader[InternalRow] {
      private var id = sp.from - 1
      private val cols = required.fieldNames
      override def next(): Boolean = { id += 1; id <= sp.to }
      override def get(): InternalRow = {
        // generate ONLY the pruned columns; text is built at most once
        lazy val text = SynthDocs.textOf(id, sp.seed)
        val vals: Array[Any] = cols.map {
          case "doc_id" => id
          case "text" => UTF8String.fromString(text)
          case "lang" => UTF8String.fromString(SynthDocs.langOf(id, sp.seed))
          case "source" => UTF8String.fromString(SynthDocs.sourceOf(id))
          case "n_chars" => text.length.toLong
        }
        InternalRow.fromSeq(vals.toIndexedSeq)
      }
      override def close(): Unit = ()
    }
  }
}
