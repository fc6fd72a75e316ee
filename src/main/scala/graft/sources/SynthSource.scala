package graft.sources

import java.util
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, ReadMaxRows, SupportsTriggerAvailableNow}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** `graft-synth` — a DataSource V2 table that generates a deterministic
  * synthetic document corpus. The generalized form of the reference's
  * missing feeder (`Server.py` is an empty file — the socket stream's
  * producer was never committed): instead of an external process, the
  * corpus is a first-class Spark table with real connector behavior.
  *
  * What it demonstrates (all public `connector` API):
  *   - column pruning: `SupportsPushDownRequiredColumns` — a `SELECT
  *     doc_id` never materializes the text column at all;
  *   - filter pushdown to PARTITION PLANNING: range/equality predicates on
  *     `doc_id` narrow the generated id range before partitions are
  *     created, so a `WHERE doc_id < 100` plans partitions covering
  *     exactly [0, 100) — the DSv2 analogue of parquet row-group pruning;
  *   - micro-batch streaming (`MicroBatchStream`): the same rows served
  *     incrementally (`rowsPerBatch` per trigger) with replayable offsets,
  *     so `Trigger.AvailableNow` drains it deterministically.
  *
  * Usage:
  *   spark.read.format("graft.sources.SynthProvider")
  *        .option("rows", 1000).option("partitions", 8).load()
  *   spark.readStream.format(...).option("rowsPerBatch", 100).load()
  *
  * Scale notes: generation is embarrassingly parallel (partition = id
  * range, no shuffle, no driver materialization); `partitions` maps to
  * cluster parallelism exactly like file splits.
  */
class SynthProvider extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = SynthTable.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table = {
    val opts = new CaseInsensitiveStringMap(properties)
    new SynthTable(
      rows = opts.getLong("rows", 1000L),
      partitions = opts.getInt("partitions", 4),
      rowsPerBatch = opts.getLong("rowsPerBatch", 100L))
  }
  override def supportsExternalMetadata(): Boolean = false
}

object SynthTable {
  val schema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("text", StringType, nullable = false),
    StructField("lang", StringType, nullable = false),
    StructField("n_chars", LongType, nullable = false)))

  private val langs = Array("en", "fr", "de", "es")
  private val words = Array(
    "the", "a", "row", "data", "stream", "batch", "spark", "table",
    "window", "query", "join", "agg", "sort", "fast", "slow")

  /** Deterministic doc text for an id (same LCG style as the dedup hash
    * constants — fixed seed, engine-independent). */
  def textOf(id: Long): String = {
    var x = id * 6364136223846793005L + 1442695040888963407L
    val n = 20 + (Math.floorMod(x, 21)).toInt // 20..40 words
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < n) {
      x = x * 6364136223846793005L + 1442695040888963407L
      if (i > 0) sb.append(' ')
      sb.append(words(Math.floorMod(x >>> 16, words.length.toLong).toInt))
      i += 1
    }
    sb.toString
  }

  def langOf(id: Long): String = langs(Math.floorMod(id, langs.length.toLong).toInt)
}

class SynthTable(rows: Long, partitions: Int, rowsPerBatch: Long)
    extends Table with SupportsRead {
  override def name(): String = s"graft_synth($rows)"
  override def schema(): StructType = SynthTable.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new SynthScanBuilder(rows, partitions, rowsPerBatch)
}

class SynthScanBuilder(rows: Long, partitions: Int, rowsPerBatch: Long)
    extends ScanBuilder with SupportsPushDownRequiredColumns with SupportsPushDownFilters {

  private var required: StructType = SynthTable.schema
  private var lo: Long = 0L // inclusive
  private var hi: Long = rows // exclusive
  private var pushed: Array[Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** Accept doc_id range predicates by narrowing [lo, hi); everything else
    * stays a post-scan filter. Accepted filters need no re-evaluation, so
    * they are NOT returned as residual. */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, residual) = filters.partition {
      case EqualTo("doc_id", _: Long | _: Integer)            => true
      case GreaterThan("doc_id", _: Long | _: Integer)        => true
      case GreaterThanOrEqual("doc_id", _: Long | _: Integer) => true
      case LessThan("doc_id", _: Long | _: Integer)           => true
      case LessThanOrEqual("doc_id", _: Long | _: Integer)    => true
      case _                                                  => false
    }
    accepted.foreach {
      case EqualTo("doc_id", v)            => val x = num(v); lo = math.max(lo, x); hi = math.min(hi, x + 1)
      case GreaterThan("doc_id", v)        => lo = math.max(lo, num(v) + 1)
      case GreaterThanOrEqual("doc_id", v) => lo = math.max(lo, num(v))
      case LessThan("doc_id", v)           => hi = math.min(hi, num(v))
      case LessThanOrEqual("doc_id", v)    => hi = math.min(hi, num(v) + 1)
      case _                               => ()
    }
    pushed = accepted
    residual
  }
  private def num(v: Any): Long = v match {
    case l: Long    => l
    case i: Integer => i.toLong
    case other      => other.toString.toLong
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan =
    new SynthScan(math.max(lo, 0L), math.max(hi, math.max(lo, 0L)), partitions, rowsPerBatch, required)
}

case class SynthInputPartition(start: Long, end: Long) extends InputPartition

/** Offset for the micro-batch stream: how many rows have been served. */
case class SynthOffset(rowsServed: Long) extends Offset {
  override def json(): String = rowsServed.toString
}

class SynthScan(lo: Long, hi: Long, partitions: Int, rowsPerBatch: Long,
                required: StructType) extends Scan {
  override def readSchema(): StructType = required
  override def description(): String =
    s"graft-synth range=[$lo,$hi) cols=${required.fieldNames.mkString(",")}"

  /** The planned id range — exposed so specs can assert that pushdown
    * reached partition planning. */
  def plannedRange: (Long, Long) = (lo, hi)

  private def split(from: Long, until: Long): Array[InputPartition] = {
    val total = math.max(until - from, 0L)
    val nPart = math.max(1, math.min(partitions, total).toInt)
    (0 until nPart).map { p =>
      val s = from + total * p / nPart
      val e = from + total * (p + 1) / nPart
      SynthInputPartition(s, e)
    }.filter(p => p.asInstanceOf[SynthInputPartition].end >
                  p.asInstanceOf[SynthInputPartition].start).toArray
  }

  override def toBatch: Batch = new Batch {
    override def planInputPartitions(): Array[InputPartition] = split(lo, hi)
    override def createReaderFactory(): PartitionReaderFactory =
      new SynthReaderFactory(required)
  }

  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new MicroBatchStream with SupportsTriggerAvailableNow {
      // Admission-control variant: the next end offset is derived from the
      // ENGINE-SUPPLIED start offset (the committed position, restored from
      // the checkpoint on restart), never from instance state — a fresh
      // counter would fall behind a restored checkpoint and serve empty
      // batches until catch-up. rowsPerBatch is surfaced as the default
      // ReadLimit (the pacing knob — the analogue of the reference's
      // maxFilesPerTrigger=60, SURVEY §2.1 S1); Trigger.AvailableNow drains
      // deterministically because the engine keeps calling
      // latestOffset(start, limit) until it reaches reportLatestOffset().
      private val total = math.max(hi - lo, 0L)
      override def initialOffset(): Offset = SynthOffset(0L)
      override def getDefaultReadLimit: ReadLimit = ReadLimit.maxRows(rowsPerBatch)
      override def latestOffset(): Offset =
        throw new UnsupportedOperationException(
          "admission-control source: use latestOffset(start, limit)")
      override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
        val s = start.asInstanceOf[SynthOffset].rowsServed
        val step = limit match {
          case r: ReadMaxRows => r.maxRows()
          case _              => rowsPerBatch
        }
        SynthOffset(math.min(s + step, total))
      }
      override def reportLatestOffset(): Offset = SynthOffset(total)
      // the full corpus is statically known, so there is nothing to snapshot
      override def prepareForTriggerAvailableNow(): Unit = ()
      override def deserializeOffset(json: String): Offset = SynthOffset(json.toLong)
      override def commit(end: Offset): Unit = ()
      override def stop(): Unit = ()
      override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
        val s = lo + start.asInstanceOf[SynthOffset].rowsServed
        val e = math.min(lo + end.asInstanceOf[SynthOffset].rowsServed, hi)
        split(s, e)
      }
      override def createReaderFactory(): PartitionReaderFactory =
        new SynthReaderFactory(required)
    }
}

class SynthReaderFactory(required: StructType) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[SynthInputPartition]
    new PartitionReader[InternalRow] {
      private var id = p.start - 1
      // column generators resolved once per reader, not per row — only the
      // REQUIRED columns are ever materialized (pruned text is never built)
      private val gens: Array[Long => Any] = required.fieldNames.map {
        case "doc_id"  => (i: Long) => i
        case "text"    => (i: Long) => UTF8String.fromString(SynthTable.textOf(i))
        case "lang"    => (i: Long) => UTF8String.fromString(SynthTable.langOf(i))
        case "n_chars" => (i: Long) => SynthTable.textOf(i).length.toLong
        case other     => throw new IllegalArgumentException(s"unknown column $other")
      }
      override def next(): Boolean = { id += 1; id < p.end }
      override def get(): InternalRow =
        new GenericInternalRow(gens.map(g => g(id)).asInstanceOf[Array[Any]])
      override def close(): Unit = ()
    }
  }
}
