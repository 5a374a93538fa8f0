package graft.sources

import java.time.LocalDateTime
import java.time.format.DateTimeFormatter
import java.util.{Map => JMap}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2: a deterministic pmacct-style flow-record generator —
  * batch AND micro-batch streaming reads of the reference's input data
  * model (the purge record of `/root/reference/README.md:105`) without
  * needing the Kafka broker this sandbox lacks. Every field of row `i`
  * is a pure function of (seed, i), so batch and streaming reads of the
  * same options produce the SAME multiset of rows, re-runs are
  * bit-identical, and tests can assert exact content — the property the
  * engine's deterministic-sampling operators rely on, applied to a
  * source.
  *
  * Demonstrates the full DSv2 surface the engine's scale story needs:
  * range-split input partitions (parallelism = `numPartitions`, no
  * driver materialization), column pruning pushed into the reader
  * (`SupportsPushDownRequiredColumns` — unprojected fields are never
  * generated), and offset-tracked micro-batches (`rowsPerBatch` rows per
  * trigger, exactly-once across restarts because partition planning is a
  * pure function of the offset range).
  *
  * Usage: `spark.read.format(classOf[FlowGen].getName)
  * .option("rows", 1000).option("seed", 42).load()`, or `readStream`
  * with `rowsPerBatch`.
  */
class FlowGen extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    if (options.getOrDefault("emit", "struct") == "json") FlowGen.JsonSchema else FlowGen.Schema
  // Spark hands getTable the ORIGINAL-case option keys
  // (CaseInsensitiveStringMap.asCaseSensitiveMap), so normalize here —
  // otherwise a camelCase `.option("rowsPerBatch", …)` silently misses
  // the lowercase lookup and the stream falls back to 100-row batches
  // (2,000 microbatches for a 200k-row drain: pure per-batch planning
  // overhead).
  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: JMap[String, String],
  ): Table = new FlowGenTable(properties.asScala.map { case (k, v) => k.toLowerCase -> v }.toMap)
}

object FlowGen {
  val Schema: StructType = StructType(Seq(
    StructField("ip_src", StringType, nullable = false),
    StructField("ip_dst", StringType, nullable = false),
    StructField("port_src", IntegerType, nullable = false),
    StructField("port_dst", IntegerType, nullable = false),
    StructField("ip_proto", StringType, nullable = false),
    StructField("tcp_flags", StringType, nullable = false),
    StructField("packets", LongType, nullable = false),
    StructField("bytes", LongType, nullable = false),
    StructField("timestamp_start", StringType, nullable = false),
  ))

  private val Protos = Array("tcp", "udp", "icmp")
  private val Flags = Array("24", "16", "2", "17")
  private val Base = LocalDateTime.of(2019, 11, 11, 6, 18, 0)
  private val Fmt = DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss")

  /** SplitMix64 — the standard avalanche mix; pure in (seed, i). */
  private def mix(seed: Long, i: Long): Long = {
    var z = seed + i * 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Field `name` of row `i` — generated on demand so pruned columns
    * cost nothing.
    */
  def field(name: String, seed: Long, i: Long): Any = {
    val h = mix(seed, i)
    name match {
      case "ip_src" =>
        UTF8String.fromString(s"10.${(h & 0xff)}.${(h >>> 8) & 0xff}.${(h >>> 16) & 0xff}")
      case "ip_dst" =>
        UTF8String.fromString(s"192.168.${(h >>> 24) & 0xff}.${(h >>> 32) & 0xff}")
      case "port_src" => (1024 + ((h >>> 40) & 0x7fff)).toInt
      case "port_dst" => Array(22, 80, 443, 8080)(((h >>> 55) & 0x3).toInt)
      case "ip_proto" => UTF8String.fromString(Protos(((h >>> 57) & 0x7fffffff).toInt % 3))
      case "tcp_flags" => UTF8String.fromString(Flags(((h >>> 59) & 0x3).toInt))
      case "packets" => 1L + (java.lang.Long.remainderUnsigned(h, 64L))
      case "bytes" => 64L + (java.lang.Long.remainderUnsigned(h >>> 6, 1400L))
      case "timestamp_start" =>
        // One flow every 100 ms, micros jitter from the hash — renders
        // like the reference's "2019-11-11 06:18:00.043547".
        val micros = java.lang.Long.remainderUnsigned(h, 100000L)
        val t = Base.plusNanos(i * 100000000L + micros * 1000L)
        UTF8String.fromString(
          t.format(Fmt) + f".${t.getNano / 1000}%06d",
        )
      case "value" => jsonValue(seed, i)
      case other => throw new IllegalArgumentException(s"unknown column $other")
    }
  }

  /** `emit=json` schema: the Kafka-value shape (`value: string`) the
    * reference's pipeline starts from (README.md:110).
    */
  val JsonSchema: StructType = StructType(Seq(
    StructField("value", StringType, nullable = false),
  ))

  /** Row `i` rendered as the raw pmacct purge JSON (README.md:105) —
    * the same deterministic fields, serialized, so the full parse
    * pipeline (P1 value extraction → P2 from_json projection) runs
    * end-to-end against this source exactly as it would against Kafka.
    */
  def jsonValue(seed: Long, i: Long): UTF8String = {
    def s(name: String) = field(name, seed, i).asInstanceOf[UTF8String].toString
    def n(name: String) = field(name, seed, i)
    UTF8String.fromString(
      s"""{"event_type":"purge","ip_src":"${s("ip_src")}","ip_dst":"${s("ip_dst")}",""" +
        s""""port_src":${n("port_src")},"port_dst":${n("port_dst")},""" +
        s""""tcp_flags":"${s("tcp_flags")}","ip_proto":"${s("ip_proto")}",""" +
        s""""timestamp_start":"${s("timestamp_start")}",""" +
        s""""timestamp_arrival":"${s("timestamp_start")}",""" +
        s""""packets":${n("packets")},"bytes":${n("bytes")}}""",
    )
  }
}

private[sources] class FlowGenTable(props: Map[String, String])
    extends Table with SupportsRead {
  private val rows = props.getOrElse("rows", "1000").toLong
  private val numPartitions = props.getOrElse("numpartitions", "4").toInt
  private val seed = props.getOrElse("seed", "42").toLong
  private val rowsPerBatch = props.getOrElse("rowsperbatch", "100").toLong
  private val emitJson = props.getOrElse("emit", "struct") == "json"

  override def name(): String = s"flowgen(rows=$rows, seed=$seed)"
  override def schema(): StructType = if (emitJson) FlowGen.JsonSchema else FlowGen.Schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new FlowGenScanBuilder(rows, numPartitions, seed, rowsPerBatch, schema())
}

private[sources] class FlowGenScanBuilder(
    rows: Long,
    numPartitions: Int,
    seed: Long,
    rowsPerBatch: Long,
    full: StructType,
) extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = full
  override def pruneColumns(requiredSchema: StructType): Unit = required = requiredSchema
  override def build(): Scan = new FlowGenScan(rows, numPartitions, seed, rowsPerBatch, required)
}

private[sources] case class FlowGenRange(start: Long, end: Long) extends InputPartition

private[sources] class FlowGenScan(
    rows: Long,
    numPartitions: Int,
    seed: Long,
    rowsPerBatch: Long,
    required: StructType,
) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def description(): String =
    s"flowgen rows=$rows cols=${required.fieldNames.mkString(",")}"
  override def toBatch: Batch = this

  private def split(start: Long, end: Long): Array[InputPartition] = {
    val n = math.max(1, numPartitions)
    val total = end - start
    (0 until n).map { p =>
      FlowGenRange(start + total * p / n, start + total * (p + 1) / n)
    }.filter(r => r.end > r.start).toArray[InputPartition]
  }

  override def planInputPartitions(): Array[InputPartition] = split(0L, rows)
  override def createReaderFactory(): PartitionReaderFactory =
    new FlowGenReaderFactory(seed, required.fieldNames)

  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new FlowGenStream(rows, seed, rowsPerBatch, required.fieldNames, split)
}

/** Admission-controlled micro-batch stream: `latestOffset(start, limit)`
  * is a pure function of the start offset (no mutable position), so
  * restarts resume exactly from the checkpoint, and
  * `SupportsTriggerAvailableNow` lets `Trigger.AvailableNow` drain the
  * source in `rowsPerBatch` slices — including the trailing no-data
  * batch that flushes watermark-closed stateful results — instead of
  * the wrapper's single snapshot batch.
  */
private[sources] class FlowGenStream(
    rows: Long,
    seed: Long,
    rowsPerBatch: Long,
    cols: Array[String],
    split: (Long, Long) => Array[InputPartition],
) extends MicroBatchStream
    with streaming.SupportsTriggerAvailableNow {
  override def prepareForTriggerAvailableNow(): Unit = () // target is always `rows`
  override def getDefaultReadLimit: streaming.ReadLimit =
    streaming.ReadLimit.maxRows(rowsPerBatch)
  override def initialOffset(): Offset = FlowGenOffset(0L)
  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "admission-controlled source: latestOffset(start, limit) is called instead",
    )
  override def latestOffset(start: Offset, limit: streaming.ReadLimit): Offset = {
    val s = start.asInstanceOf[FlowGenOffset].n
    val step = limit match {
      case m: streaming.ReadMaxRows => m.maxRows()
      case _ => rowsPerBatch
    }
    FlowGenOffset(math.min(s + step, rows))
  }
  override def reportLatestOffset(): Offset = FlowGenOffset(rows)
  override def deserializeOffset(json: String): Offset = FlowGenOffset(json.trim.toLong)
  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] =
    split(start.asInstanceOf[FlowGenOffset].n, end.asInstanceOf[FlowGenOffset].n)
  override def createReaderFactory(): PartitionReaderFactory =
    new FlowGenReaderFactory(seed, cols)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

private[sources] case class FlowGenOffset(n: Long) extends Offset {
  override def json(): String = n.toString
}

private[sources] class FlowGenReaderFactory(seed: Long, cols: Array[String])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val r = partition.asInstanceOf[FlowGenRange]
    new PartitionReader[InternalRow] {
      private var i = r.start - 1
      override def next(): Boolean = { i += 1; i < r.end }
      override def get(): InternalRow =
        new GenericInternalRow(cols.map(c => FlowGen.field(c, seed, i)).toArray[Any])
      override def close(): Unit = ()
    }
  }
}
