package graft.schemas

import org.apache.spark.sql.types._

/** The four schemas of the reference's data model (SURVEY.md §1).
  *
  * Declared once; used by the JSON parsers (batch + streaming) and the
  * test fixtures. All cites point into /root/reference/.
  */
object Schemas {

  /** Raw pmacct "purge" netflow record, the Kafka message value.
    * Reference: README.md:105 (sample record), README.md:61-67 (producer).
    * Timestamps stay strings at ingest ("yyyy-MM-dd HH:mm:ss.SSSSSS",
    * μs precision); `timestamp_end` may be a garbage epoch.
    */
  val rawNetflow: StructType = StructType(Seq(
    StructField("event_type", StringType),
    StructField("iface_in", IntegerType),
    StructField("iface_out", IntegerType),
    StructField("ip_src", StringType),
    StructField("ip_dst", StringType),
    StructField("port_src", IntegerType),
    StructField("port_dst", IntegerType),
    StructField("tcp_flags", StringType),
    StructField("ip_proto", StringType),
    StructField("tos", IntegerType),
    StructField("timestamp_start", StringType),
    StructField("timestamp_end", StringType),
    StructField("timestamp_arrival", StringType),
    StructField("packets", LongType),
    StructField("bytes", LongType),
    StructField("writer_id", StringType),
  ))

  /** Curated 9-field working record produced by the reference's mapper
    * (README.md:115-127) and persisted to kafka-netflow.netflow
    * (README.md:137-139). `protocol` ← ip_proto, `timestamp` ←
    * timestamp_start. Missing input keys become NULL (README.md:118-126).
    */
  val curatedNetflow: StructType = StructType(Seq(
    StructField("ip_src", StringType),
    StructField("ip_dst", StringType),
    StructField("event_type", StringType),
    StructField("packets", LongType),
    StructField("bytes", LongType),
    StructField("protocol", StringType),
    StructField("timestamp", StringType),
    StructField("port_src", IntegerType),
    StructField("port_dst", IntegerType),
  ))

  /** tshark-converted pcap record: 3-level nested struct whose leaf names
    * contain literal dots (README.md:259-286) — column access needs
    * backticks. All leaves are strings; frame.time_epoch is epoch seconds
    * as a string (README.md:254).
    */
  val tsharkPacket: StructType = StructType(Seq(
    StructField("_source", StructType(Seq(
      StructField("layers", StructType(Seq(
        StructField("frame", StructType(Seq(
          StructField("frame.time_epoch", StringType),
        ))),
        StructField("ip", StructType(Seq(
          StructField("ip.dst", StringType),
          StructField("ip.src", StringType),
          StructField("ip.version", StringType),
        ))),
        StructField("tcp", StructType(Seq(
          StructField("tcp.dstport", StringType),
          StructField("tcp.flags", StringType),
          StructField("tcp.srcport", StringType),
        ))),
      ))),
    ))),
  ))

  /** Daily access-trend aggregate result shape (README.md:360-367). */
  val dailyAccessTrend: StructType = StructType(Seq(
    StructField("day", StringType),
    StructField("in_bytes", LongType),
    StructField("in_packets", LongType),
    StructField("out_bytes", LongType),
    StructField("out_packets", LongType),
  ))

  /** Case-class mirror of curatedNetflow for typed Dataset tests. */
  final case class NetflowRecord(
      ip_src: String, ip_dst: String, event_type: String,
      packets: java.lang.Long, bytes: java.lang.Long, protocol: String,
      timestamp: String, port_src: java.lang.Integer,
      port_dst: java.lang.Integer)
}
