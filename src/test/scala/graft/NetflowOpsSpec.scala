package graft

import org.apache.spark.sql.functions._
import graft.operators.NetflowOps

/** Reference-parity unit tests over hand-written fixtures replicating
  * the reference's documented samples (FIXTURES.md §A).
  */
class NetflowOpsSpec extends SparkSpec {
  import spark.implicits._

  /** README.md:105's sample record, verbatim. */
  private val rawSample =
    """{"event_type": "purge", "iface_in": 0, "iface_out": 0,
      | "ip_src": "192.168.178.80", "ip_dst": "192.168.178.1",
      | "port_src": 22, "port_dst": 58608, "tcp_flags": "24",
      | "ip_proto": "tcp", "tos": 18,
      | "timestamp_start": "2019-11-11 06:18:00.043547",
      | "timestamp_end": "1969-12-31 16:00:00.000000",
      | "timestamp_arrival": "2019-11-11 06:18:00.043547",
      | "packets": 1, "bytes": 168, "writer_id": "default_kafka/9190"}""".stripMargin.replace("\n", "")

  test("P2: parse + 9-field projection with rename") {
    val df = NetflowOps.parseRawNetflow(Seq(rawSample).toDF("value"))
    val r = df.collect().head
    assert(r.getAs[String]("protocol") == "tcp") // ip_proto renamed
    assert(r.getAs[String]("timestamp") == "2019-11-11 06:18:00.043547") // timestamp_start renamed
    assert(r.getAs[Long]("bytes") == 168L)
    assert(r.getAs[Int]("port_dst") == 58608)
  }

  test("P2: missing keys become NULL (dict .get semantics, README.md:118-126)") {
    val df = NetflowOps.parseRawNetflow(Seq("""{"ip_src": "1.2.3.4", "bytes": 10}""").toDF("value"))
    val r = df.collect().head
    assert(r.getAs[String]("ip_src") == "1.2.3.4")
    assert(r.isNullAt(r.fieldIndex("ip_dst")))
    assert(r.isNullAt(r.fieldIndex("protocol")))
    assert(r.getAs[Long]("bytes") == 10L)
  }

  test("P2: corrupt JSON yields an all-NULL record, not a failure") {
    val df = NetflowOps.parseRawNetflow(Seq("{not valid json!", "").toDF("value"))
    val rows = df.collect()
    assert(rows.length == 2)
    rows.foreach(r => (0 until r.length).foreach(i => assert(r.isNullAt(i))))
  }

  test("P3+P4: nested tshark extraction with dotted leaves + epoch conversion") {
    val tsharkJson =
      """{"_source": {"layers": {
        | "frame": {"frame.time_epoch": "1573538280.5"},
        | "ip": {"ip.dst": "10.0.0.2", "ip.src": "10.0.0.1", "ip.version": "4"},
        | "tcp": {"tcp.dstport": "443", "tcp.flags": "0x18", "tcp.srcport": "51000"}}}}""".stripMargin.replace("\n", "")
    val raw = spark.read.schema(graft.schemas.Schemas.tsharkPacket).json(Seq(tsharkJson).toDS)
    val flat = NetflowOps
      .extractTsharkLeaves(raw)
      .withColumn("datetime", NetflowOps.epochStringToTimestamp(col("timestamp")))
    val r = flat.collect().head
    assert(r.getAs[String]("ip_dst") == "10.0.0.2")
    assert(r.getAs[String]("tcp_srcport") == "51000")
    assert(r.getAs[java.sql.Timestamp]("datetime").getTime == 1573538280500L)
  }

  test("P5: lexicographic range keeps '2019-11-15 00:00:00' out (string compare)") {
    val rows = Seq(
      ("2019-11-04 23:59:59.999999", 1L),
      ("2019-11-05 00:00:00.000000", 2L),
      ("2019-11-14 23:59:59.000000", 3L),
      ("2019-11-15 00:00:00.000001", 4L), // > '2019-11-15' lexicographically
    ).toDF("timestamp", "bytes")
    val kept = rows
      .filter(NetflowOps.rangeFilter(col("timestamp"), "2019-11-05", "2019-11-15"))
      .select("bytes").as[Long].collect().toSet
    assert(kept == Set(2L, 3L)) // 1 below lo; 4 excluded by the string compare quirk
  }

  test("P5 pushdown rewrite: native-timestamp bounds equal the string compare at the midnight boundary") {
    import java.sql.Timestamp
    val rows = Seq(
      Timestamp.valueOf("2019-11-04 23:59:59.999999"),
      Timestamp.valueOf("2019-11-05 00:00:00.0"), // lo midnight: included by both forms
      Timestamp.valueOf("2019-11-14 23:59:59.999999"),
      Timestamp.valueOf("2019-11-15 00:00:00.0"), // hi midnight: EXCLUDED by both forms
    ).toDF("ts").withColumn("ts", col("ts").cast("timestamp_ntz"))
    val viaString = rows
      .filter(NetflowOps.rangeFilter(
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS"), "2019-11-05", "2019-11-15"))
      .collect().map(_.getAs[java.time.LocalDateTime](0)).toSet
    val viaPushdown = rows
      .filter(NetflowOps.rangeFilterPushdown(col("ts"), "2019-11-05", "2019-11-15"))
      .collect().map(_.getAs[java.time.LocalDateTime](0)).toSet
    assert(viaString == viaPushdown)
    assert(viaPushdown.size == 2)
  }

  test("A1/A2: access trend on the documented stored-record shape") {
    val host = "192.168.178.80"
    val rows = Seq(
      // (ip_src, ip_dst, bytes, packets, timestamp)
      ("192.168.178.1", host, 52L, 1L, "2019-11-07 06:08:21.807555"), // in
      (host, "192.168.178.1", 168L, 2L, "2019-11-07 06:18:00.043547"), // out
      ("10.0.0.1", "10.0.0.2", 999L, 9L, "2019-11-07 07:00:00.000000"), // neither
      ("192.168.178.1", host, 100L, 1L, "2019-11-08 00:00:00.000000"), // in, next day
      (host, "192.168.178.1", 7L, 1L, "2019-11-20 00:00:00.000000"), // outside range
    ).toDF("ip_src", "ip_dst", "bytes", "packets", "timestamp")
    val out = NetflowOps
      .accessTrend(rows, host, "2019-11-05", "2019-11-15")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(out.toSeq == Seq(
      ("2019-11-07", 52L, 1L, 168L, 2L),
      ("2019-11-08", 100L, 1L, 0L, 0L),
    ))
  }

  test("P11: CIDR prefix match (the reference's inactive BPF capture filter)") {
    val ips = Seq("10.0.1.5", "10.0.255.255", "10.1.0.0", "192.168.178.80", "10.0.0.0")
      .toDF("ip")
    val in16 = ips.filter(NetflowOps.cidrMatch(col("ip"), "10.0.0.0/16"))
      .as[String].collect().toSet
    assert(in16 == Set("10.0.1.5", "10.0.255.255", "10.0.0.0"))
    val in32 = ips.filter(NetflowOps.cidrMatch(col("ip"), "192.168.178.80/32"))
      .as[String].collect().toSet
    assert(in32 == Set("192.168.178.80"))
    assert(ips.filter(NetflowOps.cidrMatch(col("ip"), "0.0.0.0/0")).count() == 5)
    // Malformed data never matches; malformed CIDR args fail fast.
    val bad = Seq("10.0.0.5.7", "10.0.300.1", "not-an-ip", "10.0.1").toDF("ip")
    assert(bad.filter(NetflowOps.cidrMatch(col("ip"), "10.0.0.0/8")).count() == 0)
    intercept[IllegalArgumentException](NetflowOps.cidrMatch(col("ip"), "10.0.0.0"))
    intercept[IllegalArgumentException](NetflowOps.cidrMatch(col("ip"), "10.0.0.0/33"))
    intercept[IllegalArgumentException](NetflowOps.cidrMatch(col("ip"), "9.256.0.0/16"))
  }

  test("fan-out profile: distinct-port scan flag fires at the threshold, not below") {
    // scanner hits 4 distinct ports (one twice); quiet host hits 2.
    val flows = Seq(
      ("2024-01-01", "10.0.0.1", "h1", 80), ("2024-01-01", "10.0.0.1", "h2", 81),
      ("2024-01-01", "10.0.0.1", "h1", 82), ("2024-01-01", "10.0.0.1", "h3", 83),
      ("2024-01-01", "10.0.0.1", "h1", 80),
      ("2024-01-01", "10.0.0.2", "h1", 80), ("2024-01-01", "10.0.0.2", "h1", 443),
    ).toDF("day", "ip_src", "ip_dst", "port_dst")
    val out = NetflowOps.fanOutProfile(flows, scanThreshold = 4).collect()
    assert(out.length == 2)
    val scanner = out.find(_.getAs[String]("ip_src") == "10.0.0.1").get
    assert(scanner.getAs[Long]("n_flows") == 5L)
    assert(scanner.getAs[Long]("n_ports") == 4L)
    assert(scanner.getAs[Long]("n_hosts") == 3L)
    assert(scanner.getAs[Boolean]("is_scan"))
    val quiet = out.find(_.getAs[String]("ip_src") == "10.0.0.2").get
    assert(quiet.getAs[Long]("n_ports") == 2L && !quiet.getAs[Boolean]("is_scan"))
  }

  test("beacon profile: regular gaps flag, jittered gaps don't, integer moments exact") {
    def at(s: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 00:${s / 60}%02d:${s % 60}%02d")
    // beacon: exactly 10 s apart ×6 → 5 gaps, cv = 0. noisy: wildly
    // irregular. single: one flow, no gaps → NULL moments, flag false.
    val flows =
      ((0 until 6).map(i => (i.toLong, "b", "c2", at(10 * i))) ++
        Seq(0, 5, 300, 330, 2000, 2004).zipWithIndex.map { case (s, i) =>
          (100L + i, "n", "c2", at(s))
        } ++
        Seq((200L, "s", "c2", at(0)))).toDF("id", "ip_src", "ip_dst", "ts")
    val out = NetflowOps.beaconProfile(flows, minGaps = 5, cvInv = 5)
      .collect().map(r => r.getAs[String]("ip_src") -> r).toMap
    val b = out("b")
    assert(b.getAs[Long]("n_gaps") == 5L)
    assert(b.getAs[Long]("min_gap_s") == 10L && b.getAs[Long]("max_gap_s") == 10L)
    assert(b.getAs[Long]("sum_gap_s") == 50L && b.getAs[Long]("sum_gap2_s") == 500L)
    assert(b.getAs[Boolean]("is_beacon"))
    assert(!out("n").getAs[Boolean]("is_beacon"))
    val s = out("s")
    assert(s.getAs[Long]("n_flows") == 1L && s.getAs[Long]("n_gaps") == 0L)
    assert(s.isNullAt(s.fieldIndex("sum_gap_s")))
    assert(!s.getAs[Boolean]("is_beacon"))
  }

  test("binned flow stitch is row-identical to the plain interval join") {
    def at(s: String) = java.sql.Timestamp.valueOf(s)
    val flows = Seq(
      // request/response pair inside the window, crossing a bin boundary
      (1L, "a", "b", 10, 20, at("2024-01-01 00:59:30")),
      (2L, "b", "a", 20, 10, at("2024-01-01 01:00:10")),
      // response exactly AT the window bound (inclusive)
      (3L, "c", "d", 1, 2, at("2024-01-01 02:00:00")),
      (4L, "d", "c", 2, 1, at("2024-01-01 03:00:00")),
      // response past the window — must not pair
      (5L, "e", "f", 3, 4, at("2024-01-01 04:00:00")),
      (6L, "f", "e", 4, 3, at("2024-01-01 05:00:01")),
      // equal-timestamp exchange — exactly one orientation survives
      (7L, "g", "h", 5, 6, at("2024-01-01 06:00:00")),
      (8L, "h", "g", 6, 5, at("2024-01-01 06:00:00")),
      // loopback flow — must not self-pair
      (9L, "i", "i", 7, 7, at("2024-01-01 07:00:00")),
    ).toDF("id", "ip_src", "ip_dst", "port_src", "port_dst", "ts")
    def pairs(binned: Option[Long]) = NetflowOps
      .stitchBidirectional(flows, "1 hour", binSeconds = binned)
      .select("f_id", "r_id").as[(Long, Long)].collect().toSet
    val plain = pairs(None)
    assert(plain == Set((1L, 2L), (3L, 4L), (7L, 8L)))
    assert(pairs(Some(3600L)) == plain)
    // A narrower-than-window bin (wider fan-out) must change nothing.
    assert(pairs(Some(600L)) == plain)
    intercept[IllegalArgumentException](
      NetflowOps.stitchBidirectional(flows, "1 hour", "left_outer", Some(3600L)))
  }

  test("P10+P9: heartbeat filter drops the literal topic name; tick projects {time, bytes}") {
    val msgs = Seq("realTimeChart", """{"x":1}""").toDF("value")
    assert(NetflowOps.heartbeatFilter(msgs, "realTimeChart").count() == 1)
    val tick = NetflowOps
      .tick(Seq(("2019-11-11 06:18:00.043547", 168L)).toDF("timestamp_arrival", "bytes"))
      .collect().head
    assert(tick.getString(0) == "06:18:00")
    assert(tick.getLong(1) == 168L)
  }

  test("ewmaSpikes: integer α=1/8 recursion in event order, spike = value > 2×baseline") {
    import graft.operators.EventOps
    val events = Seq(
      // user 7 in ts order: 1.00, 1.00, 50.00, 1.00
      (1L, "2024-01-01 00:00:01", 7L, 1.00),
      (2L, "2024-01-01 00:00:02", 7L, 1.00),
      (3L, "2024-01-01 00:00:03", 7L, 50.00),
      (4L, "2024-01-01 00:00:04", 7L, 1.00),
    ).toDF("event_id", "ts", "user_id", "value")
      .withColumn("ts", col("ts").cast("timestamp_ntz"))
    val r = EventOps.ewmaSpikes(events).as[(Long, Long, Long, Long)].collect().toSeq
    // cents: 100, 100, 5000, 100. ewma: 100 → (100+700)/8=100 →
    // (5000+700)/8=712 → (100+712*7)/8=635. Spikes: 5000 > 2*100 only.
    assert(r == Seq((7L, 4L, 635L, 1L)))
  }

  test("maxConcurrent: sweep-line peak; touching intervals do not overlap (half-open)") {
    import graft.operators.EventOps
    val events = Seq(
      // type A: [0,3), [1,4), [2,5) → peak 3 open at t=2.
      (1L, "2024-01-01 00:00:00", 1L, "A", 2.0),
      (2L, "2024-01-01 00:00:01", 1L, "A", 2.0),
      (3L, "2024-01-01 00:00:02", 1L, "A", 2.0),
      // type B: [0,1) then [1,2): end at t=1 closes before the start
      // at t=1 opens → peak stays 1.
      (4L, "2024-01-01 00:00:00", 2L, "B", 0.0),
      (5L, "2024-01-01 00:00:01", 2L, "B", 0.0),
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
      .withColumn("ts", col("ts").cast("timestamp_ntz"))
    val r = EventOps.maxConcurrent(events).as[(String, Long)].collect().toSeq
    assert(r == Seq(("A", 3L), ("B", 1L)))
  }

  test("madOutliers: lower-median selection, MAD threshold immune to the outlier itself") {
    import graft.operators.EventOps
    // values 1,2,3,4,1000: lower median = 3 (position ⌊6/2⌋ = 3 of 5).
    // devs = 2,1,0,1,997 → sorted 0,1,1,2,997 → MAD = 1 (position 3).
    // Outliers: dev > 3 → only 1000 (the z-score path would have its σ
    // blown up by the same point).
    val events = (1L to 5L)
      .map(i => (i, "2024-01-01 00:00:0" + i, 1L, "A", if (i == 5) 1000.0 else i.toDouble))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .withColumn("ts", col("ts").cast("timestamp_ntz"))
    val r = EventOps.madOutliers(events).as[(String, Long, Double, Double, Long)].collect().toSeq
    assert(r == Seq(("A", 5L, 3.0, 1.0, 1L)))
  }

  test("lpmEnrich handles the /0 default route: catch-all mask, overridden by any longer match") {
    val dim = Seq(
      ("0.0.0.0", 0, "default"), // mask 0 — matches every well-formed ip
      ("10.0.0.0", 8, "net10"),
    ).toDF("prefix_ip", "prefix_len", "tag")
    val flows = Seq((1L, "10.1.2.3"), (2L, "203.0.113.9"), (3L, "oops")).toDF("id", "ip")
    val r = NetflowOps.lpmEnrich(flows, dim)
      .as[(Long, String, Option[String], Option[Int], Option[String])].collect().toSet
    assert(r == Set(
      (1L, "10.1.2.3", Some("10.0.0.0"), Some(8), Some("net10")), // /8 beats default
      (2L, "203.0.113.9", Some("0.0.0.0"), Some(0), Some("default")),
      (3L, "oops", None, None, None), // malformed never matches, even the default
    ))
  }

  test("lpmEnrich rejects output-column collisions and unkeyed dimensions at plan construction") {
    val dim = Seq(("10.0.0.0", 8, "net10")).toDF("prefix_ip", "prefix_len", "tag")
    // A flow frame already carrying `tag` (common in netflow schemas)
    // would end up with two ambiguous `tag` columns — refuse it.
    val taggedFlows = Seq((1L, "10.1.2.3", "pre")).toDF("id", "ip", "tag")
    val e1 = intercept[IllegalArgumentException](NetflowOps.lpmEnrich(taggedFlows, dim))
    assert(e1.getMessage.contains("tag"))
    // Two dimension rows for the same (prefix_len, masked network) —
    // 10.0.0.0/8 and 10.9.9.9/8 mask to the same network — would
    // silently multiply flow rows through the chained left joins.
    val dupDim = Seq(("10.0.0.0", 8, "a"), ("10.9.9.9", 8, "b"))
      .toDF("prefix_ip", "prefix_len", "tag")
    val flows = Seq((1L, "10.1.2.3")).toDF("id", "ip")
    val e2 = intercept[IllegalArgumentException](NetflowOps.lpmEnrich(flows, dupDim))
    assert(e2.getMessage.contains("keyed"))
    // Distinct networks at one length remain legal.
    val okDim = Seq(("10.0.0.0", 8, "a"), ("11.0.0.0", 8, "b"))
      .toDF("prefix_ip", "prefix_len", "tag")
    assert(NetflowOps.lpmEnrich(flows, okDim).count() == 1)
  }
}
