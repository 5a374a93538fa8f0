package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.schemas.Schemas

/** Reference-parity netflow operators (SURVEY.md §2), each a pure
  * `DataFrame => DataFrame` so the same transform serves batch and
  * Structured Streaming (the reference's own unification argument,
  * README.md:192-193).
  *
  * Everything here is declarative Column algebra — no UDFs, no RDDs —
  * so Catalyst keeps predicate pushdown / column pruning / whole-stage
  * codegen on every path.
  */
object NetflowOps {

  /** P1 — Kafka value extraction (README.md:110): drop the key, keep the
    * value as UTF-8 text. Input is a Kafka-shaped frame (`value: binary`).
    */
  def kafkaValue(df: DataFrame): DataFrame =
    df.selectExpr("CAST(value AS STRING) AS value")

  /** P2 — JSON parse + 9-field projection/rename (README.md:115-127):
    * `ip_proto`→`protocol`, `timestamp_start`→`timestamp`; missing keys
    * become NULL exactly like the reference's dict `.get`.
    */
  def parseRawNetflow(df: DataFrame): DataFrame =
    df.select(from_json(col("value"), Schemas.rawNetflow).as("r"))
      .select(
        col("r.ip_src").as("ip_src"),
        col("r.ip_dst").as("ip_dst"),
        col("r.event_type").as("event_type"),
        col("r.packets").as("packets"),
        col("r.bytes").as("bytes"),
        col("r.ip_proto").as("protocol"),
        col("r.timestamp_start").as("timestamp"),
        col("r.port_src").as("port_src"),
        col("r.port_dst").as("port_dst"),
        col("r.timestamp_arrival").as("timestamp_arrival"),
      )

  /** P3 — nested tshark leaf extraction (README.md:259-268). Field names
    * contain literal dots, hence the backticks. Output: 7 flat nullable
    * string columns (README.md:274-286).
    */
  def extractTsharkLeaves(df: DataFrame): DataFrame =
    df.select(
      col("_source.layers.ip.`ip.dst`").as("ip_dst"),
      col("_source.layers.ip.`ip.src`").as("ip_src"),
      col("_source.layers.ip.`ip.version`").as("ip_ver"),
      col("_source.layers.frame.`frame.time_epoch`").as("timestamp"),
      col("_source.layers.tcp.`tcp.dstport`").as("tcp_dstport"),
      col("_source.layers.tcp.`tcp.flags`").as("tcp_flags"),
      col("_source.layers.tcp.`tcp.srcport`").as("tcp_srcport"),
    )

  /** P4 — epoch-seconds-string → timestamp. The reference used a Python
    * UDF with a pseudocode body (README.md:250-254); the evident intent is
    * this conversion, which Spark expresses codegen-natively — no UDF.
    */
  def epochStringToTimestamp(c: Column): Column =
    timestamp_micros((c.cast("double") * 1000000L).cast("long"))

  /** P5 — inclusive range filter on the *string* timestamp
    * (accessTrend.ts:11-17): lexicographic compare on
    * "yyyy-MM-dd HH:mm:ss.SSSSSS", so `<= '2019-11-15'` excludes almost
    * all of Nov 15 — preserved exactly.
    */
  def rangeFilter(tsCol: Column, lo: String, hi: String): Column =
    tsCol >= lit(lo) && tsCol <= lit(hi)

  /** P5 rewritten for pushdown over a NATIVE timestamp column. For
    * date-only bounds the lexicographic predicate is exactly
    * `ts >= lo 00:00:00 AND ts < hi 00:00:00`: every real timestamp
    * string strictly extends its date prefix, so it compares greater
    * than the bare `hi` date — day `hi` (midnight included) is excluded
    * by both forms, and day `lo` midnight is included by both. Unlike
    * the `date_format` string compare this is a single native compare
    * per row, and on a table whose event time is stored as a native
    * timestamp it reaches the parquet scan as a PushedFilter (row-group
    * pruning at 100 TB; the test `events` table stores ns-longs, so
    * there it "only" removes the per-row string formatting).
    */
  def rangeFilterPushdown(tsCol: Column, lo: String, hi: String): Column =
    tsCol >= lit(lo).cast("timestamp_ntz") && tsCol < lit(hi).cast("timestamp_ntz")

  /** P6 — day extraction: first 10 chars of the string timestamp
    * (accessTrend.ts:19-24). Spark substring is 1-based.
    */
  def day(tsCol: Column): Column = substring(tsCol, 1, 10)

  /** P8 — time-of-day: chars [11,19) of the string timestamp →
    * "HH:MM:SS" (websocket-server/index.js:44).
    */
  def timeOfDay(tsCol: Column): Column = substring(tsCol, 12, 8)

  /** P7 — conditional flow-direction projection relative to a host
    * (accessTrend.ts:25-68): traffic INTO the host counts when the host
    * is the destination, OUT when it is the source; all else 0.
    */
  def directionSplit(df: DataFrame, host: String): DataFrame =
    df.select(
      day(col("timestamp")).as("day"),
      when(col("ip_dst") === lit(host), col("bytes")).otherwise(0L).as("in_bytes"),
      when(col("ip_dst") === lit(host), col("packets")).otherwise(0L).as("in_packets"),
      when(col("ip_src") === lit(host), col("bytes")).otherwise(0L).as("out_bytes"),
      when(col("ip_src") === lit(host), col("packets")).otherwise(0L).as("out_packets"),
    )

  /** Valid dotted-quad IPv4 (octets 0-255, exactly four). */
  private val Ipv4Pattern =
    "^((25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[0-9][0-9]?)\\.){3}(25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[0-9][0-9]?)$"

  /** IPv4 dotted-quad string → 32-bit value. Precondition: the input
    * matches [[Ipv4Pattern]] (malformed strings fold to garbage —
    * callers guard, as [[cidrMatch]] does).
    */
  def ipv4ToLong(ip: Column): Column =
    aggregate(split(ip, "\\."), lit(0L), (acc, part) => acc * 256 + part.cast("long"))

  /** P11 — the reference's commented-out BPF capture pre-filter
    * (`# pcap_filter: src net 10.0.0.0/16`, README.md:58-59), as a
    * proper CIDR prefix match: mask both sides to the network bits.
    * Malformed ip strings never match (well-formedness guard on the data
    * path); malformed `cidr` arguments fail fast at plan construction.
    * Inactive in the reference; provided for capture-filter parity.
    */
  def cidrMatch(ip: Column, cidr: String): Column = {
    val (base, bits) = cidr.split("/") match {
      case Array(b, n) if n.forall(_.isDigit) && n.nonEmpty => (b, n.toInt)
      case _ => throw new IllegalArgumentException(s"bad CIDR '$cidr' (want a.b.c.d/len)")
    }
    require(bits >= 0 && bits <= 32, s"bad prefix length in '$cidr'")
    require(base.matches(Ipv4Pattern), s"bad network address in '$cidr'")
    // Long shifts use the amount mod 64, so bits == 0 yields mask 0
    // through the same expression — no special case needed.
    val mask = (0xFFFFFFFFL << (32 - bits)) & 0xFFFFFFFFL
    val baseLong = base.split("\\.").foldLeft(0L)((acc, p) => acc * 256 + p.toLong)
    ip.rlike(Ipv4Pattern) && ipv4ToLong(ip).bitwiseAND(mask) === lit(baseLong & mask)
  }

  /** Longest-prefix-match enrichment — the route-table / threat-feed
    * join every netflow pipeline runs at scale: each flow's `ip` is
    * matched to the MOST SPECIFIC covering prefix in a
    * `(prefix_ip, prefix_len, tag)` dimension table (contract: one row
    * per (prefix_len, masked network) — a keyed route table).
    *
    * Shape chosen for 100 TB: the distinct prefix LENGTHS are read once
    * (≤ 33 rows — dimension metadata, the same bounded scalar read as
    * the convergence checks) and the probe becomes one chained
    * BROADCAST left equi-join per length on the masked address,
    * most-specific winner picked by coalesce in descending-length
    * order — the flow table is never shuffled, never exploded, and
    * route tables (≤ millions of rows) broadcast comfortably; lengths
    * absent from the dimension cost nothing. Malformed ip strings
    * (non-dotted-quad) take a NULL key and match nothing. Output = the
    * flow columns + (match_prefix, match_len, tag), NULLs when no
    * prefix covers the flow.
    *
    * Both contract halves are ENFORCED at plan construction, not just
    * documented: the output columns must not collide with existing flow
    * columns (netflow frames commonly carry their own `tag`; a silent
    * duplicate would make every downstream `col("tag")` ambiguous), and
    * the dimension must hold one row per (prefix_len, masked network) —
    * duplicates would silently multiply flow rows through the chained
    * left joins. The uniqueness probe is one aggregation over the
    * dimension (route-table sized — the same bounded read as the
    * length-list collect), paid once per plan build, never per flow.
    */
  def lpmEnrich(flows: DataFrame, prefixes: DataFrame): DataFrame = {
    val collisions = flows.columns.toSet
      .intersect(Set("match_prefix", "match_len", "tag"))
    require(
      collisions.isEmpty,
      s"lpmEnrich output columns collide with flow columns: ${collisions.mkString(", ")} — rename them on the flow side first",
    )
    val lens = prefixes.select(col("prefix_len").cast("int"))
      .distinct().collect().map(_.getInt(0)).sorted.reverse.toSeq
    require(lens.forall(l => l >= 0 && l <= 32), "prefix_len must be in 0..32")
    // Malformed prefix_ip strings parse to a NULL network and can never
    // match any flow — excluding them keeps two invalid rows at the same
    // length from being misreported as a duplicate network.
    val dupNets = prefixes
      .select(
        col("prefix_len"),
        ipv4ToLong(col("prefix_ip"))
          .bitwiseAND(
            call_function("shiftleft", lit(0xFFFFFFFFL), lit(32) - col("prefix_len").cast("int"))
              .bitwiseAND(lit(0xFFFFFFFFL)))
          .as("net"),
      )
      .filter(col("net").isNotNull)
      .groupBy(col("prefix_len"), col("net"))
      .agg(count(lit(1)).as("n"))
      .filter(col("n") > 1)
      .limit(1)
      .collect()
    require(
      dupNets.isEmpty,
      s"lpmEnrich dimension is not keyed: (prefix_len=${dupNets.headOption.map(_.get(0)).orNull}, masked network=${dupNets.headOption.map(_.get(1)).orNull}) appears more than once — a route table must hold one row per (prefix_len, network)",
    )
    val ipn = when(col("ip").rlike(Ipv4Pattern), ipv4ToLong(col("ip")))
    val joined = lens.foldLeft(flows.withColumn("__ipn", ipn)) { (acc, l) =>
      val mask = (0xFFFFFFFFL << (32 - l)) & 0xFFFFFFFFL
      val dim = prefixes
        .filter(col("prefix_len") === l)
        .select(
          ipv4ToLong(col("prefix_ip")).bitwiseAND(lit(mask)).as(s"__net$l"),
          col("prefix_ip").as(s"__pfx$l"),
          col("tag").as(s"__tag$l"),
        )
      acc.join(broadcast(dim), col("__ipn").bitwiseAND(lit(mask)) === col(s"__net$l"), "left")
        .drop(s"__net$l")
    }
    joined.select(
      flows.columns.map(col) ++ Seq(
        coalesce(lens.map(l => col(s"__pfx$l")) :+ lit(null).cast("string"): _*)
          .as("match_prefix"),
        coalesce(
          lens.map(l => when(col(s"__pfx$l").isNotNull, lit(l))) :+ lit(null).cast("int"): _*)
          .as("match_len"),
        coalesce(lens.map(l => col(s"__tag$l")) :+ lit(null).cast("string"): _*).as("tag"),
      ): _*)
  }

  /** P10 — heartbeat filter: drop messages whose whole value is the
    * literal topic name (websocket-server/index.js:41).
    */
  def heartbeatFilter(df: DataFrame, topic: String): DataFrame =
    df.filter(col("value") =!= lit(topic))

  /** P9 — realtime tick projection {time, bytes}
    * (websocket-server/index.js:42-46).
    */
  def tick(df: DataFrame): DataFrame =
    df.select(timeOfDay(col("timestamp_arrival")).as("time"), col("bytes"))

  /** A1+A2 (∘ P5, P6, P7) — the flagship Date Access Trend query
    * (accessTrend.ts:10-87; SURVEY.md §3.3): range filter → direction
    * split → per-day sums → ordered output. Catalyst plans this as
    * partial+final hash aggregation with the filter pushed to the scan;
    * at 100 TB the only shuffle is on `day` (low cardinality, tiny).
    */
  def accessTrend(curated: DataFrame, host: String, lo: String, hi: String): DataFrame =
    directionSplit(curated.filter(rangeFilter(col("timestamp"), lo, hi)), host)
      .groupBy(col("day"))
      .agg(
        sum("in_bytes").as("in_bytes"),
        sum("in_packets").as("in_packets"),
        sum("out_bytes").as("out_bytes"),
        sum("out_packets").as("out_packets"),
      )
      .orderBy(col("day"))

  /** A3 — internalized pmacct flow aggregation (README.md:57,63): sums of
    * bytes/packets per flow key per 10-second tumbling window. Batch and
    * streaming share this; streaming adds a watermark at the edge.
    */
  def flowWindowAgg(df: DataFrame, tsCol: Column, flowKeys: Seq[Column]): DataFrame =
    df.groupBy((window(tsCol, "10 seconds") +: flowKeys): _*)
      .agg(sum("bytes").as("bytes"), sum("packets").as("packets"))

  /** Liveness-monitoring core: each user's LONGEST silence — the max
    * inter-arrival gap in exact microseconds (NTZ-to-NTZ diff, no
    * second-truncation ambiguity) plus the event count; single-event
    * users carry a NULL gap, the honest answer. Input: (user_id, ts,
    * event_id) with ts TIMESTAMP_NTZ. One lag window partitioned per
    * user + one aggregate — fully parallel at any scale. Shared by the
    * batch registry query (`nf_idle_gap`) and the streaming twin
    * ([[graft.streaming.BurstStream.idleGaps]], bit-identical —
    * StreamingSpec asserts).
    */
  def idleGap(events: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id")
      .orderBy("ts", "event_id")
    events
      .select(col("user_id"), col("ts"), col("event_id"))
      .withColumn("prev", lag(col("ts"), 1).over(w))
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("n_events"),
        max(expr("timestampdiff(MICROSECOND, prev, ts)")).as("max_gap_us"),
      )
      .orderBy("user_id")
  }

  /** Burst detection core (rate-limiter sizing): each user's PEAK event
    * count over any aligned 60-second window sliding by 10 s, plus the
    * earliest window start achieving it. Input: (user_id, ts) with ts
    * TIMESTAMP_NTZ. The slide enumeration is pure integer seconds — 6
    * aligned starts per event (Expand ×6, one count shuffle); the peak
    * pick is max + an equi-join back, never a row_number over raw
    * events. Shared verbatim by the batch registry query (`nf_burst`)
    * and the streaming twin ([[graft.streaming.BurstStream]]), whose
    * O(1)-state processor replays exactly this arithmetic and is
    * asserted bit-identical in StreamingSpec.
    */
  def burstPeak(events: DataFrame): DataFrame = {
    val epoch = lit(java.time.LocalDateTime.of(1970, 1, 1, 0, 0))
    val g = events
      .select(col("user_id"), timestamp_diff("SECOND", epoch, col("ts")).as("sec"))
      .select(col("user_id"), expr("sec div 10 * 10").as("base"),
        explode(sequence(lit(0), lit(5))).as("k"))
      .select(col("user_id"), (col("base") - col("k") * 10).as("ws"))
      .groupBy(col("user_id"), col("ws"))
      .agg(count(lit(1)).as("n"))
    val m = g
      .groupBy(col("user_id"))
      .agg(max(col("n")).as("peak_events"))
    g.join(m, "user_id")
      .filter(col("n") === col("peak_events"))
      .groupBy(col("user_id"), col("peak_events"))
      .agg(min(col("ws")).as("at_ws"))
      .orderBy("user_id")
  }

  /** Bidirectional flow stitching — pair each flow A→B with the reverse
    * flow B→A starting within `window` after it (the request/response
    * matching a netflow analyzer needs; the reference's per-direction
    * split at accessTrend.ts:30-41 is the degenerate per-host form of
    * this). Pure transform shared by batch ([[graft.NetflowQueries]]
    * `nf_flow_stitch`) and streaming
    * ([[graft.streaming.NetflowStreams.pairBidirectionalFlows]]), which
    * adds the watermark that bounds join state.
    *
    * Expects columns `ip_src, ip_dst, port_src, port_dst, ts` (plus any
    * payload columns); EVERY input column comes back twice, prefixed
    * `f_` (forward flow) and `r_` (reverse), so callers keep ids/bytes
    * without the core knowing about them. The equi-part of the condition
    * (the reversed 4-tuple) keys the shuffle; the time bound prunes
    * state and, under streaming, drives eviction.
    *
    * Equal-timestamp exchanges would otherwise emit BOTH orientations
    * (each side qualifying as "fwd"), and a degenerate loopback flow
    * (src=dst, psrc=pdst) would pair with itself — the strict
    * lexicographic tie-break at equal times emits exactly one row per
    * exchange and nothing for self-matches. `joinType="left_outer"`
    * emits unanswered forward flows with NULL reverse columns (under
    * streaming: once the watermark passes their match window).
    */
  /** Port-scan / fan-out profile — the classic netflow detection the
    * reference's per-host trend (accessTrend.ts:30-41) stops short of:
    * per (day, source) count the DISTINCT destination ports and hosts
    * touched, and flag sources whose port fan-out reaches
    * `scanThreshold`. A vertical scan lights up `n_ports`, a horizontal
    * sweep lights up `n_hosts`; both fall out of one pass.
    *
    * Expects columns `day, ip_src, ip_dst, port_dst`. Plan shape: a
    * single hash aggregation keyed on (day, ip_src) — the two
    * count-distincts expand to one partial+final pair (shared Expand),
    * so the only shuffle is on the narrow group key; no window, no
    * join, no per-source state. At 100 TB the group-key cardinality is
    * days × sources — small — and the distinct expansion is map-side
    * partial, so this is scan-bound.
    */
  def fanOutProfile(flows: DataFrame, scanThreshold: Int): DataFrame =
    flows
      .groupBy(col("day"), col("ip_src"))
      .agg(
        count(lit(1)).as("n_flows"),
        countDistinct(col("port_dst")).as("n_ports"),
        countDistinct(col("ip_dst")).as("n_hosts"),
      )
      .withColumn("is_scan", col("n_ports") >= scanThreshold)
      .orderBy("day", "ip_src")

  /** Beaconing profile — C2-style regular call-home detection over flow
    * inter-arrival times: per (src, dst) pair, the gap sequence between
    * consecutive flows reduced to exact-integer moments (count, min,
    * max, sum, sum-of-squares in whole seconds — enough for any
    * downstream variance/CV test without a float in the pipeline) plus
    * the coefficient-of-variation flag itself: at least `minGaps` gaps
    * with cv² = (n·Σg² − (Σg)²)/(Σg)² at most 1/cvInv² — regular
    * beacons have cv ≪ 1, Poisson traffic cv ≈ 1 — stated in
    * cross-multiplied integer form, so results are bit-reproducible
    * across engines. (The products wrap past 2⁶³ in Spark and throw in
    * DuckDB — the documented overflow asymmetry; whole-second gap sums
    * keep real corpora far below it.)
    *
    * Expects columns `ip_src, ip_dst, ts, id` (`id` breaks
    * equal-timestamp ordering ties deterministically). Plan shape: one
    * shuffle on the pair key, one in-partition sort for the lag, one
    * hash aggregation — the sessionize shape ([[EventOps]]), which is
    * the right one at scale: per-pair rows are contiguous after the
    * exchange, and no state beyond the sort spill is held. Gap seconds
    * are floor((µs-diff)/1e6) — floor and truncation agree for the
    * non-negative diffs the sort guarantees.
    */
  def beaconProfile(flows: DataFrame, minGaps: Int, cvInv: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("ip_src"), col("ip_dst")).orderBy(col("ts"), col("id"))
    // NTZ-tolerant epoch micros: gaps are DIFFERENCES, so any fixed
    // session-zone interpretation of an NTZ wall time cancels out.
    val us = unix_micros(col("ts").cast("timestamp"))
    flows
      .withColumn("prev_us", lag(us, 1).over(w))
      .withColumn("gap_s", floor((us - col("prev_us")) / lit(1000000L)))
      .groupBy(col("ip_src"), col("ip_dst"))
      .agg(
        count(lit(1)).as("n_flows"),
        count(col("gap_s")).as("n_gaps"),
        min(col("gap_s")).as("min_gap_s"),
        max(col("gap_s")).as("max_gap_s"),
        sum(col("gap_s")).as("sum_gap_s"),
        sum(col("gap_s") * col("gap_s")).as("sum_gap2_s"),
      )
      .withColumn(
        "is_beacon",
        col("n_gaps") >= minGaps &&
          lit(cvInv.toLong * cvInv) *
          (col("n_gaps") * col("sum_gap2_s") - col("sum_gap_s") * col("sum_gap_s")) <=
          col("sum_gap_s") * col("sum_gap_s"),
      )
      .orderBy("ip_src", "ip_dst")
  }

  def stitchBidirectional(
      flows: DataFrame,
      window: String = "10 seconds",
      joinType: String = "inner",
      binSeconds: Option[Long] = None,
  ): DataFrame = {
    // Binning only composes with inner joins: a left-outer over the
    // exploded forward side would emit one NULL-extended row PER BIN
    // COPY for each unanswered flow.
    require(binSeconds.isEmpty || joinType == "inner",
      "binSeconds requires joinType=inner")
    val cols = flows.columns.toSeq
    def side(prefix: String) =
      flows.select(cols.map(c => col(c).as(s"$prefix$c")): _*)
    val strictTieBreak =
      col("r_ts") > col("f_ts") ||
        (col("r_ts") === col("f_ts") &&
          (col("f_ip_src") < col("r_ip_src") ||
            (col("f_ip_src") === col("r_ip_src") && col("f_port_src") < col("r_port_src"))))
    val cond =
      col("f_ip_src") === col("r_ip_dst") && col("f_ip_dst") === col("r_ip_src") &&
        col("f_port_src") === col("r_port_dst") && col("f_port_dst") === col("r_port_src") &&
        col("r_ts") >= col("f_ts") &&
        col("r_ts") <= col("f_ts") + expr(s"INTERVAL $window") &&
        strictTieBreak
    binSeconds match {
      case None =>
        side("f_").join(side("r_"), cond, joinType)
      // The RangeJoinOp binning reformulation fused with the 4-tuple
      // equi-key: when the flow-key domain is small relative to the data
      // (test fixtures; DDoS-grade key concentration in production), the
      // plain equi-join's per-key candidate sets grow quadratically and
      // the interval predicate runs as an O(n²)-per-key residual. Adding
      // the time bin to the equi-key bounds candidates to bin-width
      // cohorts: the reverse row keeps its single bin, the forward row
      // replicates into the window/binSeconds + 1 bins its match range
      // overlaps, and a qualifying pair meets in EXACTLY the reverse
      // row's bin — output identical to the plain join, row for row.
      // Pick binSeconds ≈ the window span (fan-out 2).
      case Some(bs) =>
        require(bs > 0, s"bin width must be positive, got $bs")
        val ntz = RangeJoinOp.isNtz(flows, col("ts"))
        val fwd = side("f_").withColumn(
          "__f_bin",
          explode(sequence(
            RangeJoinOp.binExpr(ntz, col("f_ts"), bs),
            RangeJoinOp.binExpr(ntz, col("f_ts") + expr(s"INTERVAL $window"), bs),
          )),
        )
        val rev = side("r_").withColumn("__r_bin", RangeJoinOp.binExpr(ntz, col("r_ts"), bs))
        fwd.join(rev, cond && col("__f_bin") === col("__r_bin"), joinType)
          .drop("__f_bin", "__r_bin")
    }
  }
}
