package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The engine's tables compose through the plain SQL-text surface: a
  * user who registers the parquet tables as views can run the flagship
  * analytics, the TPC-H shapes, windows, and — with GraftExtensions
  * active — even the LSH/ANN pipelines with `spark.sql(...)` alone, no
  * DataFrame code. Every test asserts the SQL text reproduces the
  * registered DataFrame query row-for-row in its declared order.
  */
class SqlSurfaceSpec extends SparkSpec {

  /** Registers every driver table as `<name>_v` on the given session. */
  private def registerViews(s: SparkSession): Unit =
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "documents", "embeddings").foreach { t =>
      Tables.table(s, Sf, t).createOrReplaceTempView(s"${t}_v")
    } // events needs its ns→us normalization:
  private def registerEvents(s: SparkSession): Unit =
    Tables.events(s, Sf).createOrReplaceTempView("events_v")

  /** Both frames carry a total ORDER BY, so ordered row-by-row equality
    * is the right comparison.
    */
  private def assertSameRows(sql: DataFrame, api: DataFrame): Unit = {
    val a = sql.collect().map(_.toString).toSeq
    val b = api.collect().map(_.toString).toSeq
    assert(a.nonEmpty, "query should produce rows")
    assert(a == b, s"SQL vs DataFrame mismatch:\n  sql head=${a.take(3)}\n  api head=${b.take(3)}")
  }

  test("flagship access-trend runs as pure SQL text over registered views") {
    registerEvents(spark)
    val got = spark.sql(
      s"""SELECT substr(date_format(ts, 'yyyy-MM-dd HH:mm:ss.SSSSSS'), 1, 10) AS day,
         |  CAST(sum(CASE WHEN user_id = ${graft.operators.EventOps.HostId}
         |       THEN CAST(value AS DECIMAL(18,2)) ELSE 0 END) AS DOUBLE) AS in_value,
         |  count(*) AS n
         |FROM events_v GROUP BY day ORDER BY day""".stripMargin,
    )
    val viaApi = graft.operators.EventOps
      .accessTrend(Tables.events(spark, Sf), "0000-01-01", "9999-12-31")
    assert(got.count() == viaApi.count())
    assert(got.count() > 0)
    // Same day keys, same in_value column, cross-checked cell-by-cell.
    val sqlDays = got.select(col("day"), col("in_value")).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val apiDays = viaApi.select(col("day"), col("in_value")).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(sqlDays == apiDays)
  }

  test("TPC-H Q1 pricing summary as pure SQL text equals the registered DataFrame query") {
    registerViews(spark)
    val sql = spark.sql(
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,0)) - CAST(l_discount AS DECIMAL(4,2))) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
        |  CAST(sum(CAST(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,0)) - CAST(l_discount AS DECIMAL(4,2))) AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(3,0)) + CAST(l_tax AS DECIMAL(4,2))) AS DECIMAL(18,6))) AS DOUBLE) AS sum_charge,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / count(*) AS avg_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / count(*) AS avg_price,
        |  CAST(sum(CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) / count(*) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem_v
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    )
    assertSameRows(sql, Registry.queries("q1_pricing_summary")(spark, Sf))
  }

  test("window rank (top-3 per customer) as pure SQL text equals the registered query") {
    registerViews(spark)
    val sql = spark.sql(
      """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |         row_number() OVER (PARTITION BY o_custkey
        |                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders_v) WHERE rn <= 3
        |ORDER BY o_custkey, rn""".stripMargin,
    )
    assertSameRows(sql, Registry.queries("q_window_rank")(spark, Sf))
  }

  test("top talkers as pure SQL text equals the registered query") {
    registerEvents(spark)
    val sql = spark.sql(
      """SELECT user_id,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
        |  count(*) AS n_events
        |FROM events_v GROUP BY user_id
        |ORDER BY total_value DESC, user_id LIMIT 10""".stripMargin,
    )
    assertSameRows(sql, Registry.queries("nf_top_talkers")(spark, Sf))
  }

  test("correlated LATERAL decorrelates to a group-limit + hash join (no nested loop)") {
    val df = Registry.queries("q_lateral_topk")(spark, Sf)
    val plan = df.queryExecution.executedPlan.toString
    // The lateral body (aggregate + ORDER BY + LIMIT referencing the
    // outer row) must NOT plan as a per-row nested loop: Catalyst
    // decorrelates it into a per-key WindowGroupLimit (map-side top-1)
    // joined back to the outer side.
    assert(!plan.contains("BroadcastNestedLoopJoin"), s"nested loop in:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"cartesian in:\n$plan")
    assert(plan.contains("WindowGroupLimit"), s"no group-limit pushdown in:\n$plan")
    assert(df.count() > 0)
  }

  test("WITH RECURSIVE BFS terminates on the hop bound and yields BFS distances") {
    val rows = Registry.queries("q_reachability")(spark, Sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.nonEmpty)
    // Seed at distance 0, everything else within the hop bound, and
    // distances form contiguous BFS levels (a node at hop h implies
    // some node at h-1 — its predecessor on the shortest path).
    assert(rows.count(_._2 == 0L) == 1)
    assert(rows.forall(_._2 <= 3L))
    val hops = rows.map(_._2).toSet
    assert((0L to hops.max).forall(hops.contains))
  }

  test("the curation verdict runs as pure SQL text over the persisted artifact tables") {
    import graft.operators.{MediaIndexOps, MultimodalOps}
    val prefix = "sqlcuration"
    Seq("_fps", "_chunks", "_meta", "_clusters", "_cclusters", "_batches")
      .foreach(sfx => spark.sql(s"DROP TABLE IF EXISTS $prefix$sfx"))
    val media = MultimodalOps.encodeMedia(Tables.documents(spark, Sf))
    MediaIndexOps.writeIndex(media, 49, 6, buckets = 4, prefix = prefix)
    MediaIndexOps.writeCurationArtifacts(spark, media, maxHamming = 5, buckets = 4, prefix = prefix)
    // A SQL-only user composes the nightly verdict from the two
    // bucketed tables directly — no DataFrame code, no extensions.
    val got = spark.sql(
      s"""SELECT m.doc_id,
         |  CASE WHEN m.ex_keeper <> m.doc_id THEN 'exact_dup'
         |       WHEN c.component IS NOT NULL AND c.component <> m.doc_id
         |         THEN 'near_dup'
         |       WHEN m.width * m.height < 16384 THEN 'too_small'
         |       ELSE 'keep' END AS status,
         |  CASE WHEN m.ex_keeper <> m.doc_id THEN m.ex_keeper
         |       WHEN c.component IS NOT NULL AND c.component <> m.doc_id
         |         THEN c.component END AS dup_of
         |FROM ${prefix}_meta m
         |LEFT JOIN ${prefix}_clusters c ON c.doc_id = m.doc_id
         |ORDER BY m.doc_id""".stripMargin,
    )
    val (floor, label) = MultimodalOps.imageFloor(16384L)
    assertSameRows(got, MediaIndexOps.curationFromIndex(spark, prefix, floor, label))
  }

  test("LSH near-dup and ANN top-k run as pure SQL text via the registered engine functions") {
    // minhash_sig / shingle_hashes / sorted_intersect_count / unit_norm /
    // array_dot bind through spark.sql.extensions — a STATIC conf, so
    // this test builds its own session (same pattern as
    // GraftExtensionsSpec; suites run sequentially in the forked JVM).
    SparkSession.getDefaultSession.foreach(_.stop())
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      registerViews(s)
      // dd_minhash_lsh, verbatim pipeline in SQL text: shingle → 32-wide
      // minhash → 8 band keys → band-bucket self-join → sorted-intersect
      // jaccard verify at 0.8 (constants mirror DedupQueries).
      val lshSql = s.sql(
        """WITH sh AS (
          |  SELECT doc_id, array_sort(shingle_hashes(text, 3)) AS sh FROM documents_v),
          |sg AS (SELECT doc_id, sh, minhash_sig(sh, 32) AS sig FROM sh),
          |bk AS (SELECT doc_id, band_idx,
          |         concat_ws('_', slice(sig, band_idx * 4 + 1, 4)) AS band_key
          |       FROM sg LATERAL VIEW explode(sequence(0, 7)) b AS band_idx),
          |cand AS (SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
          |         FROM bk x JOIN bk y
          |           ON x.band_idx = y.band_idx AND x.band_key = y.band_key
          |          AND x.doc_id < y.doc_id)
          |SELECT doc_a, doc_b, jaccard FROM (
          |  SELECT c.doc_a, c.doc_b,
          |    CAST(sorted_intersect_count(a.sh, b.sh) AS DOUBLE)
          |      / (size(a.sh) + size(b.sh) - sorted_intersect_count(a.sh, b.sh)) AS jaccard
          |  FROM cand c
          |  JOIN sh a ON a.doc_id = c.doc_a
          |  JOIN sh b ON b.doc_id = c.doc_b)
          |WHERE jaccard >= 0.8
          |ORDER BY doc_a, doc_b""".stripMargin,
      )
      assertSameRows(lshSql, Registry.queries("dd_minhash_lsh")(s, Sf))
      // sim_topk_exact: unit-norm + dot + ranked window, SQL-only.
      val annSql = s.sql(
        """WITH n AS (SELECT vec_id, unit_norm(embedding) AS u FROM embeddings_v),
          |p AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
          |        array_dot(q.u, c.u) AS cosine
          |      FROM n q JOIN n c ON q.vec_id < 10 AND q.vec_id <> c.vec_id)
          |SELECT query_id, neighbor_id, cosine, rank FROM (
          |  SELECT *, row_number() OVER (PARTITION BY query_id
          |              ORDER BY cosine DESC, neighbor_id) AS rank
          |  FROM p)
          |WHERE rank <= 5
          |ORDER BY query_id, rank""".stripMargin,
      )
      assertSameRows(annSql, Registry.queries("sim_topk_exact")(s, Sf))
      // mm_near_dedup_consensus, verbatim pipeline in SQL text: both
      // perceptual fingerprint families bind as SQL functions (dhash /
      // whash); image rows' decoded content = the raw text (container
      // strip), so the SQL side fingerprints documents_v directly.
      // Pigeonhole chunks via the floor-division extraction, banded
      // self-join, inline hamming verify, whash re-verification.
      val consensusSqlText = s.sql(
        """WITH fp AS (SELECT doc_id, dhash(text, 49) AS fp,
          |                   whash(text, 49, 48) AS wh
          |            FROM documents_v WHERE doc_id % 3 = 0),
          |ck AS (SELECT doc_id, fp, chunk_idx,
          |         CAST(floor(fp / power(2, chunk_idx * 8)) AS BIGINT) % 256
          |           AS chunk_bits
          |       FROM fp LATERAL VIEW explode(sequence(0, 5)) c AS chunk_idx),
          |p AS (SELECT doc_a, doc_b, hamming FROM (
          |        SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b,
          |          bit_count(x.fp ^ y.fp) AS hamming
          |        FROM ck x JOIN ck y
          |          ON x.chunk_idx = y.chunk_idx AND x.chunk_bits = y.chunk_bits
          |         AND x.doc_id < y.doc_id)
          |      WHERE hamming <= 5)
          |SELECT p.doc_a, p.doc_b, p.hamming,
          |  bit_count(a.wh ^ b.wh) AS whash_hamming,
          |  bit_count(a.wh ^ b.wh) <= 5 AS confirmed
          |FROM p JOIN fp a ON a.doc_id = p.doc_a
          |       JOIN fp b ON b.doc_id = p.doc_b
          |ORDER BY doc_a, doc_b""".stripMargin,
      )
      assertSameRows(consensusSqlText, Registry.queries("mm_near_dedup_consensus")(s, Sf))
    } finally {
      s.stop()
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
    }
  }

}
