package graft

import org.apache.spark.sql.functions._

/** The engine's tables compose through the plain SQL-text surface: a
  * user who registers the parquet tables as views can run the flagship
  * analytics with `spark.sql(...)` alone, no DataFrame code — the
  * "switch to this library and keep your SQL" contract. (The custom
  * expressions' SQL surface is covered in GraftExtensionsSpec.)
  */
class SqlSurfaceSpec extends SparkSpec {

  test("flagship access-trend runs as pure SQL text over registered views") {
    Tables.events(spark, Sf).createOrReplaceTempView("events_v")
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
}
