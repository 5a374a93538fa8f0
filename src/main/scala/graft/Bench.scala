package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm pass on the smallest SF: triggers classloading, whole-stage
    // codegen compilation, and JIT for every query shape so the timings
    // below measure steady-state query cost, not first-call overhead
    // (cold-vs-warm differs 3-6× per query).
    val warmDir = "/root/testdata/sf0.001"
    if (new java.io.File(warmDir).isDirectory) {
      SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (_, fn) =>
        try fn(spark, warmDir).count()
        catch { case _: Throwable => () }
      }
    }
    // n=2 per query, report the min: a single contended sample on a
    // shared driver machine otherwise dominates the total (a 2-table
    // union was once measured 50× its steady-state). min-of-2 is the
    // standard de-noising for wall-clock microbenchmarks — contention
    // only ever adds time.
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "2").toInt
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      // A rep that throws reports the sentinel -1, never its elapsed
      // time — a failing query must not produce a plausible-looking
      // benchmark number.
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        val ok =
          try { fn(spark, sfDir).count(); true }
          catch { case e: Throwable => System.err.println(s"[bench] $name FAILED: $e"); false }
        if (ok) (System.nanoTime() - t0) / 1e9 else -1.0
      }
      val sec = if (times.exists(_ >= 0)) times.filter(_ >= 0).min else -1.0
      System.err.println(
        f"[bench] $name%-22s $sec%8.2f s  (min of ${times.map(t => f"$t%.2f").mkString("/")})",
      )
      name -> sec
    }
    // One machine-readable line. The driver keeps only the LAST ~2.5 kB
    // of process output (round 2's full-precision line overflowed it and
    // the headline total was truncated away), so: per-query times round
    // to ms, the headline total ("value") goes LAST, and if the line
    // would still overflow the window the per-query map keeps only the
    // slowest entries (the headline ones) with an "omitted" count — the
    // total always covers every query regardless.
    def r3(v: Double): String = if (v < 0) "-1" else f"$v%.3f"
    val failed = results.collect { case (k, v) if v < 0 => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = results.map(_._2).filter(_ >= 0).sum
    def line(shown: Seq[(String, Double)], omitted: Int): String = {
      val qs = shown.map { case (k, v) => "\"" + k + "\":" + r3(v) }
        .mkString("{", ",", "}")
      s"""{"metric":"total","unit":"sec","sf":"$sfDir","n":$reps,"queries":$qs,"failed":$failed,"omitted":$omitted,"value":${r3(total)}}"""
    }
    val budget = 2200 // bytes; leaves room for sbt's trailing [success] line
    val bySlowest = results.sortBy { case (_, v) => -v }
    var keep = results.size
    while (keep > 1 && line(bySlowest.take(keep).sortBy(_._1), results.size - keep).length > budget)
      keep -= 1
    println(line(bySlowest.take(keep).sortBy(_._1), results.size - keep))
    spark.stop()
  }
}
