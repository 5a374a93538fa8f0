package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The SQL surface of the custom expressions, through the standard
  * spark.sql.extensions plugin mechanism. Extensions bind at session
  * build, so this suite constructs (and afterwards clears) its own
  * session instead of sharing SparkSpec's; suites run sequentially in
  * the forked test JVM, so the swap is race-free.
  */
class GraftExtensionsSpec extends AnyFunSuite {

  test("custom expressions are callable from SQL via spark.sql.extensions") {
    // spark.sql.extensions is a STATIC conf — it binds when the
    // SparkContext is created, so the shared suite context must go.
    SparkSession.getDefaultSession.foreach(_.stop())
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val spark = SparkSession
      .builder()
      .master("local[2]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      import spark.implicits._
      Seq((1L, "a b c d"), (2L, "a b c d"), (3L, "x y z w")).toDF("doc_id", "text")
        .createOrReplaceTempView("ext_docs")
      val rows = spark.sql(
        """SELECT doc_id,
          |  poly_hash(text) AS ph,
          |  simhash(text, 16) AS sh,
          |  size(shingle_hashes(text, 3)) AS nsh,
          |  shingles(text, 3) AS sh3,
          |  array_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS dot,
          |  sorted_intersect_count(array(1L, 2L, 5L), array(2L, 3L, 5L)) AS ic
          |FROM ext_docs ORDER BY doc_id""".stripMargin,
      ).collect()
      assert(rows(0).getAs[Long]("ph") == rows(1).getAs[Long]("ph"))
      assert(rows(0).getAs[Long]("ph") != rows(2).getAs[Long]("ph"))
      assert(rows(0).getAs[Long]("sh") == rows(1).getAs[Long]("sh"))
      assert(rows(0).getAs[Int]("nsh") == 2) // "a b c", "b c d"
      assert(rows(0).getAs[scala.collection.Seq[String]]("sh3").toSeq == Seq("a b c", "b c d"))
      // The sketch probe composes with the built-in aggregate in SQL.
      val cms = spark.sql(
        """SELECT cms_estimate(count_min_sketch(text, 0.001d, 0.999d, 42), 'a b c d') AS est
          |FROM ext_docs""".stripMargin,
      ).collect()
      assert(cms(0).getAs[Long]("est") == 2L) // doc 1 and doc 2 share the text
      assert(rows(0).getAs[Double]("dot") == 11.0)
      assert(rows(0).getAs[Int]("ic") == 2)
    } finally {
      // Later suites rebuild the standard shared session cleanly.
      spark.stop()
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
    }
  }
}
