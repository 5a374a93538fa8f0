package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One named, driver-checkable query: the Spark implementation and (when
  * SQL-expressible) its DuckDB oracle, declared together so column names
  * and semantics cannot drift apart. The driver hash-compares values after
  * sorting columns by name, so every aliased output column must match the
  * oracle's exactly (see the builder contract).
  */
final case class Q(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String],
)

object Registry {
  def all: Seq[Q] =
    NetflowQueries.all ++
      RelationalQueries.all ++
      DedupQueries.all ++
      SimilarityQueries.all ++
      TextQueries.all ++
      MultimodalQueries.all

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.run).toMap

  def oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(sql => q.name -> sql)).toMap

  /** Eagerly builds every build-once-read-many artifact the registry's
    * index-served queries share (search index, vector index, PQ layer)
    * for dataset `dir`. Idempotent. Bench calls this in its un-timed
    * setup phase so a one-time corpus build can never masquerade as a
    * query's steady-state cost.
    */
  def prepareSharedArtifacts(spark: SparkSession, dir: String): Unit = {
    TextQueries.prepareSharedArtifacts(spark, dir)
    SimilarityQueries.prepareSharedArtifacts(spark, dir)
    MultimodalQueries.prepareSharedArtifacts(spark, dir)
    RelationalQueries.prepareSharedArtifacts(spark, dir)
    DedupQueries.prepareSharedArtifacts(spark, dir)
  }
}
