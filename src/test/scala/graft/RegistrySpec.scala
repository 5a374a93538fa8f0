package graft

import org.apache.spark.sql.types.DecimalType

/** Registry-wide invariants the driver gate depends on, enforced
  * locally so a future query can't regress them silently:
  * unique names, an oracle for every query, and no DECIMAL column at
  * any query boundary (the driver hash renders decimal scale, so a
  * trailing-zero value would mismatch the oracle's float rendering —
  * the round-1 failure mode). Schema checks are analysis-only (no
  * execution), so the whole registry is validated in seconds.
  */
class RegistrySpec extends SparkSpec {

  test("query names are unique") {
    val names = Registry.all.map(_.name)
    assert(names.distinct.size == names.size,
      s"duplicates: ${names.diff(names.distinct).distinct}")
  }

  test("every registered query has a DuckDB oracle") {
    val missing = Registry.all.filter(_.oracle.isEmpty).map(_.name)
    assert(missing.isEmpty, s"queries without oracle: $missing")
  }

  test("no query emits a DECIMAL column at its boundary") {
    val offenders = Registry.all.flatMap { q =>
      val schema = q.run(spark, Sf).schema
      val decs = schema.fields.collect { case f if f.dataType.isInstanceOf[DecimalType] => f.name }
      if (decs.isEmpty) None else Some(s"${q.name}: ${decs.mkString(",")}")
    }
    assert(offenders.isEmpty, s"DECIMAL at query boundary:\n${offenders.mkString("\n")}")
  }
}
