package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for all suites (one JVM-wide session — Spark
  * session startup dominates test wall time otherwise). Config mirrors
  * production (`GraftSession`): UTC, non-ANSI, AQE.
  */
object SparkSpec {
  lazy val spark: SparkSession = GraftSession.local("graft-test", nCpus = 4)
}

trait SparkSpec extends AnyFunSuite {
  // val (not def): `import spark.implicits._` needs a stable identifier
  lazy val spark: SparkSession = SparkSpec.spark
}
