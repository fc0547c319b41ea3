package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared session for all suites: one local JVM-wide SparkSession
  * (getOrCreate), UTC, small shuffle fan-out for test speed. */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = graft.core.Sessions.local("graft-test", cores = 4)
  val sf: String = "/root/testdata/sf0.001"
}
