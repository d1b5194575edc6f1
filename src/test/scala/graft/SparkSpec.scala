package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared session base for all suites — one local SparkSession per JVM
  * (Sessions.local is getOrCreate, so suites share it). */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = {
    val s = Sessions.local("4")
    graft.plans.CosineSimilarityExpr.register(s)
    s
  }
  def sf(name: String): org.apache.spark.sql.DataFrame =
    SparkEntry.t(spark, "/root/testdata/sf0.001", name)
}
