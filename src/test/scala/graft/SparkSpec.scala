package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared test base: one local SparkSession per suite (lazy, reused via
  * getOrCreate across suites in the same JVM). */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession =
    graft.core.GraftSession.builder("local[4]", shufflePartitions = 4).getOrCreate()

  def sf(dir: String = "sf0.001"): graft.core.Tables =
    graft.core.Tables(spark, s"/root/testdata/$dir")
}
