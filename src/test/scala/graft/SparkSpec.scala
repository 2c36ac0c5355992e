package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for all specs: one JVM-wide session (cheap
  * getOrCreate), UTC, tiny shuffle fan-out so unit tests stay fast.
  */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSpec.session

  def rowsOf(df: DataFrame): Seq[Seq[Any]] =
    df.collect().toSeq.map(_.toSeq)

  /** Order-insensitive comparison of full contents. */
  def assertSameRows(actual: DataFrame, expected: Seq[Seq[Any]]): Unit = {
    val a = rowsOf(actual).map(_.map(String.valueOf)).sortBy(_.mkString("|"))
    val e = expected.map(_.map(String.valueOf)).sortBy(_.mkString("|"))
    assert(a == e)
  }
}

object SparkSpec {
  lazy val session: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-tests")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}
