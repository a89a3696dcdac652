package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.queries.SqlTwins

/** SQL twin ≡ DataFrame implementation, row for row (SURVEY.md §7.1). */
class SqlTwinsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.local("sqltwins-spec")
  val dir = "/root/testdata/sf0.001"

  SqlTwins.sql.keys.foreach { name =>
    test(s"$name: SQL twin matches DataFrame result") {
      val df = SparkEntry.queries(name)(spark, dir)
      val sql = SqlTwins.run(spark, dir, name)
      assert(sql.columns.toSeq == df.columns.toSeq)
      assert(sql.collect().toSeq == df.collect().toSeq)
    }
  }
}
