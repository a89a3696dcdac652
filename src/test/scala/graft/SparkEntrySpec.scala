package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract meta-spec: every registered query must run at smoke
  * scale, return rows, and have well-formed distinct column names; every
  * oracle key must reference a registered query. Each query test also
  * enforces the cache-hygiene contract: after build + run +
  * QueryCaches.releaseAll(), no plain-persisted RDD may remain
  * (locally-checkpointed small frames are exempt — bounded by
  * construction and reclaimed by the ContextCleaner when dereferenced).
  */
class SparkEntrySpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.local("entry-spec")
  val dir = "/root/testdata/sf0.001"

  test("every oracle key references a registered query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracles without queries: $missing")
  }

  test("entry() returns rows at smoke scale") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name: rows>0 and distinct column names at sf0.001") {
      val df = fn(spark, dir)
      val cols = df.columns.toSeq
      assert(cols.distinct.size == cols.size, s"duplicate columns: $cols")
      assert(cols.forall(c => c == c.toLowerCase), s"non-lowercase column in $cols")
      assert(df.count() > 0, s"$name returned no rows at smoke scale")
      QueryCaches.releaseAll()
      val leaked = spark.sparkContext.getPersistentRDDs.values
        .filterNot(_.isCheckpointed) // covers localCheckpoint (materialized)
      assert(leaked.isEmpty,
        s"$name leaked persisted RDDs past releaseAll: ${leaked.map(_.name)}")
    }
  }
}
