package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{BloomPrune, Layout}

class LayoutSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.local("layout-spec")

  private def mortonRef(x: Long, y: Long): Long = {
    def spread(v: Long): Long = {
      var c = v & 0xFFFFL
      c = (c | (c << 8)) & 0x00FF00FFL
      c = (c | (c << 4)) & 0x0F0F0F0FL
      c = (c | (c << 2)) & 0x33333333L
      (c | (c << 1)) & 0x55555555L
    }
    spread(x) | (spread(y) << 1)
  }

  test("zValue matches a bit-by-bit Morton reference and is injective on 16-bit pairs") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val pairs = Seq((0L, 0L), (65535L, 65535L), (1L, 0L), (0L, 1L)) ++
      Seq.fill(500)((rnd.nextInt(65536).toLong, rnd.nextInt(65536).toLong))
    val got = pairs.toDF("x", "y")
      .select(Layout.zValue($"x", $"y").as("z")).as[Long].collect().toSeq
    assert(got == pairs.map { case (x, y) => mortonRef(x, y) })
    assert(pairs.distinct.size == pairs.map { case (x, y) => mortonRef(x, y) }.distinct.size)
  }

  test("zorderStats buckets tile the space with bounded rectangles") {
    import spark.implicits._
    val df = (0 until 8000).map(i => (i.toLong % 197, (i * 31L) % 83)).toDF("a", "b")
    val stats = Layout.zorderStats(df, "a", "b", bucketBits = 4).collect()
    assert(stats.map(_.getAs[Long]("n_rows")).sum == 8000L)
    // each of the 16 z-space buckets covers at most half of each
    // quantized dim (top-2-bits-of-z split both dims once)
    stats.foreach { r =>
      assert(r.getAs[Long]("x_max") - r.getAs[Long]("x_min") <= 197 / 2 + 1)
      assert(r.getAs[Long]("y_max") - r.getAs[Long]("y_min") <= 83 / 2 + 1)
    }
  }

  test("bloom prune: zero false negatives, any partitioning") {
    import spark.implicits._
    val dim = (0 until 400).map(i => i * 7L).toDF("key")
    val fact = (0 until 20000).map(_.toLong).toDF("key")
    val bloom = BloomPrune.build(dim, "key")
    val passed = BloomPrune.prune(fact, "key", bloom).as[Long].collect().toSet
    // every true member passes (Bloom's one-sided guarantee)
    val members = (0 until 400).map(i => i * 7L).filter(_ < 20000).toSet
    assert(members.subsetOf(passed))
    // pruning actually prunes: survivors are a small superset
    assert(passed.size < members.size + 100,
      s"fp explosion: ${passed.size - members.size} false positives")
  }
}
