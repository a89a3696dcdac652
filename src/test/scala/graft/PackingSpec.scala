package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Packing

class PackingSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.local("packing-spec")

  test("next-fit packing invariants: capacity, contiguity, dense bins, oversized isolation") {
    import spark.implicits._
    // lengths cycle over [0, 150): zeros, small, exact-fit, and > cap
    val docs = Seq.tabulate(200)(i => (i.toLong, (i * 37 % 150).toLong))
      .toDF("doc_id", "n_tokens")
    val cap = 100L
    val packed = Packing.nextFitPack(docs, cap, 4).collect()
    assert(packed.length == 200)
    assert(packed.map(_.doc_id).distinct.length == 200)
    assert(packed.forall(p => p.shard == p.doc_id % 4))
    for ((_, ps) <- packed.groupBy(p => (p.shard, p.bin))) {
      val total = ps.map(_.n_tokens).sum
      // capacity holds unless the bin is exactly one oversized doc
      assert(total <= cap || (ps.length == 1 && ps.head.n_tokens > cap),
        s"overfull bin: ${ps.toSeq}")
      // offsets tile the bin contiguously in (len desc, id) visit order
      val visit = ps.sortBy(p => (-p.n_tokens, p.doc_id))
      var off = 0L
      visit.foreach { p => assert(p.start_tok == off); off += p.n_tokens }
    }
    for ((_, ps) <- packed.groupBy(_.shard)) {
      val bins = ps.map(_.bin).distinct.sorted.toSeq
      assert(bins == (0L to bins.max), s"bins not dense: $bins")
    }
  }

  test("oversized doc opens its own bin and the next doc starts fresh") {
    import spark.implicits._
    val docs = Seq((1L, 250L), (2L, 60L), (3L, 50L))
      .toDF("doc_id", "n_tokens")
    // one shard: visit order 1 (250), 2 (60), 3 (50)
    val p = Packing.nextFitPack(docs, 100L, 1).collect()
      .map(x => x.doc_id -> x).toMap
    assert(p(1L).bin == 0 && p(1L).start_tok == 0) // oversized, alone
    assert(p(2L).bin == 1 && p(2L).start_tok == 0) // fresh bin after it
    assert(p(3L).bin == 2 && p(3L).start_tok == 0) // 60+50 > 100 → next
  }
}
