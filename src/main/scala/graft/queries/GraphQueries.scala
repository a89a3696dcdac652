package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Graph
import graft.sources.Tables

/** Graph analytics queries (g-series): iterative fixed-point PageRank
  * over the data's natural bipartite structure. Joins the connected-
  * components family (`Dedup.clusterPairs`) as the repo's second
  * iterative graph algorithm — and like everything else, it is
  * hash-exact against a DuckDB oracle (3 iterations unrolled as CTEs,
  * the s03 k-means pattern).
  */
object GraphQueries {

  /** g01 — supplier↔part importance: PageRank on the bipartite graph
    * whose (symmetric) edges are the distinct supplier–part supply
    * relationships in lineitem (part ids offset by 10^6 into the shared
    * node space). 3 damped iterations in exact integer micro-units; the
    * top-25 ranks are EXACT integers — no rounding anywhere in the
    * query. node_type disambiguates the two sides.
    */
  def g01(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val li = Tables.load(spark, dir, "lineitem")
      .select($"l_suppkey", ($"l_partkey" + 1000000L).as("part_node"))
      .distinct()
    val edges = li.select($"l_suppkey".as("src"), $"part_node".as("dst"))
      .unionByName(li.select($"part_node".as("src"), $"l_suppkey".as("dst")))
    Graph.pageRankFixed(edges, iters = 3)
      .select(
        $"id".as("node_id"),
        when($"id" >= 1000000L, "part").otherwise("supplier").as("node_type"),
        $"rank")
      .orderBy($"rank".desc, $"node_id")
      .limit(25)
  }

  /** g02 — market-basket triangle census: parts adjacent by line
    * number within an order form a co-occurrence edge (linear in
    * lineitem, unlike all-pairs-per-order which is quadratic in order
    * width); [[Graph.triangles]] enumerates all part triples that are
    * mutually co-adjacent and the query reports the top-25 parts by
    * triangle participation. The ORACLE counts the same triangles with
    * the canonical a<b<c three-way self-join — a DIFFERENT algorithm
    * from the degree-oriented wedge join (two algorithms, one hash),
    * which proves the orientation logic enumerates each triangle
    * exactly once.
    */
  def g02(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Graph.triangles(partAdjacency(spark, dir))
      .select(explode(array($"x", $"y", $"z")).as("part"))
      .groupBy($"part").agg(count(lit(1)).as("n_triangles"))
      .orderBy($"n_triangles".desc, $"part")
      .limit(25)
  }

  /** The g02/g04 co-occurrence adjacency: parts adjacent by line number
    * within an order (linear in lineitem), canonical a < b, distinct.
    */
  private def partAdjacency(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(spark, dir, "lineitem")
      .select(col("l_orderkey").as("ok"), col("l_linenumber").as("ln"),
        col("l_partkey").as("pk"))
    val x = li.as("x"); val y = li.as("y")
    x.join(y, col("x.ok") === col("y.ok") &&
        col("y.ln") === col("x.ln") + 1)
      .filter(col("x.pk") =!= col("y.pk"))
      .select(least(col("x.pk"), col("y.pk")).as("a"),
        greatest(col("x.pk"), col("y.pk")).as("b"))
      .distinct()
  }

  /** g03 — connected components DIRECTLY driver-oracled (previously
    * validated only inside e01/e02): a planted graph of ten ~50-node
    * chains (diameter ~50, forcing several pointer-doubling rounds —
    * a single-hop propagation would fail the oracle) plus planted
    * self-loop isolates (the coalesce-no-neighbor path), labeled by
    * [[graft.operators.Dedup.clusterPairs]] and hash-checked against a
    * DuckDB recursive-CTE reachability oracle — two different
    * algorithms, one hash.
    */
  def g03(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ids = Tables.load(spark, dir, "orders")
      .orderBy(col("o_orderkey")).limit(500)
      .select(col("o_orderkey").as("id"))
    val w = Window.partitionBy(col("grp")).orderBy(col("id"))
    val chains = ids.withColumn("grp", col("id") % 10)
      .withColumn("nxt", lead(col("id"), 1).over(w))
      .filter(col("nxt").isNotNull)
      .select(col("id").as("id_a"), col("nxt").as("id_b"))
    val isolates = ids.orderBy(col("id")).limit(20)
      .select((col("id") + 2000000L).as("id_a"),
        (col("id") + 2000000L).as("id_b"))
    graft.operators.Dedup.clusterPairs(chains.unionByName(isolates))
      .orderBy(col("id"))
  }

  /** g04 — local clustering coefficient on g02's adjacency: for each
    * part with degree ≥ 2, coeff = 2·tri / (deg·(deg−1)) — triangle
    * count from the degree-oriented wedge join ([[Graph.triangles]]),
    * degree from the symmetric adjacency, both exact integers; the
    * single double division is one correctly-rounded op in both
    * engines, then dround(4). Completes the graph family by reusing
    * the oriented-edge machinery (triangles per node were already
    * computed for g02 — this grades them against each node's possible
    * wedge count).
    */
  def g04(spark: SparkSession, dir: String): DataFrame = {
    val adj = partAdjacency(spark, dir).localCheckpoint() // feeds deg + triangles
    val deg = adj.select(col("a").as("part"))
      .unionByName(adj.select(col("b").as("part")))
      .groupBy(col("part")).agg(count(lit(1)).as("deg"))
    val tri = Graph.triangles(adj)
      .select(explode(array(col("x"), col("y"), col("z"))).as("part"))
      .groupBy(col("part")).agg(count(lit(1)).as("n_triangles"))
    deg.filter(col("deg") >= 2)
      .join(tri, Seq("part"), "left")
      .select(col("part"), col("deg"),
        coalesce(col("n_triangles"), lit(0L)).as("n_triangles"),
        graft.functions.gf.dround(
          (lit(2L) * coalesce(col("n_triangles"), lit(0L))).cast("double")
            / (col("deg") * (col("deg") - 1)), 4).as("clustering_coeff"))
      .orderBy(col("part"))
  }

  /** g05 — supply blast radius: minimum hop count from one nation's
    * supplier fleet (the LOWEST nation key with suppliers — present at
    * every SF, unlike a hardcoded nation) to every reachable node of
    * the bipartite supplier↔part graph (hop 1 = their parts, hop 2 =
    * co-suppliers of those parts, …), via [[Graph.bfsHops]]
    * level-synchronous frontier expansion capped at 4 hops. The ORACLE
    * recomputes distances with a depth-bounded recursive CTE +
    * min-aggregate — a different algorithm (path enumeration vs level
    * sets), one hash.
    */
  def g05(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val li = Tables.load(spark, dir, "lineitem")
      .select($"l_suppkey", ($"l_partkey" + 1000000L).as("part_node"))
      .distinct()
    val edges = li.select($"l_suppkey".as("src"), $"part_node".as("dst"))
      .unionByName(li.select($"part_node".as("src"), $"l_suppkey".as("dst")))
    val sup = Tables.load(spark, dir, "supplier")
    val seeds = sup
      .join(broadcast(sup.agg(min($"s_nationkey").as("mn"))),
        $"s_nationkey" === $"mn")
      .select($"s_suppkey".as("id"))
    Graph.bfsHops(edges, seeds, maxHops = 4)
      .select($"id".as("node_id"),
        when($"id" >= 1000000L, "part").otherwise("supplier").as("node_type"),
        $"hops")
      .orderBy($"node_id")
  }

  /** g06 — 4-core by iterative peeling ([[Graph.kCore]]) over a PLANTED
    * graph (the g03 convention — the real co-occurrence graph is no
    * test: its 3-core is the whole graph and its core transition is so
    * sharp that any fixed higher k empties it at some SF): the 24
    * lowest orderkeys become, by rank, a K6 clique (the core that must
    * survive), an 8-node STAIRCASE band — each band node linked to the
    * 3 preceding ranks, so under k=4 exactly ONE node peels per round,
    * an 8-round domino that a single-pass degree filter cannot
    * reproduce — and 5 leaf pairs (all gone in round 1). `maxRounds=12`
    * matches the oracle's unroll; peeling is confluent so the oracle's
    * rounds past the fixpoint are no-ops, and deeper-than-12 graphs
    * throw on the Spark side rather than silently diverge.
    */
  def g06(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ids = Tables.load(spark, dir, "orders")
      .orderBy(col("o_orderkey")).limit(24)
      .select(col("o_orderkey").as("id"))
      .withColumn("idx", row_number().over(Window.orderBy(col("id"))))
    val x = ids.as("x"); val y = ids.as("y")
    val edges = x.join(y,
        // clique K6: every rank pair ≤ 6
        (col("x.idx") < col("y.idx") && col("y.idx") <= 6) ||
        // staircase: ranks 7..14 each link to the 3 preceding ranks
        (col("y.idx") >= 7 && col("y.idx") <= 14 &&
          col("y.idx") - col("x.idx") <= 3 && col("x.idx") < col("y.idx")) ||
        // leaf pairs: (15,16), (17,18), ..., (23,24)
        (col("x.idx") >= 15 && col("x.idx") % 2 === 1 &&
          col("y.idx") === col("x.idx") + 1))
      .select(col("x.id").as("a"), col("y.id").as("b"))
    Graph.kCore(edges, k = 4, maxRounds = 12)
      .orderBy(col("id"))
  }

  /** g07 — TrustRank ([[Graph.pageRankPersonalizedFixed]]): trust
    * seeded at the g05 supplier fleet (lowest nation key — SF-proof)
    * propagates through the bipartite supply graph; ALL teleport mass
    * returns to the seeds, so rank is seed-proximity-weighted rather
    * than global importance (compare g01 on the same graph). 3 exact
    * integer iterations, top-25.
    */
  def g07(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val li = Tables.load(spark, dir, "lineitem")
      .select($"l_suppkey", ($"l_partkey" + 1000000L).as("part_node"))
      .distinct()
    val edges = li.select($"l_suppkey".as("src"), $"part_node".as("dst"))
      .unionByName(li.select($"part_node".as("src"), $"l_suppkey".as("dst")))
    val sup = Tables.load(spark, dir, "supplier")
    val seeds = sup
      .join(broadcast(sup.agg(min($"s_nationkey").as("mn"))),
        $"s_nationkey" === $"mn")
      .select($"s_suppkey".as("id"))
    Graph.pageRankPersonalizedFixed(edges, seeds, iters = 3)
      .select(
        $"id".as("node_id"),
        when($"id" >= 1000000L, "part").otherwise("supplier").as("node_type"),
        $"rank")
      .orderBy($"rank".desc, $"node_id")
      .limit(25)
  }

  /** g08 — weighted shortest paths ([[Graph.ssspWeighted]] Bellman-Ford
    * rounds) over a PLANTED weighted DAG (the g06 convention — planted
    * because relaxation structure must be guaranteed, not hoped for):
    * the 20 lowest orderkeys ranked 1..20 carry chain edges idx→idx+1
    * (w=3), skip edges idx→idx+3 (w=5 — beats the 3-hop chain's 9, so
    * optimal paths alternate edge types), and heavy shortcuts
    * idx→idx+2 (w=9, every 4th rank) that the 2-hop chain (3+3=6)
    * BEATS — a first-round label via the heavy edge is provably
    * improved in a later round, the non-trivial relaxation Dijkstra
    * prunes and Bellman-Ford must re-visit. Multi-source: seeds at
    * ranks 1 and 15 (dist = min over seeds). Exact integer weights;
    * the ORACLE enumerates all paths with a depth-bounded recursive
    * CTE + min aggregate (g05's pattern + weights) — a different
    * algorithm, one hash.
    */
  /** The g08/g09 planted weighted graph: (edges, seeds). */
  private def ssspGraph(spark: SparkSession, dir: String): (DataFrame, DataFrame) = {
    import org.apache.spark.sql.expressions.Window
    val ids = Tables.load(spark, dir, "orders")
      .orderBy(col("o_orderkey")).limit(20)
      .select(col("o_orderkey").as("id"))
      .withColumn("idx", row_number().over(Window.orderBy(col("id"))))
    val x = ids.as("x"); val y = ids.as("y")
    val edges = x.join(y,
        (col("y.idx") === col("x.idx") + 1) ||
        (col("y.idx") === col("x.idx") + 3) ||
        (col("y.idx") === col("x.idx") + 2 && col("x.idx") % 4 === 1))
      .select(col("x.id").as("src"), col("y.id").as("dst"),
        when(col("y.idx") === col("x.idx") + 1, 3L)
          .when(col("y.idx") === col("x.idx") + 3, 5L)
          .otherwise(9L).as("w"))
    val seeds = ids.filter(col("idx").isin(1, 15)).select(col("id"))
    (edges, seeds)
  }

  def g08(spark: SparkSession, dir: String): DataFrame = {
    val (edges, seeds) = ssspGraph(spark, dir)
    Graph.ssspWeighted(edges, seeds, maxRounds = 16)
      .select(col("id").as("node_id"), col("dist"))
      .orderBy(col("node_id"))
  }

  /** g09 — g08 plus the WITNESS ([[Graph.ssspPaths]]): per node the
    * argmin predecessor (ties on distance break to the smallest id —
    * a total order) and the full seed→node path from following the
    * parent forest, rendered as an id chain. The ORACLE re-derives
    * parents relationally — min src over edges satisfying
    * d(src) + w = d(dst) on the recursive-CTE distances — and walks
    * the same chain in a second recursive CTE, so both the label AND
    * the reconstruction are independently replayed. On the planted
    * graph this pins the interesting witnesses exactly: optimal paths
    * alternate chain and skip edges, and every heavy-shortcut label
    * improved in a later round must show its 2-hop chain replacement.
    */
  def g09(spark: SparkSession, dir: String): DataFrame = {
    val (edges, seeds) = ssspGraph(spark, dir)
    Graph.ssspPaths(edges, seeds, maxRounds = 16)
      .select(col("id").as("node_id"), col("dist"), col("parent"),
        (size(col("path")) - 1).as("n_hops"),
        expr("array_join(transform(path, x -> cast(x as string)), '->')")
          .as("path"))
      .orderBy(col("node_id"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "g01_pagerank" -> g01,
    "g02_triangles" -> g02,
    "g03_components" -> g03,
    "g04_clustering_coeff" -> g04,
    "g05_bfs_hops" -> g05,
    "g06_kcore" -> g06,
    "g07_trustrank" -> g07,
    "g08_sssp_weighted" -> g08,
    "g09_sssp_paths" -> g09
  )

  /** One peeling round: degrees of `prev`, survivors with deg ≥ 3,
    * surviving edges — mirrors one `Graph.kCore` iteration exactly.
    * Each round's edge CTE is MATERIALIZED: DuckDB inlines plain CTEs
    * per reference, and with 3 references per round a 12-round unroll
    * would otherwise expand exponentially (observed as an fd explosion
    * re-opening the parquet 3^12 times).
    */
  private def kcoreRound(i: Int, prev: String, k: Int): String =
    s"""kd$i AS (SELECT id, count(*) AS deg FROM (
       |    SELECT a AS id FROM $prev UNION ALL SELECT b FROM $prev) GROUP BY 1),
       |kk$i AS (SELECT id FROM kd$i WHERE deg >= $k),
       |ke$i AS MATERIALIZED (SELECT e.a, e.b FROM $prev e
       |         JOIN kk$i ka ON e.a = ka.id
       |         JOIN kk$i kb ON e.b = kb.id)""".stripMargin

  /** 3 unrolled PageRank iterations; all arithmetic mirrors
    * `Graph.pageRankFixed` exactly (integer div, damping 85/100).
    */
  private def iterCte(i: Int, prev: String): String =
    s"""c$i AS (SELECT e.dst, sum((r.rank * 85) // (d.deg * 100)) AS inflow
       |        FROM edges e JOIN $prev r ON e.src = r.id
       |        JOIN deg d ON e.src = d.src GROUP BY 1),
       |r$i AS (SELECT n.id, (150000000000 // nn.n) + coalesce(c$i.inflow, 0) AS rank
       |        FROM nodes n CROSS JOIN nn LEFT JOIN c$i ON n.id = c$i.dst)""".stripMargin

  /** 3 unrolled TrustRank iterations: g01's arithmetic with the
    * teleport base read from the seed-aware `b0` frame.
    */
  private def trustIterCte(i: Int, prev: String): String =
    s"""tc$i AS (SELECT e.dst, sum((r.rank * 85) // (d.deg * 100)) AS inflow
       |        FROM edges e JOIN $prev r ON e.src = r.id
       |        JOIN deg d ON e.src = d.src GROUP BY 1),
       |tr$i AS (SELECT b0.id, b0.base + coalesce(tc$i.inflow, 0) AS rank
       |        FROM b0 LEFT JOIN tc$i ON b0.id = tc$i.dst)""".stripMargin

  val oracles: Map[String, String] = Map(
    "g07_trustrank" ->
      s"""WITH sp AS (SELECT DISTINCT l_suppkey AS s, l_partkey + 1000000 AS p
         |           FROM lineitem),
         |edges AS (SELECT s AS src, p AS dst FROM sp
         |          UNION ALL SELECT p, s FROM sp),
         |deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY 1),
         |nodes AS (SELECT DISTINCT src AS id FROM edges),
         |seeds AS (SELECT DISTINCT s_suppkey AS id FROM supplier
         |          WHERE s_nationkey = (SELECT min(s_nationkey) FROM supplier)),
         |sn AS (SELECT count(*) AS s FROM seeds),
         |b0 AS (SELECT n.id,
         |         CASE WHEN sd.id IS NOT NULL
         |              THEN 1000000000000 // sn.s ELSE 0 END AS r0,
         |         CASE WHEN sd.id IS NOT NULL
         |              THEN 150000000000 // sn.s ELSE 0 END AS base
         |       FROM nodes n LEFT JOIN seeds sd ON n.id = sd.id CROSS JOIN sn),
         |tr0 AS (SELECT id, r0 AS rank FROM b0),
         |${trustIterCte(1, "tr0")},
         |${trustIterCte(2, "tr1")},
         |${trustIterCte(3, "tr2")}
         |SELECT id AS node_id,
         |  CASE WHEN id >= 1000000 THEN 'part' ELSE 'supplier' END AS node_type,
         |  CAST(rank AS BIGINT) AS rank
         |FROM tr3 ORDER BY rank DESC, node_id LIMIT 25""".stripMargin,
    "g01_pagerank" ->
      s"""WITH sp AS (SELECT DISTINCT l_suppkey AS s, l_partkey + 1000000 AS p
         |           FROM lineitem),
         |edges AS (SELECT s AS src, p AS dst FROM sp
         |          UNION ALL SELECT p, s FROM sp),
         |deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY 1),
         |nodes AS (SELECT DISTINCT src AS id FROM edges),
         |nn AS (SELECT count(*) AS n FROM nodes),
         |r0 AS (SELECT id, 1000000000000 // nn.n AS rank FROM nodes, nn),
         |${iterCte(1, "r0")},
         |${iterCte(2, "r1")},
         |${iterCte(3, "r2")}
         |SELECT id AS node_id,
         |  CASE WHEN id >= 1000000 THEN 'part' ELSE 'supplier' END AS node_type,
         |  CAST(rank AS BIGINT) AS rank
         |FROM r3 ORDER BY rank DESC, node_id LIMIT 25""".stripMargin,
    "g02_triangles" ->
      """WITH li AS (
        |  SELECT l_orderkey AS ok, l_linenumber AS ln, l_partkey AS pk
        |  FROM lineitem),
        |adj AS (
        |  SELECT DISTINCT least(x.pk, y.pk) AS a, greatest(x.pk, y.pk) AS b
        |  FROM li x JOIN li y ON x.ok = y.ok AND y.ln = x.ln + 1
        |  WHERE x.pk <> y.pk),
        |tri AS (
        |  SELECT ab.a AS x, ab.b AS y, bc.b AS z
        |  FROM adj ab
        |  JOIN adj bc ON ab.b = bc.a
        |  JOIN adj ac ON ac.a = ab.a AND ac.b = bc.b),
        |n AS (
        |  SELECT x AS part FROM tri
        |  UNION ALL SELECT y FROM tri
        |  UNION ALL SELECT z FROM tri)
        |SELECT part, CAST(count(*) AS BIGINT) AS n_triangles
        |FROM n GROUP BY 1
        |ORDER BY n_triangles DESC, part LIMIT 25""".stripMargin,
    "g03_components" ->
      """WITH RECURSIVE
        |o AS (SELECT o_orderkey AS id FROM
        |        (SELECT o_orderkey FROM orders ORDER BY o_orderkey LIMIT 500)),
        |c AS (SELECT id,
        |        lead(id) OVER (PARTITION BY id % 10 ORDER BY id) AS nxt
        |      FROM o),
        |e0 AS (SELECT id AS ia, nxt AS ib FROM c WHERE nxt IS NOT NULL
        |       UNION ALL
        |       SELECT id + 2000000, id + 2000000 FROM
        |         (SELECT id FROM o ORDER BY id LIMIT 20)),
        |edges AS (SELECT ia AS s, ib AS d FROM e0
        |          UNION ALL SELECT ib, ia FROM e0),
        |reach AS (SELECT s AS id, s AS lab FROM edges
        |          UNION
        |          SELECT e.d, reach.lab FROM reach JOIN edges e ON reach.id = e.s)
        |SELECT id, CAST(min(lab) AS BIGINT) AS label
        |FROM reach GROUP BY id ORDER BY id""".stripMargin,
    "g06_kcore" -> {
      val rounds = (1 to 12).map(i => kcoreRound(i, s"ke${i - 1}", 4)).mkString(",\n")
      s"""WITH ids AS MATERIALIZED (
         |  SELECT id, CAST(row_number() OVER (ORDER BY id) AS BIGINT) AS idx
         |  FROM (SELECT o_orderkey AS id FROM orders
         |        ORDER BY o_orderkey LIMIT 24)),
         |ke0 AS MATERIALIZED (
         |  SELECT x.id AS a, y.id AS b FROM ids x JOIN ids y ON
         |    (x.idx < y.idx AND y.idx <= 6) OR
         |    (y.idx >= 7 AND y.idx <= 14
         |      AND y.idx - x.idx <= 3 AND x.idx < y.idx) OR
         |    (x.idx >= 15 AND x.idx % 2 = 1 AND y.idx = x.idx + 1)),
         |$rounds
         |SELECT id, CAST(count(*) AS BIGINT) AS core_deg FROM (
         |  SELECT a AS id FROM ke12 UNION ALL SELECT b FROM ke12)
         |GROUP BY 1 ORDER BY id""".stripMargin
    },
    "g08_sssp_weighted" ->
      """WITH RECURSIVE
        |o AS (SELECT o_orderkey AS id FROM
        |        (SELECT o_orderkey FROM orders ORDER BY o_orderkey LIMIT 20)),
        |ix AS (SELECT id, row_number() OVER (ORDER BY id) AS idx FROM o),
        |e AS (SELECT x.id AS src, y.id AS dst,
        |        CASE WHEN y.idx = x.idx + 1 THEN 3
        |             WHEN y.idx = x.idx + 3 THEN 5
        |             ELSE 9 END AS w
        |      FROM ix x JOIN ix y ON
        |        (y.idx = x.idx + 1) OR (y.idx = x.idx + 3)
        |        OR (y.idx = x.idx + 2 AND x.idx % 4 = 1)),
        |seeds AS (SELECT id FROM ix WHERE idx IN (1, 15)),
        |reach(id, d, hops) AS (
        |  SELECT id, 0, 0 FROM seeds
        |  UNION ALL
        |  SELECT e.dst, reach.d + e.w, reach.hops + 1
        |  FROM reach JOIN e ON reach.id = e.src
        |  WHERE reach.hops < 19)
        |SELECT id AS node_id, CAST(min(d) AS BIGINT) AS dist
        |FROM reach GROUP BY id ORDER BY node_id""".stripMargin,
    // g09: g08's distance CTE + relational argmin parents (min src over
    // tight edges d(src) + w = d(dst); seeds self-parent) + a second
    // recursive CTE walking each parent chain to its seed. The chain is
    // acyclic because parents strictly decrease dist (w > 0), so the
    // walk's terminal row (cur's parent = cur) is unique per node.
    "g09_sssp_paths" ->
      """WITH RECURSIVE
        |o AS (SELECT o_orderkey AS id FROM
        |        (SELECT o_orderkey FROM orders ORDER BY o_orderkey LIMIT 20)),
        |ix AS (SELECT id, row_number() OVER (ORDER BY id) AS idx FROM o),
        |e AS (SELECT x.id AS src, y.id AS dst,
        |        CASE WHEN y.idx = x.idx + 1 THEN 3
        |             WHEN y.idx = x.idx + 3 THEN 5
        |             ELSE 9 END AS w
        |      FROM ix x JOIN ix y ON
        |        (y.idx = x.idx + 1) OR (y.idx = x.idx + 3)
        |        OR (y.idx = x.idx + 2 AND x.idx % 4 = 1)),
        |seeds AS (SELECT id FROM ix WHERE idx IN (1, 15)),
        |reach(id, d, hops) AS (
        |  SELECT id, 0, 0 FROM seeds
        |  UNION ALL
        |  SELECT e.dst, reach.d + e.w, reach.hops + 1
        |  FROM reach JOIN e ON reach.id = e.src
        |  WHERE reach.hops < 19),
        |dd AS (SELECT id, CAST(min(d) AS BIGINT) AS dist FROM reach GROUP BY id),
        |preds AS (SELECT e.dst AS id, min(e.src) AS p
        |          FROM e JOIN dd du ON e.src = du.id JOIN dd dv ON e.dst = dv.id
        |          WHERE du.dist + e.w = dv.dist GROUP BY e.dst),
        |par AS (SELECT dd.id,
        |          CASE WHEN s.id IS NOT NULL THEN dd.id ELSE preds.p END AS p
        |        FROM dd LEFT JOIN seeds s ON dd.id = s.id
        |        LEFT JOIN preds ON dd.id = preds.id),
        |pth(node_id, cur, nh, path) AS (
        |  SELECT id, id, 0, CAST(id AS VARCHAR) FROM dd
        |  UNION ALL
        |  SELECT pth.node_id, par.p, pth.nh + 1,
        |         CAST(par.p AS VARCHAR) || '->' || pth.path
        |  FROM pth JOIN par ON pth.cur = par.id
        |  WHERE par.p <> pth.cur),
        |term AS (SELECT pth.node_id, pth.nh, pth.path
        |         FROM pth JOIN par ON pth.cur = par.id
        |         WHERE par.p = pth.cur)
        |SELECT dd.id AS node_id, dd.dist, CAST(par.p AS BIGINT) AS parent,
        |  CAST(term.nh AS INT) AS n_hops, term.path
        |FROM dd JOIN par ON dd.id = par.id JOIN term ON dd.id = term.node_id
        |ORDER BY node_id""".stripMargin,
    "g05_bfs_hops" ->
      """WITH RECURSIVE
        |sp AS (SELECT DISTINCT l_suppkey AS s, l_partkey + 1000000 AS p
        |       FROM lineitem),
        |edges AS (SELECT s AS src, p AS dst FROM sp
        |          UNION ALL SELECT p, s FROM sp),
        |seeds AS (SELECT DISTINCT s_suppkey AS id FROM supplier
        |          WHERE s_nationkey = (SELECT min(s_nationkey) FROM supplier)),
        |reach AS (SELECT id, 0 AS d FROM seeds
        |          UNION
        |          SELECT e.dst, reach.d + 1 FROM reach
        |          JOIN edges e ON reach.id = e.src
        |          WHERE reach.d < 4)
        |SELECT id AS node_id,
        |  CASE WHEN id >= 1000000 THEN 'part' ELSE 'supplier' END AS node_type,
        |  CAST(min(d) AS INT) AS hops
        |FROM reach GROUP BY id ORDER BY node_id""".stripMargin,
    "g04_clustering_coeff" ->
      """WITH li AS (
        |  SELECT l_orderkey AS ok, l_linenumber AS ln, l_partkey AS pk
        |  FROM lineitem),
        |adj AS (
        |  SELECT DISTINCT least(x.pk, y.pk) AS a, greatest(x.pk, y.pk) AS b
        |  FROM li x JOIN li y ON x.ok = y.ok AND y.ln = x.ln + 1
        |  WHERE x.pk <> y.pk),
        |deg AS (
        |  SELECT part, CAST(count(*) AS BIGINT) AS deg FROM (
        |    SELECT a AS part FROM adj UNION ALL SELECT b FROM adj)
        |  GROUP BY 1),
        |tri AS (
        |  SELECT ab.a AS x, ab.b AS y, bc.b AS z
        |  FROM adj ab
        |  JOIN adj bc ON ab.b = bc.a
        |  JOIN adj ac ON ac.a = ab.a AND ac.b = bc.b),
        |tn AS (
        |  SELECT part, CAST(count(*) AS BIGINT) AS n_triangles FROM (
        |    SELECT x AS part FROM tri
        |    UNION ALL SELECT y FROM tri
        |    UNION ALL SELECT z FROM tri)
        |  GROUP BY 1)
        |SELECT d.part, d.deg,
        |  coalesce(tn.n_triangles, 0) AS n_triangles,
        |  round(CAST(2 * coalesce(tn.n_triangles, 0) AS DOUBLE)
        |    / (d.deg * (d.deg - 1)), 4) AS clustering_coeff
        |FROM deg d LEFT JOIN tn ON d.part = tn.part
        |WHERE d.deg >= 2
        |ORDER BY d.part""".stripMargin
  )
}
