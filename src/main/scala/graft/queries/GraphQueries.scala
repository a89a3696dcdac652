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
    val li = Tables.load(spark, dir, "lineitem")
      .select($"l_orderkey".as("ok"), $"l_linenumber".as("ln"),
        $"l_partkey".as("pk"))
    val x = li.as("x"); val y = li.as("y")
    val adj = x.join(y, col("x.ok") === col("y.ok") &&
        col("y.ln") === col("x.ln") + 1)
      .filter(col("x.pk") =!= col("y.pk"))
      .select(least(col("x.pk"), col("y.pk")).as("a"),
        greatest(col("x.pk"), col("y.pk")).as("b"))
      .distinct()
    Graph.triangles(adj)
      .select(explode(array($"x", $"y", $"z")).as("part"))
      .groupBy($"part").agg(count(lit(1)).as("n_triangles"))
      .orderBy($"n_triangles".desc, $"part")
      .limit(25)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "g01_pagerank" -> g01,
    "g02_triangles" -> g02
  )

  /** 3 unrolled PageRank iterations; all arithmetic mirrors
    * `Graph.pageRankFixed` exactly (integer div, damping 85/100).
    */
  private def iterCte(i: Int, prev: String): String =
    s"""c$i AS (SELECT e.dst, sum((r.rank * 85) // (d.deg * 100)) AS inflow
       |        FROM edges e JOIN $prev r ON e.src = r.id
       |        JOIN deg d ON e.src = d.src GROUP BY 1),
       |r$i AS (SELECT n.id, (150000000000 // nn.n) + coalesce(c$i.inflow, 0) AS rank
       |        FROM nodes n CROSS JOIN nn LEFT JOIN c$i ON n.id = c$i.dst)""".stripMargin

  val oracles: Map[String, String] = Map(
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
        |ORDER BY n_triangles DESC, part LIMIT 25""".stripMargin
  )
}
