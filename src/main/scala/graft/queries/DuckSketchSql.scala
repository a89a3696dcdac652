package graft.queries

import graft.operators.Similarity

/** DuckDB-SQL builders that replicate graft's native sketch math —
  * FNV-1a-64 over UTF-8 bytes + the splitmix64 finalizer
  * (`NativeExprs.hashUtf8`/`mix64`) and the deterministic hyperplane
  * constants (`Similarity.planeComponent`) — in pure SINGLE-STATEMENT
  * SQL, so the driver's DuckDB compare can hash-check the sketch
  * queries (d02/d03/s02/s03) exactly instead of rows-only.
  *
  * Mechanics of the port:
  *   - 64-bit wrapping arithmetic runs in HUGEINT with explicit
  *     `% 2^64`; wrapping multiply is split into 32-bit limbs
  *     (`mulmod64`) because a 64×64-bit product can overflow HUGEINT;
  *   - logical shift-right is integer division (values are kept
  *     unsigned in [0, 2^64)); signed views for comparisons/rendering
  *     subtract 2^64 above 2^63 (`toSigned`);
  *   - each splitmix stage is its own chained CTE so the per-row hash
  *     state is computed once per stage (no textual re-expansion);
  *   - FNV iterates `ord(substr(s,i,1))`, which equals the UTF-8 byte
  *     ONLY for ASCII text — asserted fine for the synthetic corpus
  *     (0 non-ASCII docs at every SF); a non-ASCII corpus would need a
  *     bytes-of-BLOB unnest instead.
  */
object DuckSketchSql {

  private val M = "18446744073709551616::HUGEINT" // 2^64
  private def u(x: Long): BigInt = BigInt(x) & ((BigInt(1) << 64) - 1)

  private val FnvBasis = u(-3750763034362895579L) // 0xCBF29CE484222325
  private val FnvPrime = 1099511628211L // 0x100000001B3 (fits: state*prime < 2^104)
  private val MixA = u(-7046029254386353131L) // 0x9E3779B97F4A7C15
  private val MixB = u(-4658895280553007687L) // 0xBF58476D1CE4E5B9
  private val MixC = u(-7723592293110705685L) // 0x94D049BB133111EB
  private val PermSeedU = u(graft.functions.NativeExprs.PermSeed)

  /** Low 64 bits of z*c via 32-bit limbs (z a HUGEINT expr in [0,2^64)). */
  private def mulmod64(z: String, c: BigInt): String =
    s"((($z) % 4294967296) * $c::HUGEINT + ((($z) // 4294967296) * $c::HUGEINT % 4294967296) * 4294967296) % $M"

  /** HUGEINT in [0,2^64) → the same 64-bit pattern as signed BIGINT. */
  private def toSigned(x: String): String =
    s"CAST(CASE WHEN ($x) >= 9223372036854775808::HUGEINT THEN ($x) - $M ELSE ($x) END AS BIGINT)"

  /** Raw FNV-1a-64 fold over the (ASCII) chars of string expr `s`. */
  private def fnvRaw(s: String): String =
    s"list_reduce(list_prepend($FnvBasis::HUGEINT, " +
      s"list_transform(range(1, length($s) + 1), fi -> ord(substr($s, fi, 1))::HUGEINT)), " +
      s"(fa, fb) -> (xor(fa, fb) * $FnvPrime::HUGEINT) % $M)"

  /** Chained CTEs applying the splitmix64 finalizer to column `z`,
    * carrying `carry` columns through. Returns (cteText, lastCteName);
    * the final stage exposes the mixed value as column `z`.
    */
  private def mix64Ctes(prefix: String, src: String, carry: Seq[String]): (String, String) = {
    val cs = if (carry.isEmpty) "" else carry.mkString("", ", ", ", ")
    val text =
      s"""${prefix}a AS (SELECT $cs(z + $MixA::HUGEINT) % $M AS z FROM $src),
         |${prefix}b AS (SELECT $cs${mulmod64("xor(z, z // 1073741824)", MixB)} AS z FROM ${prefix}a),
         |${prefix}c AS (SELECT $cs${mulmod64("xor(z, z // 134217728)", MixC)} AS z FROM ${prefix}b),
         |${prefix}d AS (SELECT ${cs}xor(z, z // 2147483648) AS z FROM ${prefix}c)""".stripMargin
    (text, s"${prefix}d")
  }

  private val normSql =
    "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"

  /** documents ∪ tail-truncated mutants — the planted structure shared
    * by d02/d03 (ids offset by 1e6).
    */
  private val mutantDocs =
    s"""n0 AS (SELECT doc_id, lang, $normSql AS norm FROM documents),
       |ad AS (SELECT doc_id, lang, norm FROM n0
       |       UNION ALL
       |       SELECT doc_id + 1000000, lang, substr(norm, 1, greatest(length(norm) - 15, 1)) FROM n0)""".stripMargin

  /** Per-(doc, token/shingle) hashUtf8 pipeline: unnest CTE `u0(doc_id, s)`
    * must exist; emits CTEs ending in `hh(doc_id, h)`.
    */
  private val hashPipeline: String = {
    val (mix, last) = mix64Ctes("f", "f0", Seq("doc_id"))
    s"""f0 AS (SELECT doc_id, ${fnvRaw("s")} AS z FROM u0),
       |$mix,
       |hh AS (SELECT doc_id, z AS h FROM $last)""".stripMargin
  }

  /** The full MinHash(32)+LSH(8×4) candidate machinery over any source
    * CTE with (doc_id, norm): word-3-shingles → per-shingle hashUtf8 →
    * 32-permutation signature (signed-min semantics) → band keys →
    * distinct candidate pairs. Emits CTEs `tk`/`sh` (token/shingle
    * arrays, reusable for exact verification), `sg(doc_id, sig)` and
    * `pr(id_a, id_b)`.
    */
  private def minhashCandidateCtes(src: String): String = {
    val (permMix, permLast) = mix64Ctes("p", "p0", Seq("doc_id", "i"))
    s"""tk AS (SELECT doc_id, string_split(norm, ' ') AS toks FROM $src),
       |sh AS (SELECT doc_id, list_distinct(list_transform(range(1, greatest(len(toks) - 2, 1) + 1),
       |         si -> array_to_string(list_slice(toks, si, si + 2), ' '))) AS shingles FROM tk),
       |u0 AS (SELECT doc_id, unnest(shingles) AS s FROM sh),
       |$hashPipeline,
       |p0 AS (SELECT doc_id, i, (h + ($PermSeedU::HUGEINT * i) % $M) % $M AS z
       |       FROM hh, range(0, 32) t(i)),
       |$permMix,
       |pv AS (SELECT doc_id, i, ${toSigned("z")} AS v FROM $permLast),
       |sv AS (SELECT doc_id, i, min(v) AS v FROM pv GROUP BY 1, 2),
       |sg AS (SELECT doc_id, list(v ORDER BY i) AS sig FROM sv GROUP BY 1),
       |bd AS (SELECT doc_id, b, array_to_string(sig[4*b+1 : 4*b+4], ',') AS bkey
       |       FROM sg, range(0, 8) t(b)),
       |pr AS (SELECT DISTINCT a.doc_id AS id_a, b2.doc_id AS id_b
       |       FROM bd a JOIN bd b2 ON a.b = b2.b AND a.bkey = b2.bkey AND a.doc_id < b2.doc_id)""".stripMargin
  }

  /** d02 — MinHash(32) + LSH(8×4) exactly as `MinHashSigExpr` +
    * `Dedup.lshCandidatePairsWithSigs` compute it.
    */
  val d02: String = {
    s"""WITH $mutantDocs,
       |${minhashCandidateCtes("ad")},
       |es AS (SELECT pr.id_a, pr.id_b,
       |         CAST(len(list_filter(range(1, 33), i -> sa.sig[i] = sb.sig[i])) AS DOUBLE) / 32 AS est
       |       FROM pr JOIN sg sa ON pr.id_a = sa.doc_id JOIN sg sb ON pr.id_b = sb.doc_id),
       |lg AS (SELECT es.*, ad.lang FROM es JOIN ad ON es.id_a = ad.doc_id)
       |SELECT lang, count(*) AS n_candidate_pairs,
       |  CAST(sum(CASE WHEN id_b = id_a + 1000000 THEN 1 ELSE 0 END) AS BIGINT) AS n_recovered_mutants,
       |  round(CAST(sum(CAST(floor(est * 10000.0 + 0.5) AS BIGINT)) AS DOUBLE) / count(*) / 10000.0, 4)
       |    AS avg_est_jaccard
       |FROM lg GROUP BY 1 ORDER BY lang""".stripMargin
  }

  /** d03 — SimHash(64) + 16-bit-chunk pigeonhole pairs exactly as
    * `SimHash64Expr` + `Dedup.simHashPairs` compute them.
    */
  val d03: String = {
    val pw64 = (0 until 64).map(i => (BigInt(1) << i).toString).mkString("[", ", ", "]::HUGEINT[]")
    s"""WITH $mutantDocs,
       |tk AS (SELECT doc_id, string_split(norm, ' ') AS toks FROM ad),
       |u0 AS (SELECT doc_id, unnest(toks) AS s FROM tk),
       |$hashPipeline,
       |pw AS (SELECT $pw64 AS p),
       |vt AS (SELECT doc_id, i, sum(CASE WHEN (h // p[i+1]) % 2 = 1 THEN 1 ELSE -1 END) AS vote
       |       FROM hh, range(0, 64) t(i), pw GROUP BY 1, 2),
       |sm AS (SELECT doc_id, sum(CASE WHEN vote > 0 THEN p[i+1] ELSE 0::HUGEINT END) AS sim
       |       FROM vt, pw GROUP BY 1),
       |cp AS (SELECT [1, 65536, 4294967296, 281474976710656]::HUGEINT[] AS c),
       |ch AS (SELECT doc_id, sim, k, CAST((sim // c[k+1]) % 65536 AS INT) AS chunk
       |       FROM sm, range(0, 4) t(k), cp),
       |pr AS (SELECT DISTINCT a.doc_id AS id_a, b2.doc_id AS id_b, a.sim AS sim_a, b2.sim AS sim_b
       |       FROM ch a JOIN ch b2 ON a.k = b2.k AND a.chunk = b2.chunk AND a.doc_id < b2.doc_id),
       |ds AS (SELECT id_a, id_b,
       |         bit_count(xor(${toSigned("sim_a")}, ${toSigned("sim_b")})) AS dist FROM pr),
       |fin AS (SELECT ds.*, ad.lang FROM ds JOIN ad ON ds.id_a = ad.doc_id WHERE dist <= 3)
       |SELECT lang, count(*) AS n_pairs,
       |  CAST(sum(CASE WHEN id_b = id_a + 1000000 THEN 1 ELSE 0 END) AS BIGINT) AS n_recovered_mutants,
       |  round(CAST(CAST(sum(dist) AS BIGINT) AS DOUBLE) / count(*), 3) AS avg_dist
       |FROM fin GROUP BY 1 ORDER BY lang""".stripMargin
  }

  /** d05 — winnowing recovery is 100% BY THEOREM for docs with
    * norm length ≥ w+k−1+15 = 28 (any shared substring of length
    * ≥ w+k−1 yields a shared fingerprint, and the doc↔mutant shared
    * prefix is norm minus 15 tail chars), so the exact per-language
    * recovered count is simply the qualifying doc count — no rolling-
    * hash port needed, and a broken winnow under-counts and fails.
    */
  val d05: String =
    s"""WITH n AS (SELECT lang, $normSql AS norm FROM documents)
       |SELECT lang, count(*) AS n_recovered_mutants
       |FROM n WHERE length(norm) >= 28 GROUP BY 1 ORDER BY lang""".stripMargin

  private def fixedVecSql(col: String): String =
    s"list_transform($col, x -> CAST(floor(CAST(x AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT))"

  private def dotSql(a: String, b: String): String =
    s"CAST(list_sum(list_transform(list_zip($a, $b), x -> x[1] * x[2])) AS BIGINT)"

  private def cosineSql(a: String, b: String, na: String, nb: String): String =
    s"CAST(${dotSql(a, b)} AS DOUBLE) / sqrt(CAST($na AS DOUBLE)) / sqrt(CAST($nb AS DOUBLE))"

  /** s02 — hyperplane-LSH ANN: the 4×64 deterministic plane constants
    * are embedded literally, so DuckDB derives the identical buckets.
    */
  val s02: String = {
    val planes = (0 until 4).map(p =>
      (0 until 64).map(d => Similarity.planeComponent(p, d)).mkString("[", ", ", "]"))
      .mkString("[", ", ", "]::BIGINT[][]")
    s"""WITH f AS (SELECT vec_id, ${fixedVecSql("embedding")} AS fv FROM embeddings),
       |n AS (SELECT vec_id, fv, CAST(list_sum(list_transform(fv, x -> x * x)) AS BIGINT) AS nsq FROM f),
       |pl AS (SELECT $planes AS p),
       |bk AS (SELECT vec_id, fv, nsq,
       |         list_sum(list_transform(range(1, 5), pi ->
       |           CASE WHEN list_sum(list_transform(range(1, 65), d -> fv[d] * p[pi][d])) >= 0
       |                THEN [1, 2, 4, 8][pi] ELSE 0 END)) AS bucket
       |       FROM n, pl),
       |q AS (SELECT vec_id AS query_id, fv AS qv, nsq AS qn, bucket FROM bk WHERE vec_id % 50 = 0),
       |s AS (SELECT q.query_id, c.vec_id AS cand_id,
       |        ${cosineSql("q.qv", "c.fv", "q.qn", "c.nsq")} AS cosine
       |      FROM q JOIN bk c ON q.bucket = c.bucket AND c.vec_id <> q.query_id),
       |r AS (SELECT *, CAST(row_number() OVER (PARTITION BY query_id
       |        ORDER BY cosine DESC, cand_id) AS INT) AS rnk FROM s)
       |SELECT query_id, cand_id, round(cosine, 6) AS cosine, rnk
       |FROM r WHERE rnk <= 5 ORDER BY query_id, rnk""".stripMargin
  }

  /** One Lloyd iteration as chained CTEs, parameterized by CTE-name
    * prefix, source CTE (must expose vec_id, fv, nsq), and dimension —
    * exact mirror of `Similarity.kmeansCentroidsFixed`: assign-by-cosine
    * (centroid_id tiebreak), elementwise floor(mean) update, empty
    * clusters keep the previous centroid. Returns (cteText, finalCte).
    * `l2 = true` mirrors the grouped trainer's integer-squared-L2
    * metric (residual codebooks — s07).
    */
  private def kmeansIterCtesGen(p: String, i: Int, prev: String,
                                src: String, dim: Int,
                                l2: Boolean = false): (String, String) = {
    val (key, ord) =
      if (l2) (s"c.nsq - 2 * ${dotSql("c.fv", "ct.centv")} + ct.centn", "ASC")
      else (cosineSql("c.fv", "ct.centv", "c.nsq", "ct.centn"), "DESC")
    val text =
      s"""${p}a$i AS (SELECT c.vec_id AS cand_id, c.fv, ct.centroid_id,
         |         $key AS c_key
         |       FROM $src c CROSS JOIN $prev ct),
         |${p}r$i AS (SELECT cand_id, fv, centroid_id FROM (
         |         SELECT *, row_number() OVER (PARTITION BY cand_id
         |           ORDER BY c_key $ord, centroid_id) AS r FROM ${p}a$i) WHERE r = 1),
         |${p}s$i AS (SELECT centroid_id, di,
         |           CAST(floor(CAST(CAST(sum(fv[di]) AS BIGINT) AS DOUBLE) / count(*)) AS BIGINT) AS nv
         |         FROM ${p}r$i, range(1, ${dim + 1}) d(di) GROUP BY 1, 2),
         |${p}u$i AS (SELECT centroid_id, list(nv ORDER BY di) AS newv FROM ${p}s$i GROUP BY 1),
         |${p}c$i AS (SELECT pv.centroid_id, COALESCE(u.newv, pv.centv) AS centv
         |         FROM $prev pv LEFT JOIN ${p}u$i u ON pv.centroid_id = u.centroid_id),
         |${p}n$i AS (SELECT centroid_id, centv,
         |           CAST(list_sum(list_transform(centv, x -> x * x)) AS BIGINT) AS centn FROM ${p}c$i)""".stripMargin
    (text, s"${p}n$i")
  }

  private def kmeansIterCtes(i: Int, prev: String): (String, String) = {
    val text =
      s"""ka$i AS (SELECT c.vec_id AS cand_id, c.fv, ct.centroid_id,
         |         ${cosineSql("c.fv", "ct.centv", "c.nsq", "ct.centn")} AS c_cos
         |       FROM n c CROSS JOIN $prev ct),
         |kr$i AS (SELECT cand_id, fv, centroid_id FROM (
         |         SELECT *, row_number() OVER (PARTITION BY cand_id
         |           ORDER BY c_cos DESC, centroid_id) AS r FROM ka$i) WHERE r = 1),
         |ks$i AS (SELECT centroid_id, di,
         |           CAST(floor(CAST(CAST(sum(fv[di]) AS BIGINT) AS DOUBLE) / count(*)) AS BIGINT) AS nv
         |         FROM kr$i, range(1, 65) d(di) GROUP BY 1, 2),
         |ku$i AS (SELECT centroid_id, list(nv ORDER BY di) AS newv FROM ks$i GROUP BY 1),
         |kc$i AS (SELECT p.centroid_id, COALESCE(u.newv, p.centv) AS centv
         |         FROM $prev p LEFT JOIN ku$i u ON p.centroid_id = u.centroid_id),
         |kn$i AS (SELECT centroid_id, centv,
         |           CAST(list_sum(list_transform(centv, x -> x * x)) AS BIGINT) AS centn FROM kc$i)""".stripMargin
    (text, s"kn$i")
  }

  /** s03 — IVF ANN: seeded 2-iteration fixed-point k-means centroids,
    * nearest-1 inverted lists, nprobe-4 probing, exact re-rank — the
    * exact `Similarity.ivfTopK` dataflow.
    */
  val s03: String = {
    val (it1, c1) = kmeansIterCtes(1, "cents")
    val (it2, c2) = kmeansIterCtes(2, c1)
    s"""WITH f AS (SELECT vec_id, ${fixedVecSql("embedding")} AS fv FROM embeddings),
       |n AS (SELECT vec_id, fv, CAST(list_sum(list_transform(fv, x -> x * x)) AS BIGINT) AS nsq FROM f),
       |cents AS (SELECT vec_id AS centroid_id, fv AS centv, nsq AS centn FROM n ORDER BY vec_id LIMIT 16),
       |$it1,
       |$it2,
       |ca AS (SELECT c.vec_id AS cand_id, c.fv AS cv, c.nsq AS cn, ct.centroid_id,
       |         ${cosineSql("c.fv", "ct.centv", "c.nsq", "ct.centn")} AS c_cos
       |       FROM n c CROSS JOIN $c2 ct),
       |lists AS (SELECT cand_id, cv, cn, centroid_id FROM (
       |         SELECT *, row_number() OVER (PARTITION BY cand_id
       |           ORDER BY c_cos DESC, centroid_id) AS r FROM ca) WHERE r = 1),
       |qa AS (SELECT q.vec_id AS query_id, q.fv AS qv, q.nsq AS qn, ct.centroid_id,
       |         ${cosineSql("q.fv", "ct.centv", "q.nsq", "ct.centn")} AS c_cos
       |       FROM (SELECT * FROM n WHERE vec_id % 50 = 0) q CROSS JOIN $c2 ct),
       |probes AS (SELECT query_id, qv, qn, centroid_id FROM (
       |         SELECT *, row_number() OVER (PARTITION BY query_id
       |           ORDER BY c_cos DESC, centroid_id) AS r FROM qa) WHERE r <= 4),
       |s AS (SELECT p.query_id, l.cand_id,
       |        ${cosineSql("p.qv", "l.cv", "p.qn", "l.cn")} AS cosine
       |      FROM probes p JOIN lists l ON p.centroid_id = l.centroid_id
       |      WHERE l.cand_id <> p.query_id),
       |r AS (SELECT *, CAST(row_number() OVER (PARTITION BY query_id
       |        ORDER BY cosine DESC, cand_id) AS INT) AS rnk FROM s)
       |SELECT query_id, cand_id, round(cosine, 6) AS cosine, rnk
       |FROM r WHERE rnk <= 5 ORDER BY query_id, rnk""".stripMargin
  }

  /** e02 — SemDeDup: 1-iteration fixed-point k-means with k DERIVED
    * from the corpus size by the same integer rule as
    * `Similarity.semdedupK` (max(8, ceil-div(count, 128)) — a scalar
    * subquery, so the one static SQL string adapts to any scale
    * factor), nearest-centroid assignment, exact within-cluster cosine
    * pairs at 0.999, recursive-CTE components, per-cluster
    * member/dropped counts — the exact `DataOps.e02` dataflow, every
    * stage replicated including the k derivation.
    */
  val e02: String = {
    val (it1, cfin) = kmeansIterCtesGen("ek", 1, "cents0", "n", 64)
    s"""WITH RECURSIVE
       |sub AS (
       |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ve
       |  FROM embeddings WHERE vec_id % 10 = 0
       |  UNION ALL
       |  SELECT vec_id + 100000,
       |         list_transform(embedding, x -> CAST(x AS DOUBLE) * 1.001)
       |  FROM embeddings WHERE vec_id % 10 = 0),
       |f AS (SELECT vec_id, ${fixedVecSql("ve")} AS fv FROM sub),
       |n AS (SELECT vec_id, fv,
       |        CAST(list_sum(list_transform(fv, x -> x * x)) AS BIGINT) AS nsq
       |      FROM f),
       |kk AS (SELECT greatest(8, (count(*) + 127) // 128) AS k FROM n),
       |cents0 AS (SELECT vec_id AS centroid_id, fv AS centv, nsq AS centn
       |           FROM (SELECT *, row_number() OVER (ORDER BY vec_id) AS rn
       |                 FROM n) t
       |           WHERE rn <= (SELECT k FROM kk)),
       |$it1,
       |asg0 AS (SELECT c.vec_id AS cand_id, c.fv, c.nsq, ct.centroid_id,
       |           ${cosineSql("c.fv", "ct.centv", "c.nsq", "ct.centn")} AS c_cos
       |         FROM n c CROSS JOIN $cfin ct),
       |asg AS (SELECT cand_id, fv, nsq, centroid_id FROM (
       |          SELECT *, row_number() OVER (PARTITION BY cand_id
       |            ORDER BY c_cos DESC, centroid_id) AS r FROM asg0) WHERE r = 1),
       |e0 AS (SELECT a.cand_id AS ia, b.cand_id AS ib
       |       FROM asg a JOIN asg b
       |         ON a.centroid_id = b.centroid_id AND a.cand_id < b.cand_id
       |       WHERE ${cosineSql("a.fv", "b.fv", "a.nsq", "b.nsq")} >= 0.999),
       |edges AS (SELECT ia AS s, ib AS d FROM e0 UNION ALL SELECT ib, ia FROM e0),
       |reach AS (
       |  SELECT vec_id AS id, vec_id AS lab FROM n
       |  UNION
       |  SELECT e.d, reach.lab FROM reach JOIN edges e ON reach.id = e.s),
       |lab AS (SELECT id, min(lab) AS label FROM reach GROUP BY id),
       |drp AS (SELECT id FROM lab WHERE id <> label)
       |SELECT asg.centroid_id, CAST(count(*) AS BIGINT) AS n_members,
       |  CAST(sum(CASE WHEN drp.id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_dropped
       |FROM asg LEFT JOIN drp ON asg.cand_id = drp.id
       |GROUP BY 1 ORDER BY centroid_id""".stripMargin
  }

  /** p01 — the composed corpus-clean pipeline: exact dedup → MinHash-LSH
    * candidates → EXACT word-shingle Jaccard verify (≥ 0.7) → connected
    * components → drop non-representatives → quality filter (score ≥ 50)
    * → language-ID agreement filter → per-language stats. Every stage is
    * the exact SQL twin of the Spark stage (`Pipeline.p01`).
    */
  val p01: String =
    s"""WITH RECURSIVE
       |n0 AS (SELECT doc_id, lang, text, $normSql AS norm FROM documents),
       |ex AS (SELECT doc_id, lang, text, norm FROM (
       |       SELECT *, row_number() OVER (PARTITION BY lang, md5(norm) ORDER BY doc_id) AS rn
       |       FROM n0) WHERE rn = 1),
       |${minhashCandidateCtes("ex")},
       |vf AS (SELECT pr.id_a, pr.id_b
       |       FROM pr JOIN sh sa ON pr.id_a = sa.doc_id JOIN sh sb ON pr.id_b = sb.doc_id
       |            JOIN ex ea ON pr.id_a = ea.doc_id JOIN ex eb ON pr.id_b = eb.doc_id
       |       WHERE ea.lang = eb.lang
       |         AND CAST(len(list_intersect(sa.shingles, sb.shingles)) AS DOUBLE)
       |             / (len(sa.shingles) + len(sb.shingles) - len(list_intersect(sa.shingles, sb.shingles)))
       |             >= 0.7),
       |edges AS (SELECT id_a AS s, id_b AS d FROM vf UNION ALL SELECT id_b, id_a FROM vf),
       |ids AS (SELECT DISTINCT s AS id FROM edges),
       |reach AS (SELECT id, id AS lab FROM ids
       |          UNION
       |          SELECT e.d, reach.lab FROM reach JOIN edges e ON reach.id = e.s),
       |lab AS (SELECT id, min(lab) AS label FROM reach GROUP BY id),
       |losers AS (SELECT id FROM lab WHERE label <> id),
       |sv2 AS (SELECT ex.* FROM ex LEFT JOIN losers ON ex.doc_id = losers.id
       |        WHERE losers.id IS NULL),
       |ft AS (SELECT lang, norm,
       |         length(text) AS n_chars_t,
       |         len(regexp_extract_all(text, '\\S+')) AS n_toks,
       |         len(list_filter(string_split(norm, ' '),
       |           t -> list_contains(['the','a','an','and','or','of','to','in','is','are'], t)))
       |           AS n_stop,
       |         len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) AS n_punct
       |       FROM sv2),
       |sc AS (SELECT lang, norm, n_toks,
       |         (CASE WHEN n_chars_t >= 200 AND n_chars_t <= 2000 THEN 40.0
       |               WHEN n_chars_t >= 50 THEN 20.0 ELSE 0.0 END
       |          + CASE WHEN CAST(n_chars_t AS DOUBLE) / n_toks >= 3.0
       |                 AND CAST(n_chars_t AS DOUBLE) / n_toks <= 10.0 THEN 30.0 ELSE 10.0 END
       |          + CASE WHEN CAST(n_stop AS DOUBLE) / n_toks >= 0.05 THEN 20.0 ELSE 5.0 END
       |          + CASE WHEN CAST(n_punct AS DOUBLE) / n_chars_t <= 0.1 THEN 10.0 ELSE 0.0 END)
       |           AS score
       |       FROM ft),
       |qf AS (SELECT * FROM sc WHERE score >= 50),
       |tk2 AS (SELECT lang, n_toks, score, string_split(norm, ' ') AS toks FROM qf),
       |ld AS (SELECT lang, n_toks, score,
       |         len(list_filter(toks, t -> list_contains(['the','and','of','is','to'], t))) AS s_en,
       |         len(list_filter(toks, t -> list_contains(['der','die','das','und','ist'], t))) AS s_de,
       |         len(list_filter(toks, t -> list_contains(['el','la','de','y','es'], t))) AS s_es,
       |         len(list_filter(toks, t -> list_contains(['le','la','et','de','est'], t))) AS s_fr
       |       FROM tk2),
       |pred AS (SELECT lang, n_toks, score,
       |         CASE WHEN greatest(s_en, s_de, s_es, s_fr) > 0
       |                   AND s_en = greatest(s_en, s_de, s_es, s_fr) THEN 'en'
       |              WHEN greatest(s_en, s_de, s_es, s_fr) > 0
       |                   AND s_de = greatest(s_en, s_de, s_es, s_fr) THEN 'de'
       |              WHEN greatest(s_en, s_de, s_es, s_fr) > 0
       |                   AND s_es = greatest(s_en, s_de, s_es, s_fr) THEN 'es'
       |              WHEN greatest(s_en, s_de, s_es, s_fr) > 0
       |                   AND s_fr = greatest(s_en, s_de, s_es, s_fr) THEN 'fr'
       |              ELSE 'und' END AS predicted_lang
       |       FROM ld),
       |kept AS (SELECT * FROM pred WHERE predicted_lang = lang OR predicted_lang = 'und')
       |SELECT lang, count(*) AS n_docs,
       |  CAST(sum(n_toks) AS BIGINT) AS total_tokens,
       |  round(CAST(sum(CAST(floor(score * 100.0 + 0.5) AS BIGINT)) AS DOUBLE) / count(*) / 100.0, 2)
       |    AS avg_score
       |FROM kept GROUP BY 1 ORDER BY lang""".stripMargin

  /** h01 — HyperLogLog distinct customers per priority: the exact
    * splitmix64 mix on the raw key (HUGEINT mod-2^64), register = top 8
    * bits, rho via bin()-string bit length (mirrors Spark's conv-based
    * form — both are exact integer/string semantics), harmonic sum as
    * exact HUGEINT, and the raw-estimator double expression written in
    * the IDENTICAL literal/op order as `Hll.estimate`.
    */
  val h01: String = {
    val (mix, last) = mix64Ctes("h", "z0", Seq("prio"))
    val P2_56 = "72057594037927936" // 2^56
    val P2_57d = "144115188075855872.0" // 2^57 as double literal
    s"""WITH k AS (SELECT DISTINCT o_orderpriority AS prio, o_custkey AS key FROM orders),
       |z0 AS (SELECT prio, key::HUGEINT AS z FROM k),
       |$mix,
       |r AS (SELECT prio, z // $P2_56 AS j,
       |        CAST(z % $P2_56 AS BIGINT) AS low FROM $last),
       |rr AS (SELECT prio, j,
       |        CASE WHEN low = 0 THEN 57 ELSE 57 - length(bin(low)) END AS rho FROM r),
       |reg AS (SELECT prio, j, max(rho) AS rho_max FROM rr GROUP BY 1, 2),
       |ag AS (SELECT prio,
       |        sum(CAST((1::BIGINT << (57 - rho_max)) AS HUGEINT)) AS s_hit,
       |        count(*) AS n_hit FROM reg GROUP BY 1),
       |est AS (SELECT prio, n_hit,
       |        (0.7213 / (1.0 + 1.079 / 256.0)) * 65536.0 * $P2_57d
       |          / CAST(s_hit + (256 - n_hit)::HUGEINT * $P2_56::HUGEINT * 2::HUGEINT AS DOUBLE)
       |          AS e
       |        FROM ag),
       |ex AS (SELECT o_orderpriority AS prio, count(DISTINCT o_custkey) AS n_exact
       |       FROM orders GROUP BY 1)
       |SELECT est.prio, ex.n_exact, round(est.e, 2) AS hll_estimate,
       |  round((est.e - ex.n_exact) / ex.n_exact, 4) AS rel_err,
       |  CAST(est.n_hit AS BIGINT) AS n_registers_hit
       |FROM est JOIN ex ON est.prio = ex.prio
       |ORDER BY 1""".stripMargin
  }

  /** One PQ subspace's CTE block: subvector slice, seeded codebook
    * (1 Lloyd iteration — mirrors `pqTopK(kmeansIters = 1)`), candidate
    * codes, query distance table. Shared by s04 and s05.
    */
  private def pqPieceCtes(i: Int, sub: Int): String = {
    val lo = i * sub + 1; val hi = (i + 1) * sub
    val (it1, c2) = kmeansIterCtesGen(s"k$i", 1, s"cs$i", s"ns$i", sub)
    s"""ns$i AS (SELECT vec_id, list_slice(fv, $lo, $hi) AS fv,
       |         CAST(list_sum(list_transform(list_slice(fv, $lo, $hi), x -> x * x)) AS BIGINT) AS nsq
       |       FROM n),
       |cs$i AS (SELECT vec_id AS centroid_id, fv AS centv, nsq AS centn
       |        FROM ns$i ORDER BY vec_id LIMIT 16),
       |$it1,
       |enc$i AS (SELECT cand_id, $i AS sub, centroid_id AS code FROM (
       |         SELECT c.vec_id AS cand_id, ct.centroid_id,
       |           row_number() OVER (PARTITION BY c.vec_id
       |             ORDER BY ${cosineSql("c.fv", "ct.centv", "c.nsq", "ct.centn")} DESC,
       |                      ct.centroid_id) AS r
       |         FROM ns$i c CROSS JOIN $c2 ct) WHERE r = 1),
       |dt$i AS (SELECT qq.vec_id AS query_id, $i AS sub, ct.centroid_id AS code,
       |           ${dotSql("qq.fv", "ct.centv")} AS partial
       |         FROM (SELECT * FROM ns$i WHERE vec_id % 50 = 0) qq
       |         CROSS JOIN $c2 ct)""".stripMargin
  }

  /** s04 — product quantization: per-subspace codebooks, candidate
    * codes, per-query distance tables, approx-dot shortlist, exact
    * re-rank — the full `Similarity.pqTopK` dataflow in one statement.
    */
  val s04: String = {
    val m = 4; val sub = 16; val shortlistN = 50
    val pieces = (0 until m).map(i => pqPieceCtes(i, sub))
    s"""WITH f AS (SELECT vec_id, ${fixedVecSql("embedding")} AS fv FROM embeddings),
       |n AS (SELECT vec_id, fv, CAST(list_sum(list_transform(fv, x -> x * x)) AS BIGINT) AS nsq FROM f),
       |${pieces.mkString(",\n")},
       |enc AS (${(0 until m).map(i => s"SELECT * FROM enc$i").mkString(" UNION ALL ")}),
       |dts AS (${(0 until m).map(i => s"SELECT * FROM dt$i").mkString(" UNION ALL ")}),
       |ap AS (SELECT d.query_id, e.cand_id, CAST(sum(d.partial) AS BIGINT) AS ad
       |       FROM enc e JOIN dts d ON e.sub = d.sub AND e.code = d.code
       |       WHERE d.query_id <> e.cand_id GROUP BY 1, 2),
       |sc AS (SELECT ap.query_id, ap.cand_id,
       |         CAST(ap.ad AS DOUBLE) / sqrt(CAST(qn.nsq AS DOUBLE)) / sqrt(CAST(cn.nsq AS DOUBLE)) AS approx_cos
       |       FROM ap JOIN n qn ON ap.query_id = qn.vec_id
       |            JOIN n cn ON ap.cand_id = cn.vec_id),
       |short AS (SELECT query_id, cand_id FROM (
       |         SELECT *, row_number() OVER (PARTITION BY query_id
       |           ORDER BY approx_cos DESC, cand_id) AS srnk FROM sc) WHERE srnk <= $shortlistN),
       |rr AS (SELECT s.query_id, s.cand_id,
       |         ${cosineSql("qn.fv", "cn.fv", "qn.nsq", "cn.nsq")} AS cosine
       |       FROM short s JOIN n qn ON s.query_id = qn.vec_id
       |            JOIN n cn ON s.cand_id = cn.vec_id),
       |fin AS (SELECT *, CAST(row_number() OVER (PARTITION BY query_id
       |         ORDER BY cosine DESC, cand_id) AS INT) AS rnk FROM rr)
       |SELECT query_id, cand_id, round(cosine, 6) AS cosine, rnk
       |FROM fin WHERE rnk <= 5 ORDER BY query_id, rnk""".stripMargin
  }

  /** s05 — IVF-PQ composition: full-vector coarse quantizer (16
    * centroids, 1 Lloyd iteration) builds inverted lists; queries probe
    * their 4 nearest lists; only probed pairs are PQ-scored via the
    * shared subspace tables; exact re-rank — the exact
    * `Similarity.ivfPqTopK` dataflow.
    */
  val s05: String = {
    val m = 4; val sub = 16; val shortlistN = 50; val nprobe = 4
    val pieces = (0 until m).map(i => pqPieceCtes(i, sub))
    val (cit, ccLast) = kmeansIterCtesGen("cc", 1, "cc0", "n", 64)
    s"""WITH f AS (SELECT vec_id, ${fixedVecSql("embedding")} AS fv FROM embeddings),
       |n AS (SELECT vec_id, fv, CAST(list_sum(list_transform(fv, x -> x * x)) AS BIGINT) AS nsq FROM f),
       |cc0 AS (SELECT vec_id AS centroid_id, fv AS centv, nsq AS centn
       |        FROM n ORDER BY vec_id LIMIT 16),
       |$cit,
       |la AS (SELECT c.vec_id AS cand_id, ct.centroid_id,
       |         ${cosineSql("c.fv", "ct.centv", "c.nsq", "ct.centn")} AS c_cos
       |       FROM n c CROSS JOIN $ccLast ct),
       |lists AS (SELECT cand_id, centroid_id FROM (
       |         SELECT *, row_number() OVER (PARTITION BY cand_id
       |           ORDER BY c_cos DESC, centroid_id) AS r FROM la) WHERE r = 1),
       |qa AS (SELECT qv.vec_id AS query_id, ct.centroid_id,
       |         ${cosineSql("qv.fv", "ct.centv", "qv.nsq", "ct.centn")} AS c_cos
       |       FROM (SELECT * FROM n WHERE vec_id % 50 = 0) qv CROSS JOIN $ccLast ct),
       |probes AS (SELECT query_id, centroid_id FROM (
       |         SELECT *, row_number() OVER (PARTITION BY query_id
       |           ORDER BY c_cos DESC, centroid_id) AS r FROM qa) WHERE r <= $nprobe),
       |pairs AS (SELECT p.query_id, l.cand_id
       |          FROM probes p JOIN lists l ON p.centroid_id = l.centroid_id),
       |${pieces.mkString(",\n")},
       |enc AS (${(0 until m).map(i => s"SELECT * FROM enc$i").mkString(" UNION ALL ")}),
       |dts AS (${(0 until m).map(i => s"SELECT * FROM dt$i").mkString(" UNION ALL ")}),
       |ap AS (SELECT pr.query_id, pr.cand_id, CAST(sum(d.partial) AS BIGINT) AS ad
       |       FROM pairs pr
       |       JOIN enc e ON pr.cand_id = e.cand_id
       |       JOIN dts d ON d.query_id = pr.query_id AND d.sub = e.sub AND d.code = e.code
       |       WHERE pr.query_id <> pr.cand_id GROUP BY 1, 2),
       |sc AS (SELECT ap.query_id, ap.cand_id,
       |         CAST(ap.ad AS DOUBLE) / sqrt(CAST(qn.nsq AS DOUBLE)) / sqrt(CAST(cn.nsq AS DOUBLE)) AS approx_cos
       |       FROM ap JOIN n qn ON ap.query_id = qn.vec_id
       |            JOIN n cn ON ap.cand_id = cn.vec_id),
       |short AS (SELECT query_id, cand_id FROM (
       |         SELECT *, row_number() OVER (PARTITION BY query_id
       |           ORDER BY approx_cos DESC, cand_id) AS srnk FROM sc) WHERE srnk <= $shortlistN),
       |rr AS (SELECT s.query_id, s.cand_id,
       |         ${cosineSql("qn.fv", "cn.fv", "qn.nsq", "cn.nsq")} AS cosine
       |       FROM short s JOIN n qn ON s.query_id = qn.vec_id
       |            JOIN n cn ON s.cand_id = cn.vec_id),
       |fin AS (SELECT *, CAST(row_number() OVER (PARTITION BY query_id
       |         ORDER BY cosine DESC, cand_id) AS INT) AS rnk FROM rr)
       |SELECT query_id, cand_id, round(cosine, 6) AS cosine, rnk
       |FROM fin WHERE rnk <= 5 ORDER BY query_id, rnk""".stripMargin
  }

  /** One RESIDUAL PQ subspace: residual slice + norms, seeded L2
    * codebook (1 Lloyd iteration), L2-encoded candidate codes, and the
    * query distance table of RAW query subvectors against residual
    * codewords (the inner-product decomposition needs no query
    * residual). Mirrors the grouped L2 trainer bit for bit.
    */
  private def resPqPieceCtes(i: Int, sub: Int): String = {
    val lo = i * sub + 1; val hi = (i + 1) * sub
    val (it1, c2) = kmeansIterCtesGen(s"rk$i", 1, s"rcs$i", s"rs$i", sub, l2 = true)
    s"""rs$i AS (SELECT cand_id AS vec_id, list_slice(rv, $lo, $hi) AS fv,
       |         CAST(list_sum(list_transform(list_slice(rv, $lo, $hi), x -> x * x)) AS BIGINT) AS nsq
       |       FROM res),
       |rcs$i AS (SELECT vec_id AS centroid_id, fv AS centv, nsq AS centn
       |        FROM rs$i ORDER BY vec_id LIMIT 16),
       |$it1,
       |renc$i AS (SELECT cand_id, $i AS sub, centroid_id AS code FROM (
       |         SELECT c.vec_id AS cand_id, ct.centroid_id,
       |           row_number() OVER (PARTITION BY c.vec_id
       |             ORDER BY c.nsq - 2 * ${dotSql("c.fv", "ct.centv")} + ct.centn ASC,
       |                      ct.centroid_id) AS r
       |         FROM rs$i c CROSS JOIN $c2 ct) WHERE r = 1),
       |rdt$i AS (SELECT qq.vec_id AS query_id, $i AS sub, ct.centroid_id AS code,
       |           ${dotSql("qq.fv", "ct.centv")} AS partial
       |         FROM (SELECT vec_id, list_slice(fv, $lo, $hi) AS fv
       |               FROM n WHERE vec_id % 50 = 0) qq
       |         CROSS JOIN $c2 ct)""".stripMargin
  }

  /** s07 — residual IVF-PQ (IVFADC): coarse quantizer + inverted lists
    * + nprobe probing exactly as s05, then PQ over RESIDUALS with L2
    * codebooks, scored via q·x = q·c(x) + Σ table lookups, exact
    * shortlist re-rank — the full `Similarity.ivfPqResidualTopK`
    * dataflow in one statement.
    */
  val s07: String = {
    val m = 4; val sub = 16; val shortlistN = 50; val nprobe = 4
    val (cit, ccLast) = kmeansIterCtesGen("cc", 1, "cc0", "n", 64)
    val pieces = (0 until m).map(i => resPqPieceCtes(i, sub))
    s"""WITH f AS (SELECT vec_id, ${fixedVecSql("embedding")} AS fv FROM embeddings),
       |n AS (SELECT vec_id, fv, CAST(list_sum(list_transform(fv, x -> x * x)) AS BIGINT) AS nsq FROM f),
       |cc0 AS (SELECT vec_id AS centroid_id, fv AS centv, nsq AS centn
       |        FROM n ORDER BY vec_id LIMIT 16),
       |$cit,
       |la AS (SELECT c.vec_id AS cand_id, ct.centroid_id,
       |         ${cosineSql("c.fv", "ct.centv", "c.nsq", "ct.centn")} AS c_cos
       |       FROM n c CROSS JOIN $ccLast ct),
       |lists AS (SELECT cand_id, centroid_id FROM (
       |         SELECT *, row_number() OVER (PARTITION BY cand_id
       |           ORDER BY c_cos DESC, centroid_id) AS r FROM la) WHERE r = 1),
       |qa AS (SELECT qv.vec_id AS query_id, ct.centroid_id,
       |         ${cosineSql("qv.fv", "ct.centv", "qv.nsq", "ct.centn")} AS c_cos
       |       FROM (SELECT * FROM n WHERE vec_id % 50 = 0) qv CROSS JOIN $ccLast ct),
       |probes AS (SELECT query_id, centroid_id FROM (
       |         SELECT *, row_number() OVER (PARTITION BY query_id
       |           ORDER BY c_cos DESC, centroid_id) AS r FROM qa) WHERE r <= $nprobe),
       |res AS (SELECT l.cand_id,
       |          list_transform(list_zip(c.fv, ct.centv), x -> x[1] - x[2]) AS rv
       |        FROM lists l JOIN n c ON l.cand_id = c.vec_id
       |        JOIN $ccLast ct ON l.centroid_id = ct.centroid_id),
       |${pieces.mkString(",\n")},
       |enc AS (${(0 until m).map(i => s"SELECT * FROM renc$i").mkString(" UNION ALL ")}),
       |dts AS (${(0 until m).map(i => s"SELECT * FROM rdt$i").mkString(" UNION ALL ")}),
       |qc AS (SELECT p.query_id, p.centroid_id,
       |         ${dotSql("qv.fv", "ct.centv")} AS qcv
       |       FROM probes p JOIN n qv ON p.query_id = qv.vec_id
       |       JOIN $ccLast ct ON p.centroid_id = ct.centroid_id),
       |pairs AS (SELECT p.query_id, p.centroid_id, l.cand_id
       |          FROM probes p JOIN lists l ON p.centroid_id = l.centroid_id),
       |ap0 AS (SELECT pr.query_id, pr.centroid_id, pr.cand_id,
       |          CAST(sum(d.partial) AS BIGINT) AS rsum
       |        FROM pairs pr
       |        JOIN enc e ON pr.cand_id = e.cand_id
       |        JOIN dts d ON d.query_id = pr.query_id AND d.sub = e.sub AND d.code = e.code
       |        GROUP BY 1, 2, 3),
       |ap AS (SELECT a.query_id, a.cand_id, a.rsum + q.qcv AS ad
       |       FROM ap0 a JOIN qc q
       |         ON a.query_id = q.query_id AND a.centroid_id = q.centroid_id
       |       WHERE a.query_id <> a.cand_id),
       |sc AS (SELECT ap.query_id, ap.cand_id,
       |         CAST(ap.ad AS DOUBLE) / sqrt(CAST(qn.nsq AS DOUBLE)) / sqrt(CAST(cn.nsq AS DOUBLE)) AS approx_cos
       |       FROM ap JOIN n qn ON ap.query_id = qn.vec_id
       |            JOIN n cn ON ap.cand_id = cn.vec_id),
       |short AS (SELECT query_id, cand_id FROM (
       |         SELECT *, row_number() OVER (PARTITION BY query_id
       |           ORDER BY approx_cos DESC, cand_id) AS srnk FROM sc) WHERE srnk <= $shortlistN),
       |rr AS (SELECT s.query_id, s.cand_id,
       |         ${cosineSql("qn.fv", "cn.fv", "qn.nsq", "cn.nsq")} AS cosine
       |       FROM short s JOIN n qn ON s.query_id = qn.vec_id
       |            JOIN n cn ON s.cand_id = cn.vec_id),
       |fin AS (SELECT *, CAST(row_number() OVER (PARTITION BY query_id
       |         ORDER BY cosine DESC, cand_id) AS INT) AS rnk FROM rr)
       |SELECT query_id, cand_id, round(cosine, 6) AS cosine, rnk
       |FROM fin WHERE rnk <= 5 ORDER BY query_id, rnk""".stripMargin
  }

  /** h03 — Count-Min: hash each DISTINCT token once (occurrence-
    * weighted cell sums ≡ per-occurrence increments), 10-bit position
    * slices, min-over-rows estimates for the exact top-20.
    */
  /** c19 — span-corruption masks: identical integer span/segment
    * arithmetic, identical splitmix64 offset hash ((z // 2) % slack ≡
    * Spark's (mix >>> 1) % room on the unsigned value). Span index j
    * comes from `unnest(range(0, n_spans, 1))` (the lateral-range
    * column-bound gotcha).
    */
  val c19: String = {
    val carry = Seq("doc_id", "n", "n_mask", "n_spans", "j")
    val (mix, last) = mix64Ctes("sc", "c19z0", carry)
    s"""WITH c19b AS (
       |  SELECT doc_id,
       |    CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT) AS n
       |  FROM documents),
       |c19p AS (
       |  SELECT doc_id, n, n * 15 // 100 AS n_mask FROM c19b
       |  WHERE n * 15 // 100 >= 1),
       |c19s AS (
       |  SELECT doc_id, n, n_mask, greatest(1, n_mask // 3) AS n_spans
       |  FROM c19p),
       |c19j AS (
       |  SELECT doc_id, n, n_mask, n_spans,
       |    unnest(range(0, n_spans, 1)) AS j
       |  FROM c19s),
       |c19z0 AS (
       |  SELECT doc_id, n, n_mask, n_spans, j,
       |    (doc_id * 31 + j)::HUGEINT AS z
       |  FROM c19j),
       |$mix,
       |c19f AS (
       |  SELECT doc_id, n, n_spans, j, z,
       |    n_mask // n_spans
       |      + CASE WHEN j < n_mask % n_spans THEN 1 ELSE 0 END AS len,
       |    (n * j) // n_spans AS seg_start,
       |    (n * (j + 1)) // n_spans AS seg_end
       |  FROM $last)
       |SELECT doc_id, CAST(j + 1 AS BIGINT) AS span_k,
       |  CAST(seg_start
       |    + CAST((z // 2) % (seg_end - seg_start - len + 1)::HUGEINT AS BIGINT)
       |    + 1 AS BIGINT) AS start,
       |  CAST(len AS BIGINT) AS len
       |FROM c19f ORDER BY doc_id, span_k""".stripMargin
  }

  /** h04 — KMV set algebra: the exact splitmix64 mix (HUGEINT
    * mod-2^64) per key set, bottom-256 via ORDER BY z LIMIT, and the
    * estimate written operand-for-operand like `Kmv.estimate` — the
    * signed `uh` (z − 2^63 as BIGINT) cast to double then re-offset by
    * 2^63.0, so both engines perform the IDENTICAL long→double rounding
    * before the one divide (casting the unsigned HUGEINT directly could
    * double-round differently).
    */
  val h04: String = {
    val (mixA, lastA) = mix64Ctes("kva", "za0", Seq("key"))
    val (mixB, lastB) = mix64Ctes("kvb", "zb0", Seq("key"))
    val (mixU, lastU) = mix64Ctes("kvu", "zu0", Seq("key"))
    def est(uh: String, n: String) =
      s"CASE WHEN $n < 256 THEN CAST($n AS DOUBLE) ELSE " +
        s"(255.0 * 18446744073709551616.0) / (CAST($uh AS DOUBLE) + 9223372036854775808.0) END"
    s"""WITH a0 AS (SELECT DISTINCT o_custkey AS key FROM orders
       |            WHERE year(o_orderdate) = 1995),
       |b0 AS (SELECT DISTINCT o_custkey AS key FROM orders
       |       WHERE year(o_orderdate) = 1996),
       |u0 AS (SELECT key FROM a0 UNION SELECT key FROM b0),
       |za0 AS (SELECT key, key::HUGEINT AS z FROM a0),
       |zb0 AS (SELECT key, key::HUGEINT AS z FROM b0),
       |zu0 AS (SELECT key, key::HUGEINT AS z FROM u0),
       |$mixA,
       |$mixB,
       |$mixU,
       |ska AS (SELECT z FROM $lastA ORDER BY z LIMIT 256),
       |skb AS (SELECT z FROM $lastB ORDER BY z LIMIT 256),
       |sku AS (SELECT key, z FROM $lastU ORDER BY z LIMIT 256),
       |mx AS (SELECT
       |  (SELECT CAST(max(z) - 9223372036854775808::HUGEINT AS BIGINT) FROM ska) AS uh_a,
       |  (SELECT CAST(max(z) - 9223372036854775808::HUGEINT AS BIGINT) FROM skb) AS uh_b,
       |  (SELECT CAST(max(z) - 9223372036854775808::HUGEINT AS BIGINT) FROM sku) AS uh_u,
       |  (SELECT CAST(count(*) AS BIGINT) FROM a0) AS n_a,
       |  (SELECT CAST(count(*) AS BIGINT) FROM b0) AS n_b,
       |  (SELECT CAST(count(*) AS BIGINT) FROM u0) AS n_union,
       |  (SELECT CAST(count(*) AS BIGINT) FROM a0
       |     WHERE key IN (SELECT key FROM b0)) AS n_inter,
       |  (SELECT CAST(count(*) AS BIGINT) FROM sku
       |     WHERE key IN (SELECT key FROM a0)
       |       AND key IN (SELECT key FROM b0)) AS n_sample_both)
       |SELECT CAST(256 AS INT) AS k,
       |  n_a, n_b, n_union, n_inter, n_sample_both,
       |  round(${est("uh_a", "n_a")}, 2) AS est_a,
       |  round(${est("uh_b", "n_b")}, 2) AS est_b,
       |  round(${est("uh_u", "n_union")}, 2) AS est_union,
       |  round((CAST(n_sample_both AS DOUBLE) * ${est("uh_u", "n_union")}) / 256.0, 2)
       |    AS est_inter,
       |  round(CAST(n_sample_both AS DOUBLE) / 256.0, 4) AS jaccard_sample
       |FROM mx""".stripMargin
  }

  /** q68 — KMV windowed distinct: per-(prio, day) bottom-256 of the
    * splitmix64-mixed distinct custkeys (mix once per distinct key,
    * join back, `row_number ≤ k`), per-day sketch lists merged over the
    * trailing-90-day RANGE window (`flatten` of the frame's lists →
    * `list_distinct` → `list_sort`), estimate written exactly like
    * h04's (signed view of the k-th hash → double → re-offset 2^63.0 →
    * one divide) so both engines round identically.
    */
  val q68: String = {
    val (mix, last) = mix64Ctes("kw", "zk0", Seq("key"))
    val uhK = "CAST(mg[256] - 9223372036854775808::HUGEINT AS BIGINT)"
    s"""WITH ok AS (SELECT o_orderpriority AS prio,
       |    CAST(date_diff('day', DATE '1992-01-01', o_orderdate) AS INT) AS day,
       |    o_custkey AS key FROM orders),
       |dk AS (SELECT DISTINCT prio, day, key FROM ok),
       |nd AS (SELECT prio, day, count(*) AS n_day FROM ok GROUP BY 1, 2),
       |ky AS (SELECT DISTINCT key FROM dk),
       |zk0 AS (SELECT key, key::HUGEINT AS z FROM ky),
       |$mix,
       |hj AS (SELECT dk.prio, dk.day, m.z FROM dk JOIN $last m ON dk.key = m.key),
       |rk AS (SELECT prio, day, z,
       |         row_number() OVER (PARTITION BY prio, day ORDER BY z) AS rn FROM hj),
       |dl AS (SELECT prio, day, list(z ORDER BY z) AS sk
       |       FROM rk WHERE rn <= 256 GROUP BY 1, 2),
       |wl AS (SELECT d.prio, d.day, n.n_day, d.sk
       |       FROM dl d JOIN nd n ON d.prio = n.prio AND d.day = n.day),
       |wv AS (SELECT prio, day,
       |         CAST(sum(n_day) OVER w AS BIGINT) AS n_orders_90d,
       |         flatten(list(sk) OVER w) AS mg0
       |       FROM wl
       |       WINDOW w AS (PARTITION BY prio ORDER BY day
       |         RANGE BETWEEN 90 PRECEDING AND CURRENT ROW)),
       |mgx AS (SELECT prio, day, n_orders_90d,
       |          list_sort(list_distinct(mg0)) AS mg FROM wv)
       |SELECT prio, day, n_orders_90d,
       |  CAST(least(len(mg), 256) AS BIGINT) AS n_sk,
       |  round(CASE WHEN len(mg) < 256 THEN CAST(len(mg) AS DOUBLE)
       |    ELSE (255.0 * 18446744073709551616.0)
       |      / (CAST($uhK AS DOUBLE) + 9223372036854775808.0) END, 2)
       |    AS est_cust_90d
       |FROM mgx ORDER BY prio, day""".stripMargin
  }

  /** q72 — the native KMV aggregate's replay: per-priority bottom-256
    * of the mixed distinct custkeys (mix once per distinct key, join
    * back per (prio, key), `row_number ≤ k`), k-th hash → the h04/q68
    * estimate chain (signed view → double → re-offset 2^63.0 → one
    * divide), beside the exact distinct count and realized relative
    * error (h01's accuracy-envelope convention). The Spark side
    * aggregates RAW rows through the sorted-set buffer; sets are
    * insertion-order-free, so bottom-k-of-distinct here is the same
    * math.
    */
  val q72: String = {
    val (mix, last) = mix64Ctes("kq", "zk0", Seq("key"))
    val uhK = "CAST(max(z) - 9223372036854775808::HUGEINT AS BIGINT)"
    s"""WITH ok AS (SELECT o_orderpriority AS prio, o_custkey AS key FROM orders),
       |dk AS (SELECT DISTINCT prio, key FROM ok),
       |ky AS (SELECT DISTINCT key FROM ok),
       |zk0 AS (SELECT key, key::HUGEINT AS z FROM ky),
       |$mix,
       |hj AS (SELECT dk.prio, m.z FROM dk JOIN $last m ON dk.key = m.key),
       |rk AS (SELECT prio, z,
       |         row_number() OVER (PARTITION BY prio ORDER BY z) AS rn FROM hj),
       |sk AS (SELECT prio, CAST(count(*) AS BIGINT) AS n_sk, $uhK AS uh_k
       |       FROM rk WHERE rn <= 256 GROUP BY 1),
       |ex AS (SELECT prio, count(DISTINCT key) AS n_exact FROM ok GROUP BY 1),
       |es AS (SELECT sk.prio, ex.n_exact, sk.n_sk,
       |         CASE WHEN sk.n_sk < 256 THEN CAST(sk.n_sk AS DOUBLE)
       |           ELSE (255.0 * 18446744073709551616.0)
       |             / (CAST(sk.uh_k AS DOUBLE) + 9223372036854775808.0) END AS e
       |       FROM sk JOIN ex ON sk.prio = ex.prio)
       |SELECT prio, n_exact, n_sk, round(e, 2) AS est_kmv,
       |  round((e - n_exact) / n_exact, 4) AS rel_err
       |FROM es ORDER BY prio""".stripMargin
  }

  /** q73 — closed-form replay of the `graftgen` DataSource V2 connector
    * ([[graft.sources.GenSource]]): `range(|orders|)` ids → the mix64
    * CTE chain → the connector's exact bit slices (`// 256 % 16` ≡
    * `>>> 8 & 15`, `// 65536 % 65536` ≡ `>>> 16 & 0xffff` on the
    * unsigned HUGEINT view), filtered to the same middle-half interval
    * the Spark side pushes into the scan, aggregated per category.
    */
  val q73: String = {
    val (mix, last) = mix64Ctes("gq", "zg0", Seq("id"))
    s"""WITH nn AS (SELECT count(*) AS n FROM orders),
       |ids AS (SELECT unnest(range(0, (SELECT n FROM nn), 1)) AS id),
       |fl AS (SELECT id FROM ids
       |       WHERE id >= (SELECT n // 4 FROM nn)
       |         AND id < (SELECT 3 * n // 4 FROM nn)),
       |zg0 AS (SELECT id, id::HUGEINT AS z FROM fl),
       |$mix,
       |rw AS (SELECT id, CAST((z // 256) % 16 AS INT) AS category,
       |         CAST((z // 65536) % 65536 AS BIGINT) AS value FROM $last)
       |SELECT category, CAST(count(*) AS BIGINT) AS n_rows,
       |  CAST(sum(value) AS BIGINT) AS sum_val,
       |  min(id) AS min_id, max(id) AS max_id
       |FROM rw GROUP BY 1 ORDER BY 1""".stripMargin
  }

  /** q75 — [[q73]]'s replay over the FULL generated extent (the
    * streaming drain consumes every offset, so no interval filter).
    */
  val q75: String = {
    val (mix, last) = mix64Ctes("gs", "zg0", Seq("id"))
    s"""WITH nn AS (SELECT count(*) AS n FROM orders),
       |ids AS (SELECT unnest(range(0, (SELECT n FROM nn), 1)) AS id),
       |zg0 AS (SELECT id, id::HUGEINT AS z FROM ids),
       |$mix,
       |rw AS (SELECT id, CAST((z // 256) % 16 AS INT) AS category,
       |         CAST((z // 65536) % 65536 AS BIGINT) AS value FROM $last)
       |SELECT category, CAST(count(*) AS BIGINT) AS n_rows,
       |  CAST(sum(value) AS BIGINT) AS sum_val,
       |  min(id) AS min_id, max(id) AS max_id
       |FROM rw GROUP BY 1 ORDER BY 1""".stripMargin
  }

  /** q78 — dual-generator replay for the storage-partitioned join: one
    * mix64 chain per table (|orders| and |customer| extents), per-table
    * per-category aggregates, inner join on category.
    */
  val q78: String = {
    val (mixA, lastA) = mix64Ctes("ja", "za0", Seq("id"))
    val (mixB, lastB) = mix64Ctes("jb", "zb0", Seq("id"))
    def rw(last: String) =
      s"SELECT CAST((z // 256) % 16 AS INT) AS category, " +
        s"CAST((z // 65536) % 65536 AS BIGINT) AS value FROM $last"
    s"""WITH ia AS (SELECT unnest(range(0, (SELECT count(*) FROM orders), 1)) AS id),
       |za0 AS (SELECT id, id::HUGEINT AS z FROM ia),
       |$mixA,
       |ib AS (SELECT unnest(range(0, (SELECT count(*) FROM customer), 1)) AS id),
       |zb0 AS (SELECT id, id::HUGEINT AS z FROM ib),
       |$mixB,
       |ra AS (${rw(lastA)}),
       |rb AS (${rw(lastB)}),
       |ga AS (SELECT category, CAST(count(*) AS BIGINT) AS n_a,
       |         CAST(sum(value) AS BIGINT) AS sum_a FROM ra GROUP BY 1),
       |gb AS (SELECT category, CAST(count(*) AS BIGINT) AS n_b,
       |         CAST(sum(value) AS BIGINT) AS sum_b FROM rb GROUP BY 1)
       |SELECT ga.category, n_a, sum_a, n_b, sum_b
       |FROM ga JOIN gb ON ga.category = gb.category
       |ORDER BY ga.category""".stripMargin
  }

  /** q80 — [[q73]]'s generator replay with the pushed-down shape:
    * first-two-thirds id filter, per-category count/sum/min/max. The
    * pushdown is a plan property; the oracle pins the VALUES the
    * source-side aggregation must reproduce.
    */
  val q80: String = {
    val (mix, last) = mix64Ctes("gp", "zg0", Seq("id"))
    s"""WITH nn AS (SELECT count(*) AS n FROM lineitem),
       |ids AS (SELECT unnest(range(0, (SELECT n FROM nn), 1)) AS id),
       |fl AS (SELECT id FROM ids WHERE id < (SELECT 2 * n // 3 FROM nn)),
       |zg0 AS (SELECT id, id::HUGEINT AS z FROM fl),
       |$mix,
       |rw AS (SELECT id, CAST((z // 256) % 16 AS INT) AS category,
       |         CAST((z // 65536) % 65536 AS BIGINT) AS value FROM $last)
       |SELECT category, CAST(count(*) AS BIGINT) AS n_rows,
       |  CAST(sum(value) AS BIGINT) AS sum_val,
       |  min(value) AS min_val, max(id) AS max_id
       |FROM rw GROUP BY 1 ORDER BY 1""".stripMargin
  }

  /** q81 — the V2 function catalog's `mix64` replayed closed-form:
    * unsigned top-4-bit bucket (`z // 2^60`) + SIGNED min/max of the
    * mixed value (`toSigned`), over |customer| ids.
    */
  val q81: String = {
    val (mix, last) = mix64Ctes("fc", "zq0", Seq("id"))
    s"""WITH nn AS (SELECT count(*) AS n FROM customer),
       |ids AS (SELECT unnest(range(0, (SELECT n FROM nn), 1)) AS id),
       |zq0 AS (SELECT id, id::HUGEINT AS z FROM ids),
       |$mix,
       |mm AS (SELECT CAST(z // 1152921504606846976 AS INT) AS bucket,
       |         ${toSigned("z")} AS m FROM $last)
       |SELECT bucket, CAST(count(*) AS BIGINT) AS n_rows,
       |  min(m) AS min_m, max(m) AS max_m
       |FROM mm GROUP BY 1 ORDER BY 1""".stripMargin
  }

  /** c20 — BPE merge-trainer replay: `numMerges` unrolled rounds, each
    * = pair-count over adjacent positions → deterministic top-1
    * (count DESC, lhs, rhs) → greedy left-to-right merge via
    * gaps-and-islands (in a maximal run of consecutive match positions
    * the even-offset matches merge — the closed form of the Spark
    * side's sequential scan, proven equivalent in BpeSpec). Every
    * per-round CTE that is referenced twice (`sy`, `km`, `tp`, `w{r}`)
    * is MATERIALIZED — the g06 exponential-inlining lesson. All symbol
    * strings are `[a-z]+` concatenations, so VARCHAR binary collation
    * and Spark UTF8String ordering agree on the tie-break.
    */
  def c20(numMerges: Int): String =
    s"""${bpeCtes(numMerges)}
       |${(1 to numMerges).map(r => s"SELECT * FROM mg$r").mkString(" UNION ALL ")}
       |ORDER BY step""".stripMargin

  /** c21 — the trained tokenizer APPLIED: same `numMerges` replay as
    * [[c20]], then the final symbol table exploded into per-token
    * corpus stats (words containing, freq-weighted occurrences),
    * top-25 by occurrences with the token as tiebreak.
    */
  def c21(numMerges: Int): String =
    s"""${bpeCtes(numMerges)},
       |tokx AS (SELECT w, freq, unnest(s) AS token FROM w$numMerges),
       |tagg AS (SELECT token, CAST(count(DISTINCT w) AS BIGINT) AS n_words,
       |    CAST(sum(freq) AS BIGINT) AS n_occurrences FROM tokx GROUP BY 1)
       |SELECT token, n_words, n_occurrences FROM tagg
       |ORDER BY n_occurrences DESC, token LIMIT 25""".stripMargin

  /** Shared c20/c21 trainer replay: WITH-chain from the corpus
    * word-frequency table through `numMerges` merge rounds, ending at
    * CTE `w<numMerges>` (word, freq, s) plus per-round `mg<r>` merge
    * rows. See [[c20]] for the algorithm notes.
    */
  private def bpeCtes(numMerges: Int): String = {
    val rounds = (1 to numMerges).map { r =>
      val p = s"w${r - 1}"
      s"""px$r AS (SELECT freq, unnest(range(1, len(s)::BIGINT)) AS i, s FROM $p),
         |pr$r AS (SELECT s[i] AS l, s[i + 1] AS r2,
         |    CAST(sum(freq) AS BIGINT) AS cnt FROM px$r GROUP BY 1, 2),
         |tp$r AS MATERIALIZED (SELECT l, r2, cnt FROM pr$r
         |  ORDER BY cnt DESC, l, r2 LIMIT 1),
         |ex$r AS (SELECT w, freq, unnest(range(1, len(s)::BIGINT + 1)) AS i, s FROM $p),
         |sy$r AS MATERIALIZED (SELECT w, freq, i, s[i] AS sym,
         |    CASE WHEN i < len(s) AND s[i] = (SELECT l FROM tp$r)
         |          AND s[i + 1] = (SELECT r2 FROM tp$r) THEN 1 ELSE 0 END AS m
         |  FROM ex$r),
         |im$r AS (SELECT w, i,
         |    i - row_number() OVER (PARTITION BY w ORDER BY i) AS grp
         |  FROM sy$r WHERE m = 1),
         |km$r AS MATERIALIZED (SELECT w, i FROM (
         |    SELECT w, i, row_number() OVER (PARTITION BY w, grp ORDER BY i) AS rn
         |    FROM im$r) u$r
         |  WHERE (rn - 1) % 2 = 0),
         |rb$r AS (SELECT y.w, y.freq, y.i,
         |    CASE WHEN k1.i IS NOT NULL THEN y.sym || (SELECT r2 FROM tp$r)
         |         ELSE y.sym END AS sym2,
         |    CASE WHEN k2.i IS NOT NULL THEN 0 ELSE 1 END AS emit
         |  FROM sy$r y
         |  LEFT JOIN km$r k1 ON y.w = k1.w AND y.i = k1.i
         |  LEFT JOIN km$r k2 ON y.w = k2.w AND y.i = k2.i + 1),
         |w$r AS MATERIALIZED (SELECT w, freq, list(sym2 ORDER BY i) AS s
         |  FROM rb$r WHERE emit = 1 GROUP BY w, freq),
         |vz$r AS (SELECT CAST(count(DISTINCT sym) AS BIGINT) AS v
         |  FROM (SELECT unnest(s) AS sym FROM w$r) q$r),
         |mg$r AS (SELECT $r AS step, l AS lhs, r2 AS rhs, l || r2 AS merged,
         |  cnt AS pair_freq, (SELECT v FROM vz$r) AS vocab_size FROM tp$r)"""
        .stripMargin
    }.mkString(",\n")
    s"""WITH nc AS (SELECT $normSql AS norm FROM documents),
       |tk AS (SELECT unnest(string_split(norm, ' ')) AS word FROM nc),
       |wf AS (SELECT word AS w, CAST(count(*) AS BIGINT) AS freq FROM tk
       |  WHERE regexp_matches(word, '^[a-z]+$$') GROUP BY 1),
       |cx AS (SELECT w, freq, unnest(range(1, len(w)::BIGINT + 1)) AS i FROM wf),
       |w0 AS MATERIALIZED (SELECT w, freq,
       |    list(substring(w, i::INT, 1) ORDER BY i) AS s
       |  FROM cx GROUP BY w, freq),
       |$rounds""".stripMargin
  }

  val h03: String = {
    val (mix, last) = mix64Ctes("f", "f0", Seq("token"))
    s"""WITH n AS (SELECT $normSql AS norm FROM documents),
       |tok AS (SELECT unnest(string_split(norm, ' ')) AS token FROM n),
       |tc AS (SELECT token, count(*) AS cnt FROM tok GROUP BY 1),
       |f0 AS (SELECT token, ${fnvRaw("token")} AS z FROM tc),
       |$mix,
       |pos AS (SELECT token, 0 AS r, CAST(z % 1024 AS BIGINT) AS c FROM $last
       |        UNION ALL
       |        SELECT token, 1, CAST((z // 1024) % 1024 AS BIGINT) FROM $last
       |        UNION ALL
       |        SELECT token, 2, CAST((z // 1048576) % 1024 AS BIGINT) FROM $last),
       |cnts AS (SELECT p.r, p.c, CAST(sum(tc.cnt) AS BIGINT) AS cell
       |         FROM pos p JOIN tc ON p.token = tc.token GROUP BY 1, 2),
       |top AS (SELECT token, cnt FROM tc ORDER BY cnt DESC, token LIMIT 20),
       |est AS (SELECT p.token, min(coalesce(cn.cell, 0)) AS cms_est
       |        FROM pos p JOIN top t ON p.token = t.token
       |        LEFT JOIN cnts cn ON p.r = cn.r AND p.c = cn.c
       |        GROUP BY 1)
       |SELECT t.token, t.cnt AS exact_cnt, e.cms_est,
       |  e.cms_est - t.cnt AS overcount
       |FROM top t JOIN est e ON t.token = e.token
       |ORDER BY exact_cnt DESC, t.token""".stripMargin
  }

  /** b01 — Bloom-pruned semi-join: the exact `BloomPrune` dataflow —
    * one splitmix64 mix per distinct key, three 16-bit position slices,
    * 32-bit-word bit_or build over the dim keys, all-3-bits probe, then
    * the exact semi-join and per-year reconciliation (pass vs exact vs
    * false positives). Shifts stay on non-negative values ≤ 2^31 so
    * BIGINT shift semantics agree across engines.
    */
  val b01: String = {
    val (mix, last) = mix64Ctes("h", "z0", Seq("key"))
    s"""WITH dimk AS (SELECT c_custkey AS key FROM customer WHERE c_nationkey = 5),
       |keys AS (SELECT DISTINCT o_custkey AS key FROM orders
       |         UNION SELECT key FROM dimk),
       |z0 AS (SELECT key, key::HUGEINT AS z FROM keys),
       |$mix,
       |pos AS (SELECT key, CAST(unnest([z % 65536, (z // 65536) % 65536,
       |          (z // 4294967296) % 65536]) AS BIGINT) AS pos FROM $last),
       |bb AS (SELECT p.pos FROM pos p JOIN dimk d ON p.key = d.key),
       |bloom AS (SELECT pos // 32 AS word,
       |            bit_or(1::BIGINT << CAST(pos % 32 AS INT)) AS bits
       |          FROM bb GROUP BY 1),
       |pr AS (SELECT p.key FROM pos p
       |       LEFT JOIN bloom b ON p.pos // 32 = b.word
       |       GROUP BY p.key
       |       HAVING min((coalesce(b.bits, 0) >> CAST(p.pos % 32 AS INT)) & 1) = 1),
       |pass AS (SELECT o.o_custkey, o.o_totalprice,
       |           CAST(year(o.o_orderdate) AS INT) AS year
       |         FROM orders o JOIN pr ON o.o_custkey = pr.key),
       |pa AS (SELECT year, count(*) AS n_bloom_pass FROM pass GROUP BY 1),
       |ex AS (SELECT year, count(*) AS n_orders,
       |         sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)) AS rev_f
       |       FROM pass JOIN dimk d ON pass.o_custkey = d.key GROUP BY 1)
       |SELECT pa.year, coalesce(ex.n_orders, 0) AS n_orders,
       |  round(CAST(coalesce(ex.rev_f, 0) AS DOUBLE) / 100.0, 2) AS revenue,
       |  pa.n_bloom_pass,
       |  pa.n_bloom_pass - coalesce(ex.n_orders, 0) AS n_false_pos
       |FROM pa LEFT JOIN ex ON pa.year = ex.year
       |ORDER BY 1""".stripMargin
  }
}
