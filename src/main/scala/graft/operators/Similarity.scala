package graft.operators

import graft.QueryCaches.CacheOps
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`array<float>`).
  *
  * Numerics: embeddings are quantized to integer micro-units once
  * ([[fixedVec]]); dot products and norms are then exact 64-bit integer
  * sums (dim 64 × 1e6-scale components fits comfortably), and cosine is
  * a deterministic double expression of exact integers — the same
  * bit-for-bit result at any parallelism or engine. All vector math uses
  * `zip_with`/`aggregate`/`transform` higher-order functions: codegen'd
  * columnar expressions, no UDF, no driver-side loops.
  *
  * Scale paths:
  *   - [[bruteForceTopK]] is the exact baseline: queries × candidates
  *     via broadcast of the (small) query set — O(|Q|·n) with no
  *     shuffle of the candidate side beyond the scan;
  *   - [[hyperplaneLshTopK]] is the approximate path: sign-pattern
  *     bucketing against `numPlanes` deterministic hyperplanes turns the
  *     candidate set into an equi-join on bucket prefix, trading recall
  *     for a ~2^planes reduction in pairs scored. The same re-rank code
  *     runs after either candidate generator.
  */
object Similarity {

  val Scale = 1000000.0

  /** Largest |embedding component| for which every integer expression in
    * this file (dots, norms, plane projections) provably fits in a
    * signed 64-bit long — see the bound derivation at [[planeComponent]].
    * Inputs beyond this are a CONTRACT VIOLATION: Spark (non-ANSI)
    * would silently wrap while the DuckDB oracle throws INT64 overflow,
    * i.e. a divergence with no error on the Spark side. SimilaritySpec
    * pins the testdata corpus inside this bound so a future corpus that
    * breaks the coupling fails loudly in CI rather than hash-mismatching.
    */
  val MaxAbsEmbedding = 16.0

  /** Quantize a float-array column to exact micro-unit longs. */
  def fixedVec(v: Column): Column =
    transform(v, x => floor(x.cast("double") * Scale + 0.5d).cast("long"))

  /** Exact integer dot product of two fixed vectors — the native
    * `graft_dot_fixed` expression (full `doGenCode`): the dot sits in
    * the per-candidate-pair hot path of every ANN re-rank, exactly
    * where interpreted array-HOF lambdas are banned by the repo rule.
    * Requires graft functions registered (GraftExtensions or
    * `NativeExprs.ensureRegistered`).
    */
  def dotFixed(a: Column, b: Column): Column =
    call_function("graft_dot_fixed", a, b)

  /** Exact integer squared norm of a fixed vector. */
  def normSqFixed(a: Column): Column = dotFixed(a, a)

  /** Cosine from exact integer dot and squared norms — one deterministic
    * double expression: dot / sqrt(na) / sqrt(nb).
    */
  def cosineFromFixed(dot: Column, normSqA: Column, normSqB: Column): Column =
    dot.cast("double") / sqrt(normSqA.cast("double")) / sqrt(normSqB.cast("double"))

  /** Exact top-k cosine neighbors for each query vector.
    *
    * `queries`/`candidates`: frames with (`id`, `vec` array<float>).
    * Output: query_id, cand_id, cosine, rnk (1..k), self-pairs excluded,
    * ties broken by cand_id.
    */
  def bruteForceTopK(queries: DataFrame, candidates: DataFrame, k: Int): DataFrame = {
    val q = queries.select(col("id").as("query_id"), fixedVec(col("vec")).as("qv"))
      .withColumn("qn", normSqFixed(col("qv")))
    val c = candidates.select(col("id").as("cand_id"), fixedVec(col("vec")).as("cv"))
      .withColumn("cn", normSqFixed(col("cv")))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("cand_id"))
      .withColumn("cosine",
        cosineFromFixed(dotFixed(col("qv"), col("cv")), col("qn"), col("cn")))
    scored
      .withColumn("rnk", row_number().over(Window.partitionBy(col("query_id"))
        .orderBy(col("cosine").desc, col("cand_id"))))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("cand_id"), col("cosine"), col("rnk"))
  }

  /** Deterministic pseudo-random hyperplane component for (plane, dim):
    * a zero-mean long derived from a splitmix-style mix — no RNG state,
    * same planes on every executor and every run. `private[graft]` so
    * the DuckDB oracle builder can embed the identical constants.
    *
    * Overflow bound (why `>> 32`, and why [[MaxAbsEmbedding]] exists):
    * a plane-projection sum is Σ_d fv[d] · planeComponent, with
    * |fv[d]| ≤ Scale · MaxAbsEmbedding = 2^24 and |planeComponent| < 2^31
    * (top 32 bits of a mixed long, sign included), so each term is
    * < 2^55 and a dim-64 sum is < 2^61 — inside int64 with 4 bits to
    * spare. The same bound covers dots/norms of two fixed vectors
    * (|fv|² ≤ 2^48 per term, 2^54 summed). Spark sessions here are
    * non-ANSI (longs wrap silently) while DuckDB throws on overflow, so
    * this bound is what keeps the two engines equivalent — do not widen
    * Scale, dim, or MaxAbsEmbedding without redoing the arithmetic.
    */
  private[graft] def planeComponent(plane: Int, d: Int): Long = {
    var z = plane.toLong * 0x9E3779B97F4A7C15L + d.toLong * 0xC2B2AE3D27D4EB4FL
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z = z ^ (z >>> 31)
    z >> 32 // keep magnitudes small; sign pattern is what matters
  }

  /** Sign-pattern LSH bucket of a fixed vector against `numPlanes`
    * deterministic hyperplanes: bit i = sign(v · plane_i).
    */
  def lshBucket(fv: Column, dim: Int, numPlanes: Int): Column =
    (0 until numPlanes).map { p =>
      val dot = (0 until dim).map { d =>
        element_at(fv, d + 1) * lit(planeComponent(p, d))
      }.reduce(_ + _)
      when(dot >= 0, lit(1L << p)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))

  /** Same sign-pattern bucket, but (a) planes start at `planeOffset` so
    * several INDEPENDENT hash tables can be derived from one plane
    * stream (table t uses planes [t·numPlanes, (t+1)·numPlanes)), and
    * (b) each plane dot runs through the native `graft_dot_fixed`
    * against a literal plane vector — one codegen'd loop per plane
    * instead of `dim` unrolled multiplies, which keeps a 16-plane ×
    * multi-table bucket expression small enough for whole-stage codegen.
    * Requires graft functions registered (GraftExtensions or
    * NativeExprs.ensureRegistered).
    */
  def lshBucketTable(fv: Column, dim: Int, numPlanes: Int, planeOffset: Int): Column =
    (0 until numPlanes).map { p =>
      val plane = array((0 until dim).map(d =>
        lit(planeComponent(planeOffset + p, d))): _*)
      when(call_function("graft_dot_fixed", fv, plane) >= 0, lit(1L << p))
        .otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))

  /** OR-amplified LSH candidate pairs for a cosine-threshold self-join:
    * `numTables` independent sign-pattern tables of `numPlanes` planes;
    * a pair is a candidate iff it collides in ANY table. Recall for a
    * pair at angle θ is 1 − (1 − (1 − θ/π)^planes)^tables — at
    * cos ≥ 0.999 (θ ≤ 0.0447) with 16 planes × 4 tables that is
    * ≥ 99.8%, and near-dup pairs (θ ≈ 0) are found with certainty.
    * Input: (`id`, `fv` array<long>). Output: (id_a, id_b), id_a < id_b,
    * distinct. One equi-join on (table, bucket) — never all-pairs.
    */
  def lshCandidatePairsMultiTable(f: DataFrame, dim: Int,
                                  numPlanes: Int, numTables: Int): DataFrame = {
    // persist: both self-join sides read the bucketed rows — the
    // (numTables × numPlanes)-dot bucket expression must run once per
    // row, not once per join side (aliasing defeats exchange reuse).
    // The candidate set (small by design) is localCheckpoint-ed so the
    // cache can be released before returning — no session-lifetime leak.
    val bucketed = f.select(col("id"), explode(array((0 until numTables).map(t =>
      struct(lit(t).as("t"),
        lshBucketTable(col("fv"), dim, numPlanes, t * numPlanes).as("b"))): _*)).as("tb"))
      .persist()
    val cand = bucketed.select(col("tb"), col("id").as("id_a"))
      .join(bucketed.select(col("tb"), col("id").as("id_b")), Seq("tb"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
      .distinct()
      .localCheckpoint()
    bucketed.unpersist()
    cand
  }

  /** SemDeDup cluster count derived from the corpus size: k =
    * max(8, ceil(n / targetClusterSize)), so the within-cluster pair
    * scan stays O(n · targetClusterSize) instead of O(n²/k) with a
    * fixed k — the published recipe's shape (Abbas et al. 2023 cluster
    * 100M embeddings into 50k clusters, i.e. k ∝ n). Integer ceil
    * division keeps the rule exactly replicable in a SQL oracle.
    */
  def semdedupK(n: Long, targetClusterSize: Long = 128): Int =
    math.max(8L, (n + targetClusterSize - 1) / targetClusterSize).toInt

  /** Deterministic fixed-point Lloyd k-means for IVF coarse
    * quantization: seeds are the first `k` vectors by id (no RNG),
    * followed by `iters` iterations of (a) assignment by EXACT integer
    * cosine with centroid-id tiebreak, (b) centroid update as the
    * elementwise `floor(mean)` of member vectors — exact integer in,
    * exact integer out, so the result is bit-identical at any
    * parallelism AND replicable in a DuckDB oracle (each iteration is
    * one broadcast-assign + one aggregation; `posexplode` +
    * ordered re-collect keeps the update a plain shuffle aggregation).
    * Empty clusters keep their previous centroid. `cand` needs columns
    * (cand_id, cv array<long>, cn long); output (centroid_id = seed's
    * cand_id, centv, centn).
    */
  def kmeansCentroidsFixed(cand: DataFrame, k: Int, iters: Int): DataFrame = {
    var cents = cand.orderBy(col("cand_id")).limit(k)
      .select(col("cand_id").as("centroid_id"), col("cv").as("centv"), col("cn").as("centn"))
    for (_ <- 0 until iters) {
      val assigned = cand.crossJoin(broadcast(cents))
        .withColumn("c_cos", cosineFromFixed(dotFixed(col("cv"), col("centv")),
          col("cn"), col("centn")))
        .withColumn("r", row_number().over(Window.partitionBy(col("cand_id"))
          .orderBy(col("c_cos").desc, col("centroid_id"))))
        .filter(col("r") === 1)
      val dims = assigned.select(col("centroid_id"), posexplode(col("cv")).as(Seq("d", "v")))
        .groupBy(col("centroid_id"), col("d"))
        .agg(sum(col("v")).as("s"), count(lit(1)).as("c"))
        .withColumn("nv", floor(col("s").cast("double") / col("c")).cast("long"))
      val updated = dims.groupBy(col("centroid_id"))
        .agg(transform(array_sort(collect_list(struct(col("d"), col("nv")))),
          e => e.getField("nv")).as("newv"))
      cents = cents.join(updated, Seq("centroid_id"), "left")
        .select(col("centroid_id"),
          coalesce(col("newv"), col("centv")).as("centv"))
        .withColumn("centn", normSqFixed(col("centv")))
        // k rows; truncate lineage so each iteration runs ONCE and the
        // final centroid set is a flat relation for every consumer
        // (lists + probes both assign against it)
        .localCheckpoint()
    }
    cents
  }

  /** Grouped variant of [[kmeansCentroidsFixed]]: trains an INDEPENDENT
    * k-centroid codebook for every distinct `sub` value in ONE Lloyd job
    * chain — the fix for PQ training's wall-clock weak spot, where m
    * sequential per-subspace loops cost O(m·iters) driver-synchronous
    * job rounds. Adding `sub` to every key makes each step (seed pick,
    * assignment window, dimension aggregation, centroid rebuild) a
    * single grouped job covering all subspaces at once: O(iters) rounds
    * total, independent of m. Bit-identical to running
    * [[kmeansCentroidsFixed]] once per subspace: same first-k-by-id
    * seeds, same cosine + centroid-id tiebreaks, same `floor(mean)`
    * update, same empty-cluster carry — the s04/s05 oracles (which
    * replicate per-subspace training) hash unchanged.
    * `candSub` needs (sub, cand_id, cv array<long>, cn long); output
    * (sub, centroid_id, centv, centn).
    *
    * `l2 = true` switches the assignment metric to exact integer
    * SQUARED EUCLIDEAN distance (|x|² − 2·x·c + |c|², all int64 — no
    * division anywhere): the metric for RESIDUAL codebooks, where
    * vectors can be zero-norm and a cosine would divide by zero.
    */
  def kmeansCentroidsFixedGrouped(candSub: DataFrame, k: Int, iters: Int,
                                  l2: Boolean = false): DataFrame = {
    def assignOrder: Seq[Column] =
      if (l2) Seq((col("cn") - lit(2L) * dotFixed(col("cv"), col("centv")) +
        col("centn")).asc, col("centroid_id"))
      else Seq(cosineFromFixed(dotFixed(col("cv"), col("centv")),
        col("cn"), col("centn")).desc, col("centroid_id"))
    var cents = candSub
      .withColumn("seed_r", row_number().over(Window.partitionBy(col("sub"))
        .orderBy(col("cand_id"))))
      .filter(col("seed_r") <= k)
      .select(col("sub"), col("cand_id").as("centroid_id"),
        col("cv").as("centv"), col("cn").as("centn"))
      .localCheckpoint()
    for (_ <- 0 until iters) {
      val assigned = candSub.join(broadcast(cents), Seq("sub"))
        .withColumn("r", row_number().over(
          Window.partitionBy(col("sub"), col("cand_id"))
            .orderBy(assignOrder: _*)))
        .filter(col("r") === 1)
      val dims = assigned.select(col("sub"), col("centroid_id"),
          posexplode(col("cv")).as(Seq("d", "v")))
        .groupBy(col("sub"), col("centroid_id"), col("d"))
        .agg(sum(col("v")).as("s"), count(lit(1)).as("c"))
        .withColumn("nv", floor(col("s").cast("double") / col("c")).cast("long"))
      val updated = dims.groupBy(col("sub"), col("centroid_id"))
        .agg(transform(array_sort(collect_list(struct(col("d"), col("nv")))),
          e => e.getField("nv")).as("newv"))
      cents = cents.join(updated, Seq("sub", "centroid_id"), "left")
        .select(col("sub"), col("centroid_id"),
          coalesce(col("newv"), col("centv")).as("centv"))
        .withColumn("centn", normSqFixed(col("centv")))
        // m·k rows; truncate lineage so each iteration runs ONCE
        .localCheckpoint()
    }
    cents
  }

  /** IVF (inverted-file) approximate top-k: candidates are coarse-
    * quantized to their nearest centroid once (the "inverted lists");
    * each query probes only its `nprobe` nearest centroids' lists and
    * exact-re-ranks within them. Centroids come from
    * [[kmeansCentroidsFixed]] (deterministic seeded Lloyd iterations in
    * exact integer arithmetic — reproducible lists, no RNG). Assignment
    * is one broadcast join against the centroid set; probing is an
    * equi-join on centroid_id — at corpus scale the cross join never
    * materializes.
    */
  def ivfTopK(queries: DataFrame, candidates: DataFrame, k: Int,
              numCentroids: Int, nprobe: Int,
              kmeansIters: Int = 2): DataFrame = {
    val cand = candidates.select(col("id").as("cand_id"), fixedVec(col("vec")).as("cv"))
      .withColumn("cn", normSqFixed(col("cv")))
    val cents = kmeansCentroidsFixed(cand, numCentroids, kmeansIters)
    def nearestCentroids(side: DataFrame, idCol: String, v: String, n: String,
                         keep: Int): DataFrame =
      side.crossJoin(broadcast(cents))
        .withColumn("c_cos", cosineFromFixed(dotFixed(col(v), col("centv")),
          col(n), col("centn")))
        .withColumn("c_rnk", row_number().over(Window.partitionBy(col(idCol))
          .orderBy(col("c_cos").desc, col("centroid_id"))))
        .filter(col("c_rnk") <= keep)
        .drop("centv", "centn", "c_cos", "c_rnk")
    val lists = nearestCentroids(cand, "cand_id", "cv", "cn", 1)
    val q = queries.select(col("id").as("query_id"), fixedVec(col("vec")).as("qv"))
      .withColumn("qn", normSqFixed(col("qv")))
    val probes = nearestCentroids(q, "query_id", "qv", "qn", nprobe)
    // the probe side is |Q|·nprobe rows (query batches are small by
    // contract); broadcast it so the corpus-sized inverted lists are
    // never shuffled — SortMergeJoin → BroadcastHashJoin(BuildLeft)
    val scored = broadcast(probes).join(lists, Seq("centroid_id"))
      .filter(col("query_id") =!= col("cand_id"))
      .withColumn("cosine",
        cosineFromFixed(dotFixed(col("qv"), col("cv")), col("qn"), col("cn")))
    scored
      .withColumn("rnk", row_number().over(Window.partitionBy(col("query_id"))
        .orderBy(col("cosine").desc, col("cand_id"))))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("cand_id"), col("cosine"), col("rnk"))
      .distinct()
  }

  /** Product-quantization (PQ) approximate top-k (Jégou, Douze, Schmid
    * 2011): vectors split into `m` subvectors, each coarse-quantized
    * against its own `ksub`-centroid codebook (the deterministic
    * fixed-point Lloyd of [[kmeansCentroidsFixed]], run per subspace),
    * so a candidate compresses to `m` small codes. Scoring is
    * ASYMMETRIC: each query precomputes a distance table of exact
    * integer dots against every codebook centroid (|Q|·m·ksub rows —
    * tiny), and a candidate's approximate dot is the sum of `m` table
    * lookups — an equi-join on (subspace, code) + one sum, no
    * per-pair vector math. The approx ranking shortlists
    * `shortlist` candidates per query; exact fixed-point cosine
    * re-ranks the survivors (generate/decide, as everywhere).
    *
    * PQ is an exhaustive CHEAP scan — the pair count is |Q|·|C| but the
    * per-pair work is m integer adds. At 100 TB you compose it with the
    * IVF coarse partitioner (IVF-PQ: probe lists, then PQ-score within)
    * — both halves exist here independently.
    *
    * Fully deterministic (seeded codebooks, integer dots, total
    * orderings) — the s04 oracle replicates codebook training, encoding,
    * table lookups, and the re-rank in DuckDB SQL.
    */
  def pqTopK(queries: DataFrame, candidates: DataFrame, k: Int,
             dim: Int, m: Int, ksub: Int, shortlist: Int,
             kmeansIters: Int = 2): DataFrame = {
    val (cand, q) = fixedSides(queries, candidates)
    val (codes, dts) = pqCodebooks(cand, q, dim, m, ksub, kmeansIters)
    // approx dot = sum of m table lookups; m rows per (query, cand)
    val approx = codes.join(broadcast(dts), Seq("sub", "code"))
      .groupBy(col("query_id"), col("cand_id"))
      .agg(sum(col("partial")).as("ad"))
    pqShortlistRerank(approx, q, cand, shortlist, k)
  }

  /** IVF-PQ composition ([[ivfTopK]]'s coarse partitioner feeding
    * [[pqTopK]]'s asymmetric scorer): candidates are bucketed into
    * `numCentroids` inverted lists (1 Lloyd iteration, full vectors),
    * each query probes its `nprobe` nearest lists, and ONLY pairs
    * inside probed lists are PQ-scored (m table lookups each) before
    * the exact shortlist re-rank. This is the 100 TB ANN shape: the
    * coarse step cuts the pair count ~numCentroids/nprobe-fold, PQ
    * makes each surviving pair O(m) integer adds, and the exact kernel
    * still decides. Deterministic end-to-end; s05's oracle replicates
    * both quantizers and the composition.
    */
  def ivfPqTopK(queries: DataFrame, candidates: DataFrame, k: Int,
                dim: Int, m: Int, ksub: Int, shortlist: Int,
                numCentroids: Int, nprobe: Int): DataFrame = {
    val (cand, q) = fixedSides(queries, candidates)
    val coarse = kmeansCentroidsFixed(cand, numCentroids, iters = 1)
    def nearest(side: DataFrame, idCol: String, v: String, nn: String,
                keep: Int): DataFrame =
      side.crossJoin(broadcast(coarse))
        .withColumn("c_cos", cosineFromFixed(dotFixed(col(v), col("centv")),
          col(nn), col("centn")))
        .withColumn("c_rnk", row_number().over(Window.partitionBy(col(idCol))
          .orderBy(col("c_cos").desc, col("centroid_id"))))
        .filter(col("c_rnk") <= keep)
        .select(col(idCol), col("centroid_id"))
    val lists = nearest(cand, "cand_id", "cv", "cn", 1)
    val probes = nearest(q, "query_id", "qv", "qn", nprobe)
    // broadcast the |Q|·nprobe probe side; the corpus-sized list
    // assignment is consumed without a shuffle
    val pairs = broadcast(probes).join(lists, Seq("centroid_id"))
      .select(col("query_id"), col("cand_id"))
    val (codes, dts) = pqCodebooks(cand, q, dim, m, ksub, kmeansIters = 1)
    val approx = pairs.join(codes, Seq("cand_id"))
      .join(broadcast(dts), Seq("query_id", "sub", "code"))
      .groupBy(col("query_id"), col("cand_id"))
      .agg(sum(col("partial")).as("ad"))
    pqShortlistRerank(approx, q, cand, shortlist, k)
  }

  /** RESIDUAL IVF-PQ — the full IVFADC shape (Jégou, Douze, Schmid
    * 2011 §IV): PQ encodes the residual x − c(x) of each candidate
    * against its coarse centroid instead of x itself, which
    * concentrates the codebooks on the (much smaller) within-cell
    * displacement and is why the industrial implementations encode
    * residuals. Scoring uses the inner-product decomposition
    * q·x = q·c(x) + q·r(x): the first term is one exact dot per
    * (query, probed centroid) (|Q|·nprobe pairs, tiny), the second is
    * the usual m table lookups of q-subvector · residual-codeword.
    *
    * Residual subvectors can be zero (a vector sitting on its
    * centroid), so codebook training/encoding uses EXACT INTEGER
    * SQUARED L2 (no division, no zero-norm hazard) via
    * [[kmeansCentroidsFixedGrouped]]'s `l2` metric; everything else —
    * seeds, floor-mean updates, total orderings, the exact fixed-point
    * re-rank — is the established deterministic machinery, so the s07
    * oracle replicates the whole dataflow.
    */
  def ivfPqResidualTopK(queries: DataFrame, candidates: DataFrame, k: Int,
                        dim: Int, m: Int, ksub: Int, shortlist: Int,
                        numCentroids: Int, nprobe: Int): DataFrame = {
    val sub = dim / m
    require(sub * m == dim, "dim must divide into m subspaces")
    val (cand, q) = fixedSides(queries, candidates)
    val coarse = kmeansCentroidsFixed(cand, numCentroids, iters = 1)
    def nearest(side: DataFrame, idCol: String, v: String, nn: String,
                keep: Int): DataFrame =
      side.crossJoin(broadcast(coarse))
        .withColumn("c_cos", cosineFromFixed(dotFixed(col(v), col("centv")),
          col(nn), col("centn")))
        .withColumn("c_rnk", row_number().over(Window.partitionBy(col(idCol))
          .orderBy(col("c_cos").desc, col("centroid_id"))))
        .filter(col("c_rnk") <= keep)
        .select(col(idCol), col("centroid_id"))
    val lists = nearest(cand, "cand_id", "cv", "cn", 1)
    val probes = nearest(q, "query_id", "qv", "qn", nprobe)
    // residual subvectors, exploded once across all m subspaces
    val resSub = cand.join(lists, Seq("cand_id"))
      .join(broadcast(coarse), Seq("centroid_id"))
      .select(col("cand_id"),
        zip_with(col("cv"), col("centv"), (a, b) => a - b).as("rv"))
      .select(col("cand_id"), explode(array((0 until m).map(i =>
        struct(lit(i).as("sub"), slice(col("rv"), i * sub + 1, sub).as("v"))): _*))
        .as("sv"))
      .select(col("cand_id"), col("sv.sub").as("sub"), col("sv.v").as("cv"))
      .withColumn("cn", normSqFixed(col("cv")))
    val cents = kmeansCentroidsFixedGrouped(resSub, ksub, iters = 1, l2 = true)
    val codes = resSub.join(broadcast(cents), Seq("sub"))
      .withColumn("d2", col("cn") - lit(2L) * dotFixed(col("cv"), col("centv")) +
        col("centn"))
      .withColumn("r", row_number().over(
        Window.partitionBy(col("sub"), col("cand_id"))
          .orderBy(col("d2").asc, col("centroid_id"))))
      .filter(col("r") === 1)
      .select(col("cand_id"), col("sub"), col("centroid_id").as("code"))
    // query-side tables: raw q subvectors against residual codewords
    val dts = q.select(col("query_id"), explode(array((0 until m).map(i =>
        struct(lit(i).as("sub"), slice(col("qv"), i * sub + 1, sub).as("v"))): _*))
        .as("sv"))
      .select(col("query_id"), col("sv.sub").as("sub"), col("sv.v").as("qsv"))
      .join(broadcast(cents), Seq("sub"))
      .select(col("query_id"), col("sub"), col("centroid_id").as("code"),
        dotFixed(col("qsv"), col("centv")).as("partial"))
    // q·c(x) per (query, probed centroid) — the coarse term
    val qc = probes.join(broadcast(coarse), Seq("centroid_id"))
      .join(q.select(col("query_id"), col("qv")), Seq("query_id"))
      .select(col("query_id"), col("centroid_id"),
        dotFixed(col("qv"), col("centv")).as("qc"))
    val pairs = broadcast(probes).join(lists, Seq("centroid_id"))
    val approx = pairs.join(codes, Seq("cand_id"))
      .join(broadcast(dts), Seq("query_id", "sub", "code"))
      .groupBy(col("query_id"), col("centroid_id"), col("cand_id"))
      .agg(sum(col("partial")).as("rsum"))
      .join(broadcast(qc), Seq("query_id", "centroid_id"))
      .select(col("query_id"), col("cand_id"), (col("qc") + col("rsum")).as("ad"))
    pqShortlistRerank(approx, q, cand, shortlist, k)
  }

  /** SQ8 scalar-quantization ANN — the remaining industrial quantizer
    * next to PQ (FAISS's `SQ8`): each DIMENSION is quantized
    * independently to an 8-bit code against per-dim [min, max] trained
    * over the candidate corpus, so the scan representation shrinks 8×
    * (1 byte/dim vs the 8-byte fixed longs) while scoring stays a
    * plain dot product — no codebook join, no subspace machinery.
    *
    * Exact-integer formulation (what makes it oracle-able): with
    * per-dim bounds mn_d ≤ x ≤ mx_d over the FIXED (micro-unit) values,
    *   code_d  = floor((x − mn_d)·255 / (mx_d − mn_d))   ∈ [0, 255]
    *   r255_d  = mn_d·255 + code_d·(mx_d − mn_d)
    * r255 is the dequantized value scaled by 255 — kept ×255 so it is
    * an exact integer; the approximate score q·r255 is then an exact
    * integer dot (native `graft_dot_fixed`), and the shortlist order
    * (÷ the norms, a deterministic double) is replicable bit-for-bit
    * by a SQL oracle. A constant dimension (mx = mn) encodes as code 0
    * with r255 = mn·255 — no division anywhere near zero.
    *
    * Overflow: |r255| ≤ 2^24·255 < 2^32, |q_d| ≤ 2^24, so each term is
    * < 2^56 and a dim-64 sum < 2^62 — inside int64 (the
    * [[MaxAbsEmbedding]] contract).
    *
    * Shape at scale: training is ONE aggregate over the exploded
    * candidate set (64 rows out); encoding is a per-row map under a
    * broadcast 1-row bounds frame; scoring is the same broadcast-query
    * scan as [[bruteForceTopK]] but over 8× smaller codes — SQ8's
    * actual production win is scan bandwidth, which is exactly what a
    * 100 TB Spark scan is bound by. Exact re-rank on the shortlist
    * only ([[pqShortlistRerank]] economics).
    */
  def sq8TopK(queries: DataFrame, candidates: DataFrame, k: Int,
              shortlist: Int): DataFrame = {
    val (cand, q) = fixedSides(queries, candidates)
    // per-dim [mn, mx] training: one tiny agg (dim rows), collapsed to
    // a single broadcastable row of parallel arrays
    val mm = cand.select(posexplode(col("cv")).as(Seq("d", "x")))
      .groupBy(col("d")).agg(min(col("x")).as("mn"), max(col("x")).as("mx"))
    val mmArr = mm.select(struct(col("d"), col("mn"), col("mx")).as("s"))
      .agg(array_sort(collect_list(col("s"))).as("v"))
      .select(transform(col("v"), s => s.getField("mn")).as("mnv"),
        transform(col("v"), s => s.getField("mx")).as("mxv"))
    // encode: once per candidate ROW (not per pair — fixedVec economics,
    // interpreted HOF acceptable); floor over a ≤2^33 numerator is exact
    // in double, so cast-to-long == integer floor on both engines
    val coded = cand.crossJoin(broadcast(mmArr))
      .withColumn("rv", transform(col("cv"), (x, i) => {
        val mn = element_at(col("mnv"), i + 1)
        val mx = element_at(col("mxv"), i + 1)
        val code = when(mx > mn, floor((x - mn) * lit(255L) / (mx - mn)))
          .otherwise(lit(0L))
        mn * 255 + code * (mx - mn)
      }))
      .select(col("cand_id"), col("rv"))
    // approximate scan: native integer dot against the broadcast queries
    val approx = coded.crossJoin(broadcast(q.select(col("query_id"), col("qv"))))
      .select(col("query_id"), col("cand_id"),
        dotFixed(col("qv"), col("rv")).as("ad"))
    pqShortlistRerank(approx, q, cand, shortlist, k)
  }

  /** Quantize + norm + persist both sides of an ANN run (each feeds
    * codebook training / tables / the exact re-rank).
    */
  private def fixedSides(queries: DataFrame,
                         candidates: DataFrame): (DataFrame, DataFrame) = {
    val cand = candidates.select(col("id").as("cand_id"), fixedVec(col("vec")).as("cv"))
      .withColumn("cn", normSqFixed(col("cv")))
      .persistScoped()
    val q = queries.select(col("id").as("query_id"), fixedVec(col("vec")).as("qv"))
      .withColumn("qn", normSqFixed(col("qv")))
      .persistScoped()
    (cand, q)
  }

  /** Per-subspace PQ structures: candidate code table (cand_id, sub,
    * code) and query distance table (query_id, sub, code, partial).
    *
    * Each side is exploded into (sub, subvector) rows ONCE and all m
    * codebooks are trained together by [[kmeansCentroidsFixedGrouped]]
    * — one grouped Lloyd chain instead of m sequential loops, so the
    * training stage costs O(iters) job rounds regardless of m. Encoding
    * and distance tables are likewise single broadcast joins on `sub`
    * over all subspaces at once.
    */
  private def pqCodebooks(cand: DataFrame, q: DataFrame, dim: Int, m: Int,
                          ksub: Int, kmeansIters: Int): (DataFrame, DataFrame) = {
    val (cents, codes) = pqTrainCodebooks(cand, dim, m, ksub, kmeansIters)
    (codes, pqDistanceTables(q, cents, dim, m))
  }

  private def explodeSubs(df: DataFrame, idCol: String, v: String,
                          dim: Int, m: Int): DataFrame = {
    val sub = dim / m
    require(sub * m == dim, "dim must divide into m subspaces")
    df.select(col(idCol), explode(array((0 until m).map(i =>
        struct(lit(i).as("sub"), slice(col(v), i * sub + 1, sub).as("v"))): _*))
      .as("sv"))
      .select(col(idCol), col("sv.sub").as("sub"), col("sv.v").as(v))
  }

  /** QUERY-INDEPENDENT half of the PQ machinery: per-subspace codebooks
    * (sub, centroid_id, centv, centn) and the candidate code table
    * (cand_id, sub, code) — everything [[pqDistanceTables]] and the
    * approx scorer need that does not mention queries, i.e. the
    * persistable index content.
    */
  private[graft] def pqTrainCodebooks(cand: DataFrame, dim: Int, m: Int,
                                      ksub: Int, kmeansIters: Int): (DataFrame, DataFrame) = {
    val candSub = explodeSubs(cand, "cand_id", "cv", dim, m)
      .withColumn("cn", normSqFixed(col("cv")))
    val cents = kmeansCentroidsFixedGrouped(candSub, ksub, kmeansIters)
    val codes = candSub.join(broadcast(cents), Seq("sub"))
      .withColumn("c_cos", cosineFromFixed(dotFixed(col("cv"), col("centv")),
        col("cn"), col("centn")))
      .withColumn("r", row_number().over(
        Window.partitionBy(col("sub"), col("cand_id"))
          .orderBy(col("c_cos").desc, col("centroid_id"))))
      .filter(col("r") === 1)
      .select(col("cand_id"), col("sub"), col("centroid_id").as("code"))
    (cents, codes)
  }

  /** QUERY-TIME half: asymmetric distance tables (query_id, sub, code,
    * partial) against a trained codebook table.
    */
  private[graft] def pqDistanceTables(q: DataFrame, cents: DataFrame,
                                      dim: Int, m: Int): DataFrame =
    explodeSubs(q, "query_id", "qv", dim, m)
      .join(broadcast(cents), Seq("sub"))
      .select(col("query_id"), col("sub"), col("centroid_id").as("code"),
        dotFixed(col("qv"), col("centv")).as("partial"))

  /** The persistable IVF-PQ index: coarse centroids, inverted-list
    * assignments, PQ codebooks, candidate codes — four plain tables of
    * longs/arrays-of-longs, so a parquet roundtrip is EXACT. The
    * production ANN lifecycle this enables: train once over the corpus,
    * write the index tables next to the base vectors, and serve every
    * later query batch from the loaded tables — no retraining on the
    * query path (which is what s03–s07 do per call). Base vectors stay
    * in the source table; the exact re-rank reads them there.
    */
  case class IvfPqIndex(coarse: DataFrame, lists: DataFrame,
                        codebooks: DataFrame, codes: DataFrame)

  /** Build [[IvfPqIndex]] from candidates only — bit-identical training
    * to [[ivfPqTopK]]'s in-line path (same seeds, same floor-mean
    * Lloyd, same total orders), so searching a written-and-reloaded
    * index reproduces the in-memory result exactly (q71 pins it against
    * s05's oracle).
    */
  def ivfPqBuildIndex(candidates: DataFrame, dim: Int, m: Int, ksub: Int,
                      numCentroids: Int): IvfPqIndex = {
    val cand = candidates
      .select(col("id").as("cand_id"), fixedVec(col("vec")).as("cv"))
      .withColumn("cn", normSqFixed(col("cv")))
      .persistScoped()
    val coarse = kmeansCentroidsFixed(cand, numCentroids, iters = 1)
    val lists = cand.crossJoin(broadcast(coarse))
      .withColumn("c_cos", cosineFromFixed(dotFixed(col("cv"), col("centv")),
        col("cn"), col("centn")))
      .withColumn("c_rnk", row_number().over(Window.partitionBy(col("cand_id"))
        .orderBy(col("c_cos").desc, col("centroid_id"))))
      .filter(col("c_rnk") <= 1)
      .select(col("cand_id"), col("centroid_id"))
    val (cents, codes) = pqTrainCodebooks(cand, dim, m, ksub, kmeansIters = 1)
    IvfPqIndex(coarse, lists, cents, codes)
  }

  /** [[ivfPqTopK]]'s query path against a PRE-BUILT (typically
    * reloaded-from-parquet) index: probe nprobe coarse lists, PQ-score
    * only pairs inside probed lists via the index's codebooks/codes,
    * exact shortlist re-rank against the base vectors.
    */
  def ivfPqTopKFromIndex(queries: DataFrame, candidates: DataFrame,
                         idx: IvfPqIndex, k: Int, dim: Int, m: Int,
                         shortlist: Int, nprobe: Int): DataFrame = {
    val (cand, q) = fixedSides(queries, candidates)
    val probes = q.crossJoin(broadcast(idx.coarse))
      .withColumn("c_cos", cosineFromFixed(dotFixed(col("qv"), col("centv")),
        col("qn"), col("centn")))
      .withColumn("c_rnk", row_number().over(Window.partitionBy(col("query_id"))
        .orderBy(col("c_cos").desc, col("centroid_id"))))
      .filter(col("c_rnk") <= nprobe)
      .select(col("query_id"), col("centroid_id"))
    val pairs = broadcast(probes).join(idx.lists, Seq("centroid_id"))
      .select(col("query_id"), col("cand_id"))
    val dts = pqDistanceTables(q, idx.codebooks, dim, m)
    val approx = pairs.join(idx.codes, Seq("cand_id"))
      .join(broadcast(dts), Seq("query_id", "sub", "code"))
      .groupBy(col("query_id"), col("cand_id"))
      .agg(sum(col("partial")).as("ad"))
    pqShortlistRerank(approx, q, cand, shortlist, k)
  }

  /** Approx-score shortlist + exact fixed-point re-rank — the shared
    * tail of every PQ-scored ANN variant. `approx` needs
    * (query_id, cand_id, ad).
    */
  private def pqShortlistRerank(approx: DataFrame, q: DataFrame,
                                cand: DataFrame, shortlist: Int,
                                k: Int): DataFrame = {
    // join-strategy notes (guide §3.1): the query-side norm frame is
    // |Q| rows — always broadcast; the candidate-norm join keeps the
    // shuffle (both sides scale with the corpus). After the shortlist
    // cut the pair set is ≤ |Q|·shortlist rows — broadcast IT as the
    // build side so the full candidate table is probed in place, never
    // shuffled, on the exact re-rank.
    val short = approx
      .filter(col("query_id") =!= col("cand_id"))
      .join(broadcast(q.select(col("query_id"), col("qn"))), Seq("query_id"))
      .join(cand.select(col("cand_id"), col("cn")), Seq("cand_id"))
      .withColumn("approx_cos", cosineFromFixed(col("ad"), col("qn"), col("cn")))
      .withColumn("srnk", row_number().over(Window.partitionBy(col("query_id"))
        .orderBy(col("approx_cos").desc, col("cand_id"))))
      .filter(col("srnk") <= shortlist)
    cand.join(broadcast(short.select(col("query_id"), col("cand_id"))),
        Seq("cand_id"))
      .join(broadcast(q), Seq("query_id"))
      .withColumn("cosine",
        cosineFromFixed(dotFixed(col("qv"), col("cv")), col("qn"), col("cn")))
      .withColumn("rnk", row_number().over(Window.partitionBy(col("query_id"))
        .orderBy(col("cosine").desc, col("cand_id"))))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("cand_id"), col("cosine"), col("rnk"))
  }

  /** Approximate top-k: candidates restricted to the query's LSH bucket,
    * then exact cosine re-rank. Recall is tunable via `numPlanes`
    * (fewer planes → bigger buckets → higher recall, more work).
    * Buckets come from [[lshBucketTable]] (planeOffset 0 — bit-identical
    * to [[lshBucket]], so the embedded-constant DuckDB oracle is
    * unchanged): the native-dot form keeps the bucket expression a few
    * codegen'd loops instead of a dim×planes unrolled tree, which keeps
    * first-compile cost flat when the driver times a cold plan.
    * Requires graft functions registered.
    */
  def hyperplaneLshTopK(queries: DataFrame, candidates: DataFrame, k: Int,
                        dim: Int, numPlanes: Int): DataFrame = {
    val q = queries.select(col("id").as("query_id"), fixedVec(col("vec")).as("qv"))
      .withColumn("qn", normSqFixed(col("qv")))
      .withColumn("bucket", lshBucketTable(col("qv"), dim, numPlanes, 0))
    val c = candidates.select(col("id").as("cand_id"), fixedVec(col("vec")).as("cv"))
      .withColumn("cn", normSqFixed(col("cv")))
      .withColumn("bucket", lshBucketTable(col("cv"), dim, numPlanes, 0))
    val scored = c.join(broadcast(q), Seq("bucket"))
      .filter(col("query_id") =!= col("cand_id"))
      .withColumn("cosine",
        cosineFromFixed(dotFixed(col("qv"), col("cv")), col("qn"), col("cn")))
    scored
      .withColumn("rnk", row_number().over(Window.partitionBy(col("query_id"))
        .orderBy(col("cosine").desc, col("cand_id"))))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("cand_id"), col("cosine"), col("rnk"))
  }
}
