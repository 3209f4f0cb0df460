package graft.ann

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`Array[Float]`): brute-force cosine top-k
  * as the exact baseline, random-hyperplane LSH bucketing as the scale path.
  *
  * Scale design (100 TB / billions of vectors):
  *  - brute force is O(|Q|x|C|) and exists as the correctness baseline and for small
  *    |Q| with a broadcast query side -- the corpus is NEVER collected;
  *  - the LSH path shuffles the corpus ONCE on a bucket key (signature prefix); each
  *    query probes its own bucket plus `probes` Hamming-1 neighbors -- a bounded
  *    equi-join, no cross product;
  *  - vector math is zip_with/aggregate Catalyst expressions (codegen'd, no UDF).
  */
object AnnOps {

  // native codegen'd kernels (graft.expr.VecOps) — bit-identical to the HOF
  // folds they replaced (`aggregate(zip_with(...))`; VecOpsSpec pins parity):
  // HOFs evaluate interpreted, which dominated pair-quadratic verify paths (d12)
  def dot(a: Column, b: Column): Column = graft.expr.VecDot.expr(a, b)

  def l2Norm(a: Column): Column = sqrt(graft.expr.VecDot.expr(a, a))

  def cosine(a: Column, b: Column): Column = graft.expr.CosineSim.expr(a, b)

  /** Exact brute-force cosine top-k: every query row against every corpus row, ranked
    * per query. The query side is broadcast (callers pass a SMALL query set — this is
    * the baseline/oracle path, not the billion-vector path). */
  def bruteForceTopK(corpus: DataFrame, corpusId: String, corpusVec: String,
                     queries: DataFrame, queryId: String, queryVec: String,
                     k: Int): DataFrame = {
    val joined = corpus.crossJoin(broadcast(queries))
      .withColumn("cos", cosine(col(corpusVec), col(queryVec)))
    val w = Window.partitionBy(col(queryId)).orderBy(col("cos").desc, col(corpusId))
    joined.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(queryId), col(corpusId), round(col("cos"), 6).as("cos"), col("rank"))
  }

  /** Deterministic random hyperplanes (seeded Gaussian), as literal nested arrays. */
  def hyperplanes(nPlanes: Int, dim: Int, seed: Long = 42L): Seq[Seq[Double]] = {
    val rng = new scala.util.Random(seed)
    Seq.fill(nPlanes)(Seq.fill(dim)(rng.nextGaussian()))
  }

  /** Random-hyperplane signature: bit i = 1 when dot(v, plane_i) > 0, rendered as a
    * bit-string bucket key ("0110..."). */
  def rhSignature(vec: Column, planes: Seq[Seq[Double]]): Column = {
    val bits = planes.map { p =>
      val pArr = array(p.map(lit): _*)
      when(dot(vec, pArr) > 0.0, "1").otherwise("0")
    }
    concat(bits: _*)
  }

  /** All bucket keys within Hamming distance 1 of the signature (multi-probe LSH):
    * the signature itself plus each single-bit flip. */
  def probeKeys(sig: Column, nPlanes: Int): Column = {
    val flips = (0 until nPlanes).map { i =>
      concat(substring(sig, 1, i),
        when(substring(sig, i + 1, 1) === "1", "0").otherwise("1"),
        substring(sig, i + 2, nPlanes - i - 1))
    }
    array((sig +: flips): _*)
  }

  /** LSH-bucketed approximate cosine top-k: corpus bucketed by signature (one shuffle),
    * queries probe their bucket + Hamming-1 neighbors, cosine ranked within candidates.
    * Recall vs [[bruteForceTopK]] is property-tested (>= 0.9 on planted neighbors). */
  def lshTopK(corpus: DataFrame, corpusId: String, corpusVec: String,
              queries: DataFrame, queryId: String, queryVec: String,
              k: Int, nPlanes: Int = 12, dim: Int = 64, seed: Long = 42L): DataFrame = {
    val planes = hyperplanes(nPlanes, dim, seed)
    val bucketed = corpus.withColumn("_bkt", rhSignature(col(corpusVec), planes))
    val probed = queries
      .withColumn("_sig", rhSignature(col(queryVec), planes))
      .withColumn("_bkt", explode(probeKeys(col("_sig"), nPlanes)))
      .drop("_sig")
    val cands = bucketed.join(probed, "_bkt")
      .withColumn("cos", cosine(col(corpusVec), col(queryVec)))
    val w = Window.partitionBy(col(queryId)).orderBy(col("cos").desc, col(corpusId))
    cands.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(queryId), col(corpusId), round(col("cos"), 6).as("cos"), col("rank"))
  }

  /** IVF-style coarse quantization: assign each vector to its nearest of `centroids`
    * (small, broadcast as literals); search probes the `nProbe` nearest centroid
    * posting lists only. Centroids come from a driver-side sample (a real system would
    * k-means them; nearest-of-sample preserves the partitioning contract). */
  def ivfAssign(vec: Column, centroids: Seq[Seq[Double]]): Column =
    // Native codegen'd argmax (graft.expr.IvfAssignNative) — bit-identical to
    // the HOF fold below (PqNativeSpec pins parity + codegen/interp parity);
    // the HOF form stays as the parity reference and semantics documentation.
    graft.expr.IvfAssignNative.expr(vec, centroids)

  private[graft] def ivfAssignHof(vec: Column, centroids: Seq[Seq[Double]]): Column = {
    // Centroids ride as ONE nested-array literal and the argmax is an HOF fold:
    // the expression tree is O(1) in k, not O(k*dim) unrolled terms — k*dim unrolled
    // blows past the 64 KB codegen method limit for realistic (k, dim) and drops the
    // whole stage to interpreted mode. Ties go to the HIGHER cid (>=, matching the
    // lexicographic `greatest` this replaces and the e6/e8 oracles' `cid DESC`).
    // Seed with centroid 0's ACTUAL score, not a (-Inf, -1) sentinel: with a sentinel
    // seed, a vector whose every cosine is NULL (null element / length mismatch)
    // keeps cid = -1, which downstream index lookups (ivfPqTopK's
    // element_at(lut, code+1)) turn into an index-0 error; seeding with index 0
    // makes null-cosine inputs land deterministically in cell 0. A NaN-component
    // vector is different: Spark comparisons rank NaN LARGEST (`NaN >= x` is
    // true), so every candidate replaces the seed and all-NaN vectors land in
    // cell k-1 — still a valid cell (PqNativeSpec pins both contracts).
    // The seed score is nanvl-guarded: a NaN centroid 0 (degenerate training input)
    // would otherwise win every `cos >= best.cos` comparison under NaN-largest
    // ordering against finite candidates on the STRUCT field path; -Inf lets any
    // finite centroid win.
    val cb = typedlit(centroids)
    if (centroids.size == 1) lit(0).cast("int")
    else {
      val seed0 = struct(
        nanvl(cosine(vec, element_at(cb, 1)), lit(Double.NegativeInfinity)).as("cos"),
        lit(0).cast("int").as("cid"))
      // sequence(1, k-1) needs k >= 2: Spark's sequence(1, 0) is DESCENDING [1, 0]
      aggregate(sequence(lit(1), lit(centroids.size - 1)), seed0,
        (best, i) => {
          val cos = cosine(vec, element_at(cb, i + 1))
          when(cos >= best.getField("cos"),
            struct(cos.as("cos"), i.cast("int").as("cid"))).otherwise(best)
        }).getField("cid")
    }
  }

  /** One (spherical) k-means update step over an embedding corpus: assign every
    * vector to its nearest centroid ([[ivfAssign]] — max cosine, ties to the higher
    * cid), then recompute each centroid as the per-dimension mean of its members.
    * Returns (cid, n, centroid: array<double>); callers iterate, renormalize, or
    * feed the result back into [[ivfTopK]] as the next round's cells.
    *
    * Scale shape: centroids are k small literals compiled into the assignment
    * expression (no join, no broadcast table), and the per-dimension sums are `dim`
    * independent SUM aggregates — map-side partial aggregation applies, so the single
    * shuffle carries k*dim decimals per partition, not the vectors. Sums go through
    * DECIMAL(27,10) so the result is addition-order independent (bit-identical across
    * partitionings and engines). Unused dimensions prune: a caller projecting 2 of 64
    * mean components pays for 2 aggregates, not 64. */
  def kmeansStep(df: DataFrame, vecCol: String, centroids: Seq[Seq[Double]]): DataFrame = {
    val dim = centroids.head.size
    val sums = (0 until dim).map(j =>
      sum(element_at(col(vecCol), j + 1).cast("decimal(27,10)")).as(s"_s$j"))
    df.withColumn("_cell", ivfAssign(col(vecCol), centroids))
      .groupBy(col("_cell"))
      .agg(count(lit(1)).as("n"), sums: _*)
      .select(col("_cell").cast("long").as("cid"), col("n"),
        array((0 until dim).map(j =>
          col(s"_s$j").cast("double") / col("n")): _*).as("centroid"))
  }

  /** Iterate [[kmeansStep]] to train spherical IVF centroids — the production path
    * the driver-sample inits stand in for. Each round is ONE partial-aggregated
    * shuffle of k×dim decimals; the per-round collect is centroid-sized (k×dim
    * doubles), never data. Empty cells keep their previous centroid, so k is stable
    * across rounds. Deterministic given a deterministic `init` (decimal sums are
    * addition-order independent). */
  def kmeansTrain(df: DataFrame, vecCol: String, init: Seq[Seq[Double]],
                  iters: Int = 5): Seq[Seq[Double]] =
    (0 until iters).foldLeft(init) { (cents, _) =>
      val byCid = kmeansStep(df, vecCol, cents)
        .select(col("cid"), col("centroid")).collect()
        .map(r => r.getLong(0).toInt -> r.getSeq[Double](1).toSeq).toMap
      cents.indices.map(ci => byCid.getOrElse(ci, cents(ci)))
    }

  /** IVF cell assignment against a centroid TABLE: broadcast the k centroids,
    * score every (vector, centroid) pair with the native cosine, take the
    * per-vector argmax as `max(struct(cos, cid))` — Spark's struct ordering
    * ranks NaN largest and breaks cosine ties on the HIGHER cid, exactly the
    * `ivfAssign` fold contract (all-null cosines fall back to cell 0 the same
    * way). The n x k score table exists only inside the map-side partial
    * aggregate; the exchange carries one row per vector. */
  def ivfAssignByJoin(vecs: DataFrame, idCol: String, vecCol: String,
                      centroidsDf: DataFrame): DataFrame = {
    val assigned = vecs.select(col(idCol), col(vecCol))
      .crossJoin(broadcast(centroidsDf))
      .withColumn("_cos", cosine(col(vecCol), col("centroid")))
      .groupBy(col(idCol))
      .agg(max(struct(col("_cos"), col("cid"))).as("_best"))
      .select(col(idCol),
        when(col("_best").getField("_cos").isNull, lit(0))
          .otherwise(col("_best").getField("cid")).cast("int").as("_cell"))
    vecs.join(assigned, Seq(idCol))
  }

  /** TABLE-form k-means training — closes [[kmeansTrain]]'s plan-literal
    * scale ceiling (VERDICT r14 "What's wrong #1"): the literal trainer
    * embeds all k×dim centroids into every iteration's plan, so at
    * SemDeDup's own k = ceil(sqrt(n)) policy (k ≈ 31k at n = 10⁹, ~16M
    * doubles of literals per round) plan ANALYSIS dies long before data
    * does. Here centroids stay a k-row DataFrame end-to-end: each round's
    * assignment is [[ivfAssignByJoin]] (ONE broadcast of the centroid
    * table, the exchange carries one best-cell row per vector) and the
    * update is the same partial-aggregated decimal-sum groupBy as
    * [[kmeansStep]] — so k is bounded by broadcast size, not plan size.
    *
    * BIT-IDENTICAL to [[kmeansTrain]] given the same init (DedupAnnSpec
    * pins it): the assignment contract is pinned equal to the `ivfAssign`
    * fold (ties → higher cid, NaN-largest, all-null → cell 0), the sums are
    * the same order-independent decimal(27,10)s, and the mean is the same
    * `sum.cast(double) / n` division. Empty cells keep their previous
    * centroid via the left-join fallback. Each round localCheckpoints the
    * k-row iterate — it feeds both the next assignment and the fallback
    * join, and an un-truncated lineage would double per round (the d7
    * rule).
    *
    * @param initDf (cid: int, centroid: array<double>), k rows
    * @return       (cid: int, centroid: array<double>), k rows */
  def kmeansTrainTable(df: DataFrame, idCol: String, vecCol: String,
                       initDf: DataFrame, dim: Int, iters: Int = 5): DataFrame = {
    val vecs = df.select(col(idCol), col(vecCol).cast("array<double>").as(vecCol))
    val sums = (0 until dim).map(j =>
      sum(element_at(col(vecCol), j + 1).cast("decimal(27,10)")).as(s"_s$j"))
    (0 until iters).foldLeft(initDf.select(col("cid").cast("int").as("cid"),
        col("centroid").cast("array<double>").as("centroid"))) { (cents, _) =>
      val upd = ivfAssignByJoin(vecs, idCol, vecCol, cents)
        .groupBy(col("_cell"))
        .agg(count(lit(1)).as("n"), sums: _*)
        .select(col("_cell").cast("int").as("cid"),
          array((0 until dim).map(j =>
            col(s"_s$j").cast("double") / col("n")): _*).as("_newc"))
      cents.join(upd, Seq("cid"), "left")
        .select(col("cid"),
          coalesce(col("_newc"), col("centroid")).as("centroid"))
        .localCheckpoint()
    }
  }

  /** Per-vector int8 scalar quantization — the storage path for billion-vector
    * corpora (4x smaller than float32, 8x than float64; IVF+SQ is the standard
    * pairing). Codes are `round((v - mn) / (mx - mn) * 255) - 128` with the
    * per-vector (mn, mx) kept alongside for dequantization; a constant vector
    * (mx == mn) encodes as all-zero codes. Pure HOF expressions — quantize at scan
    * speed, no UDF. Returns struct(codes: array<int>, mn, mx). */
  def quantizeInt8(vec: Column): Column = {
    val mn = array_min(vec)
    val mx = array_max(vec)
    val codes = transform(vec, v =>
      when(mx === mn, lit(0))
        .otherwise((round((v - mn) / (mx - mn) * 255) - 128).cast("int")))
    struct(codes.as("codes"), mn.as("mn"), mx.as("mx"))
  }

  /** Inverse of [[quantizeInt8]]: `(code + 128) / 255 * (mx - mn) + mn`. Max absolute
    * reconstruction error is (mx - mn) / 510 per component (property-tested). */
  def dequantizeInt8(q: Column): Column = {
    val mn = q.getField("mn"); val mx = q.getField("mx")
    transform(q.getField("codes"), c =>
      when(mx === mn, mn).otherwise((c + 128).cast("double") / 255 * (mx - mn) + mn))
  }

  /** Asymmetric scalar-quantized top-k — the SEARCH half of the
    * [[quantizeInt8]] storage path (faiss's SQ8 flat index shape): the corpus
    * lives as int8 codes + per-vector (mn, mx), queries stay float, and the
    * score is EXACTLY `dot(query, dequantize(codes))` without materializing
    * the dequantized vector, via the expansion
    *
    *   score = (mx − mn)/255 · Σᵢ qᵢ·(cᵢ+128)  +  mn · Σᵢ qᵢ
    *
    * — one integer-weighted fold over the codes plus one query-only sum, all
    * codegen'd HOFs at scan speed. Ranking is identical to brute force over
    * the dequantized corpus (property-pinned), at 8× less corpus I/O than
    * float64 — the memory-bandwidth win IS the point at 100 TB; compose with
    * [[ivfAssign]] cell pruning (e4) for the compute win, exactly like
    * IVF+PQ (e8). Queries broadcast (query batches are small); ties rank by
    * corpus id ascending; score rounded 6dp (engine-portable).
    * Output: (queryId, corpusId, score, rank ≤ k). */
  def sqTopK(corpus: DataFrame, corpusId: String, sqCol: String,
             queries: DataFrame, queryId: String, queryVec: String,
             k: Int): DataFrame = {
    require(k >= 1, "k >= 1")
    corpus
      .crossJoin(broadcast(
        queries.select(col(queryId).as("_qid"), col(queryVec).as("_qv"))))
      .withColumn("score", sqScore(col("_qv"), col(sqCol)))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("_qid"))
          .orderBy(col("score").desc, col(corpusId))))
      .filter(col("rank") <= k)
      .select(col("_qid").as(queryId), col(corpusId), col("score"), col("rank"))
  }

  /** The shared SQ asymmetric score (6dp-rounded): exactly
    * `dot(qv, dequantize(sq))` via the integer-fold expansion — ONE
    * definition behind [[sqTopK]] and [[ivfSqTopK]] so the flat and
    * cell-pruned paths cannot drift. Native codegen'd kernel
    * ([[graft.expr.SqDot]] — the interpreted HOF fold measured 47.6 s on
    * e12's 20M-candidate 100× stream; VecOpsSpec pins HOF parity). */
  private def sqScore(qv: Column, sq: Column): Column =
    round(graft.expr.SqDot.expr(qv, sq), 6)

  /** IVF + SQ top-k — [[sqTopK]] with [[ivfAssign]]'s cell pruning, the SQ
    * row of the quantized-index matrix (IVF+PQ = e8, IVF+SQ = this): the
    * INDEX stores only (id, cell, int8 codes + (mn, mx)) — the float vectors
    * are dropped after index build, an 8× storage/bandwidth cut — and a query
    * scans just its `nProbe` probed cells, scored by the same asymmetric
    * integer-fold expansion as the flat op. Same posting-list plan as
    * [[ivfTopK]]: one corpus pass to cells, probes broadcast, equi-join on
    * cell id; recall loss is ivfTopK's (neighbors outside probed cells) plus
    * SQ's quantization error (bounded at (mx−mn)/510 per component). */
  def ivfSqTopK(corpus: DataFrame, corpusId: String, corpusVec: String,
                queries: DataFrame, queryId: String, queryVec: String,
                centroids: Seq[Seq[Double]], nProbe: Int, k: Int): DataFrame = {
    require(k >= 1, "k >= 1")
    val indexed = corpus
      .withColumn("_cell", ivfAssign(col(corpusVec), centroids))
      .withColumn("_sq", quantizeInt8(col(corpusVec)))
      .select(col(corpusId), col("_cell"), col("_sq"))
    val probed = queries
      .withColumn("_cell", explode(ivfProbes(col(queryVec), centroids, nProbe)))
      .select(col(queryId).as("_qid"), col(queryVec).as("_qv"), col("_cell"))
    indexed.join(broadcast(probed), "_cell")
      .withColumn("score", sqScore(col("_qv"), col("_sq")))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("_qid"))
          .orderBy(col("score").desc, col(corpusId))))
      .filter(col("rank") <= k)
      .select(col("_qid").as(queryId), col(corpusId), col("score"), col("rank"))
  }

  /** Deterministic product-quantization codebooks: `m` subspaces × `k` centroids of
    * `subDim` dims (seeded Gaussian — a production system k-means-trains them, e.g.
    * by iterating [[kmeansStep]] per subspace; the codec contract is identical). */
  def pqCodebooks(m: Int, k: Int, subDim: Int, seed: Long = 42L): Seq[Seq[Seq[Double]]] =
    (0 until m).map(i => hyperplanes(k, subDim, seed + i))

  /** Product quantization encode: split the vector into `m` contiguous subvectors,
    * assign each to its nearest (L2) subspace centroid — ties to the lowest code.
    * Returns struct(codes: array<int>, mse: double): the codes are the PQ storage
    * payload (m bytes at k ≤ 256 — 32× smaller than float64×dim), and `mse` is the
    * exact per-vector reconstruction MSE, free here because the squared distance to
    * the chosen centroid IS the subspace's reconstruction error (no decode needed).
    *
    * Pure literal-centroid expressions (no join, no UDF, scan-speed) — same shape as
    * [[ivfAssign]]; distances are fixed-order double sums so an external engine
    * replicates bit-for-bit. */
  def pqEncode(vec: Column, codebooks: Seq[Seq[Seq[Double]]]): Column =
    // Native codegen'd encode (graft.expr.PqEncodeNative) — bit-identical to
    // the HOF fold below (PqNativeSpec pins parity + codegen/interp parity).
    graft.expr.PqEncodeNative.expr(vec, codebooks)

  private[graft] def pqEncodeHof(vec: Column, codebooks: Seq[Seq[Seq[Double]]]): Column = {
    val m = codebooks.size
    val k = codebooks.head.size
    val subDim = codebooks.head.head.size
    // Codebooks as ONE nested-array literal + HOF folds (see [[ivfAssign]]): the
    // unrolled m*k*subDim squared-diff tree exceeded the 64 KB codegen method limit.
    // Fold order is preserved exactly (left-to-right over j, seed 0.0 — `0.0 + x²`
    // is bit-identical to `x²`), so DuckDB `list_sum(list_transform(...))` oracles
    // still match bit-for-bit. Ties go to the LOWEST code (strict <, matching the
    // lexicographic `least` this replaces and the e7/e8 oracles' `ci ASC`).
    val cb = typedlit(codebooks)
    val perSub = transform(sequence(lit(0), lit(m - 1)), s => {
      val sub = element_at(cb, s + 1)
      aggregate(sequence(lit(0), lit(k - 1)),
        struct(lit(Double.MaxValue).as("dist"), lit(-1).as("code")),
        (best, ci) => {
          val c = element_at(sub, ci + 1)
          val d = aggregate(sequence(lit(1), lit(subDim)), lit(0.0), (acc, j) => {
            val x = element_at(vec, s * lit(subDim) + j) - element_at(c, j)
            acc + x * x
          })
          when(d < best.getField("dist"),
            struct(d.as("dist"), ci.cast("int").as("code"))).otherwise(best)
        })
    })
    struct(
      transform(perSub, p => p.getField("code")).as("codes"),
      aggregate(transform(perSub, p => p.getField("dist")), lit(0.0),
        (acc, d) => acc + d).as("sse"))
  }

  /** IVF-ADC top-k search — the billion-vector serving path: corpus vectors are
    * stored as (cell, PQ codes) only; each query probes its `nProbe` nearest cells
    * and scores candidates by ASYMMETRIC DISTANCE COMPUTATION: a per-query lookup
    * table lut[s][ci] = ||q_s − codebook_s[ci]||² (m×k doubles, built as literal
    * expressions on the broadcast query side), so a candidate's approximate L2² is
    * m array lookups + adds — no vector math touches the corpus at query time.
    *
    * Scale shape: ONE corpus pass (assign + encode, scan-speed), one equi-join on
    * the cell id against |Q|×nProbe broadcast probe rows — never a cross product;
    * the shuffled corpus payload is m bytes of codes per vector, not the vector.
    * Cells are spherical (cosine) like [[ivfAssign]]; ADC is L2 on the raw vectors —
    * the standard pairing for near-unit-norm embeddings (L2² ≈ 2−2cos there).
    * Exactness trade-off is bounded by the PQ reconstruction error (see
    * [[pqEncode]]'s mse); recall is property-tested against brute force. */
  def ivfPqTopK(corpus: DataFrame, corpusId: String, corpusVec: String,
                queries: DataFrame, queryId: String, queryVec: String,
                centroids: Seq[Seq[Double]], codebooks: Seq[Seq[Seq[Double]]],
                nProbe: Int, k: Int): DataFrame = {
    val m = codebooks.size
    val subDim = codebooks.head.head.size
    // The (id, cell, codes) table IS the IVF-PQ index: persist it so the wide
    // encode expression (m*k*subDim terms — past the 64 KB codegen method limit,
    // so it runs interpreted) is evaluated exactly once per corpus row instead of
    // being re-planned/re-evaluated by every downstream stage (sort, window, AQE
    // re-optimizations). A production system writes this table out once and serves
    // many query batches from it; the persist is the single-job analog.
    val assigned = corpus
      .withColumn("_cell", ivfAssign(col(corpusVec), centroids))
      .withColumn("_codes", pqEncode(col(corpusVec), codebooks).getField("codes"))
      .select(col(corpusId), col("_cell"), col("_codes"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cbLit = typedlit(codebooks)
    val lut = transform(sequence(lit(0), lit(m - 1)), s => {
      val sub = element_at(cbLit, s + 1)
      transform(sub, c =>
        aggregate(sequence(lit(1), lit(subDim)), lit(0.0), (acc, j) => {
          val x = element_at(col(queryVec), s * lit(subDim) + j) - element_at(c, j)
          acc + x * x
        }))
    })
    // Materialize the per-query LUTs too (|Q|*nProbe rows of m*k doubles): the LUT
    // literal-expression tree is another >64 KB codegen blowout, and pinning it keeps
    // the broadcast build + every AQE re-plan reading values, not re-deriving them.
    val probed = queries
      .withColumn("_cell", explode(ivfProbes(col(queryVec), centroids, nProbe)))
      .withColumn("_lut", lut)
      .select(col(queryId), col("_cell"), col("_lut"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val adc = (0 until m).map(s =>
      element_at(element_at(col("_lut"), s + 1), element_at(col("_codes"), s + 1) + 1))
      .reduce(_ + _)
    val w = Window.partitionBy(col(queryId)).orderBy(col("adc").asc, col(corpusId))
    assigned.join(broadcast(probed), "_cell")
      .withColumn("adc", adc)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(queryId), col(corpusId), round(col("adc"), 6).as("adc"), col("rank"))
  }

  /** Residual IVF-PQ top-k (the FAISS-standard `IndexIVFPQ` encoding: PQ codes
    * quantize `v − centroid(cell)`, not the raw vector). Residuals concentrate
    * near the origin, so the same codebook budget spends its resolution on the
    * within-cell geometry — reconstruction error drops without more bytes. The
    * query side builds one ADC LUT PER PROBED CELL from the query's residual in
    * that cell (each candidate is scored with the LUT of its own cell, matched
    * through the cell key in the probe join).
    *
    * Same scale shape as [[ivfPqTopK]]: the (id, cell, codes) table is the
    * persisted index (codes are the shuffle payload, never vectors), the
    * |Q|×nProbe LUT table broadcasts, and the candidate join is an equi-join on
    * the cell. Expression arithmetic keeps [[pqEncode]]'s fixed fold order, so
    * the op carries a bit-exact SQL oracle. */
  def ivfPqResidualTopK(corpus: DataFrame, corpusId: String, corpusVec: String,
                        queries: DataFrame, queryId: String, queryVec: String,
                        centroids: Seq[Seq[Double]],
                        codebooks: Seq[Seq[Seq[Double]]],
                        nProbe: Int, k: Int): DataFrame = {
    val m = codebooks.size
    val subDim = codebooks.head.head.size
    val centLit = typedlit(centroids)
    def residual(v: Column, cell: Column): Column =
      zip_with(v, element_at(centLit, cell.cast("int") + 1), (a, b) => a - b)
    val assigned = corpus
      .withColumn("_cell", ivfAssign(col(corpusVec), centroids))
      // FUSED residual+encode (graft.expr.PqEncodeNative, residual = true):
      // one native pass subtracts the cell centroid and PQ-encodes without
      // materializing the residual array — bit-identical to
      // `pqEncodeHof(residual(vec, cell), codebooks)` (PqNativeSpec pins it).
      .withColumn("_codes",
        graft.expr.PqEncodeNative.residualExpr(col(corpusVec), col("_cell"),
          centroids, codebooks).getField("codes"))
      .select(col(corpusId), col("_cell"), col("_codes"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cbLit = typedlit(codebooks)
    val lut = transform(sequence(lit(0), lit(m - 1)), s => {
      val sub = element_at(cbLit, s + 1)
      transform(sub, c =>
        aggregate(sequence(lit(1), lit(subDim)), lit(0.0), (acc, j) => {
          val x = element_at(col("_qres"), s * lit(subDim) + j) - element_at(c, j)
          acc + x * x
        }))
    })
    val probed = queries
      .withColumn("_cell", explode(ivfProbes(col(queryVec), centroids, nProbe)))
      .withColumn("_qres", residual(col(queryVec), col("_cell")))
      .withColumn("_lut", lut)
      .select(col(queryId), col("_cell"), col("_lut"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val adc = (0 until m).map(s =>
      element_at(element_at(col("_lut"), s + 1), element_at(col("_codes"), s + 1) + 1))
      .reduce(_ + _)
    val w = Window.partitionBy(col(queryId)).orderBy(col("adc").asc, col(corpusId))
    assigned.join(broadcast(probed), "_cell")
      .withColumn("adc", adc)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(queryId), col(corpusId), round(col("adc"), 6).as("adc"), col("rank"))
  }

  /** L2 k-means assignment (ties to the lowest id) — the PQ-side analog of the
    * cosine [[ivfAssign]]. */
  def l2Assign(vec: Column, centroids: Seq[Seq[Double]]): Column = {
    val dim = centroids.head.size
    val scored = centroids.zipWithIndex.map { case (c, i) =>
      val d = (0 until dim).map { j =>
        val x = element_at(vec, j + 1) - lit(c(j)); x * x
      }.reduce(_ + _)
      struct(d.as("dist"), lit(i).as("cid"))
    }
    (if (scored.size == 1) scored.head else least(scored: _*)).getField("cid")
  }

  /** One L2 k-means update over `df(vecCol)`: assign to literal centroids, recompute
    * per-dimension means (same partial-agg decimal-sum shape as [[kmeansStep]], which
    * is its spherical twin). Empty cells keep their previous centroid. Returns the
    * updated centroids driver-side (k×dim doubles — centroid-sized, not data). */
  def l2KmeansStep(df: DataFrame, vecCol: String,
                   centroids: Seq[Seq[Double]]): Seq[Seq[Double]] = {
    val dim = centroids.head.size
    val sums = (0 until dim).map(j =>
      sum(element_at(col(vecCol), j + 1).cast("decimal(27,10)")).as(s"_s$j"))
    val rows = df.withColumn("_cell", l2Assign(col(vecCol), centroids))
      .groupBy(col("_cell"))
      .agg(count(lit(1)).as("n"), sums: _*)
      .collect()
      .map(r => r.getInt(0) -> (r.getLong(1), (0 until dim).map(j =>
        r.getDecimal(j + 2).doubleValue()))).toMap
    centroids.indices.map { ci =>
      rows.get(ci) match {
        case Some((n, s)) if n > 0 => s.map(_ / n)
        case _ => centroids(ci)
      }
    }
  }

  /** Train PQ codebooks by per-subspace Lloyd iterations over the corpus — the
    * production path the seeded [[pqCodebooks]] stand in for.
    *
    * ALL m subspaces train in ONE scan+shuffle per iteration (not m): the vector
    * posexplodes into (subspace, subvector) rows, each row folds over ITS subspace's
    * k centroids (HOF on the nested codebook literal — same shape as [[pqEncode]]),
    * and a single groupBy(subspace, code) carries m×k×subDim decimal partial sums.
    * The per-iteration collect is codebook-sized. Assignment ties go to the lowest
    * code (strict <) and sums are order-independent decimals, so results are
    * bit-identical to training each subspace separately with [[l2KmeansStep]].
    * Empty cells keep their previous centroid. */
  def pqTrain(df: DataFrame, vecCol: String, m: Int, k: Int, subDim: Int,
              init: Seq[Seq[Seq[Double]]], iters: Int = 5): Seq[Seq[Seq[Double]]] = {
    val subs = df.select(posexplode(transform(sequence(lit(0), lit(m - 1)),
      s => slice(col(vecCol), s * lit(subDim) + 1, lit(subDim)))))
      .toDF("_s", "_sub")
    val sums = (0 until subDim).map(j =>
      sum(element_at(col("_sub"), j + 1).cast("decimal(27,10)")).as(s"_sum$j"))
    (0 until iters).foldLeft(init) { (cbs, _) =>
      val cbLit = typedlit(cbs)
      val assign = aggregate(sequence(lit(0), lit(k - 1)),
        struct(lit(Double.MaxValue).as("dist"), lit(-1).as("code")),
        (best, ci) => {
          val c = element_at(element_at(cbLit, col("_s") + 1), ci + 1)
          val d = aggregate(sequence(lit(1), lit(subDim)), lit(0.0), (acc, j) => {
            val x = element_at(col("_sub"), j) - element_at(c, j)
            acc + x * x
          })
          when(d < best.getField("dist"),
            struct(d.as("dist"), ci.cast("int").as("code"))).otherwise(best)
        }).getField("code")
      val rows = subs.withColumn("_code", assign)
        .groupBy(col("_s"), col("_code"))
        .agg(count(lit(1)).as("n"), sums: _*)
        .collect()
        .map(r => (r.getInt(0), r.getInt(1)) ->
          ((r.getLong(2), (0 until subDim).map(j => r.getDecimal(j + 3).doubleValue()))))
        .toMap
      (0 until m).map(s => (0 until k).map(ci => rows.get((s, ci)) match {
        case Some((n, sm)) if n > 0 => sm.map(_ / n)
        case _ => cbs(s)(ci)
      }))
    }
  }

  /** Inverse of [[pqEncode]]: concatenate each code's centroid. */
  def pqDecode(codes: Column, codebooks: Seq[Seq[Seq[Double]]]): Column = {
    val cb = typedlit(codebooks)
    flatten(transform(sequence(lit(0), lit(codebooks.size - 1)),
      s => element_at(element_at(cb, s + 1), element_at(codes, s + 1) + 1)))
  }

  /** The `nProbe` centroid ids nearest to `vec` (cos desc, cid desc on ties —
    * the same ordering [[ivfAssign]]'s `greatest` uses for the top-1). */
  def ivfProbes(vec: Column, centroids: Seq[Seq[Double]], nProbe: Int): Column = {
    val cb = typedlit(centroids)
    val scored = transform(sequence(lit(0), lit(centroids.size - 1)), i =>
      struct(cosine(vec, element_at(cb, i + 1)).as("cos"), i.cast("int").as("cid")))
    transform(slice(reverse(array_sort(scored)), 1, nProbe),
      s => s.getField("cid"))
  }

  /** IVF search: corpus vectors live in their [[ivfAssign]] posting list (ONE pass,
    * one shuffle on the centroid id); each query brute-forces only the `nProbe`
    * nearest posting lists. The probe side is |Q| x nProbe rows — broadcast — so the
    * candidate join is an equi-join on `cid`, never a cross product. Recall loss is
    * confined to neighbors assigned outside the probed cells (property-tested). */
  def ivfTopK(corpus: DataFrame, corpusId: String, corpusVec: String,
              queries: DataFrame, queryId: String, queryVec: String,
              centroids: Seq[Seq[Double]], nProbe: Int, k: Int): DataFrame = {
    val assigned = corpus.withColumn("_cell", ivfAssign(col(corpusVec), centroids))
    val probed = queries.withColumn("_cell",
      explode(ivfProbes(col(queryVec), centroids, nProbe)))
    val cands = assigned.join(broadcast(probed), "_cell")
      .withColumn("cos", cosine(col(corpusVec), col(queryVec)))
    val w = Window.partitionBy(col(queryId)).orderBy(col("cos").desc, col(corpusId))
    cands.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(queryId), col(corpusId), round(col("cos"), 4).as("cos"), col("rank"))
  }

  /** IVF RANGE search — all corpus vectors with cosine >= `minCos` of each query
    * (the radius-query API top-k can't express: "everything this similar", the
    * retrieval-augmentation and near-dup-audit shape). Same posting-list plan as
    * [[ivfTopK]] — one corpus pass to cells, broadcast probes, equi-join on the
    * cell id — but the filter is a threshold instead of a rank window, so the op
    * needs NO window shuffle at all: candidates stream through a codegen'd
    * cosine + filter. Recall loss is identical to ivfTopK's (neighbors outside
    * the probed cells), property-tested in DedupAnnSpec. */
  def ivfRangeSearch(corpus: DataFrame, corpusId: String, corpusVec: String,
                     queries: DataFrame, queryId: String, queryVec: String,
                     centroids: Seq[Seq[Double]], nProbe: Int,
                     minCos: Double): DataFrame = {
    val assigned = corpus.withColumn("_cell", ivfAssign(col(corpusVec), centroids))
    val probed = queries.withColumn("_cell",
      explode(ivfProbes(col(queryVec), centroids, nProbe)))
    // each corpus vector lives in exactly ONE cell (ivfAssign is argmax) and the
    // probe list is distinct, so a (query, corpus) pair can only meet once — no
    // dedup needed, and with the probes broadcast the whole op is SHUFFLE-FREE
    assigned.join(broadcast(probed), "_cell")
      .withColumn("cos", cosine(col(corpusVec), col(queryVec)))
      .filter(col("cos") >= minCos)
      .select(col(queryId), col(corpusId), round(col("cos"), 4).as("cos"))
  }
}
