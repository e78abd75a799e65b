package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Deduplication operators over `documents` — exact, n-gram-Jaccard,
  * MinHash+LSH, and SimHash. The scale story differs per op and is the
  * point:
  *
  *  - exact / fingerprint dedup: one hash-groupBy shuffle, linear at 100 TB;
  *  - `jaccardPairs` is the EXACT all-pairs baseline (quadratic — usable as
  *    a verifier at small n, never the production path);
  *  - `minhashNearDup` is the production path: shingle → 128-perm MinHash
  *    signature → 32×4 LSH banding → candidates via an equi-join on
  *    (band, band-hash) → exact Jaccard verification of candidates only.
  *    No all-pairs comparison anywhere; every step is a scan, an explode,
  *    or a hash join on a band key.
  *  - `simhash` folds each doc to a 64-bit signature in a single
  *    shuffle-free projection; near-dup candidates come from an XOR
  *    popcount join on the signature.
  */
object DedupOps {

  private def tokens(c: Column): Column =
    filter(split(trim(c), " "), t => t =!= "")

  /** Distinct 3-token shingles (empty when the doc has < 3 tokens). */
  private def shingleExpr: Column = expr(
    """CASE WHEN size(toks) < 3 THEN array()
      |ELSE array_distinct(transform(sequence(1, size(toks) - 2),
      |  i -> concat_ws(' ', element_at(toks, i), element_at(toks, i + 1),
      |                 element_at(toks, i + 2)))) END""".stripMargin)

  /** Shingled documents, cached per (session, sfDir): the shingle
    * projection is an interpreted higher-order transform, and the LSH +
    * verify DAG references it on up to six branches (both band-join sides,
    * both inverted-index sides, both size lookups) — without the persist
    * each branch recomputes it (~3-5 s each at sf0.1, the dominant cost of
    * minhash_near_dup). The cached frame is 1 row/doc of short strings;
    * entries evict on session end ([[graft.SessionFrameCache]]). */
  private val shingleCache = new graft.SessionFrameCache[String]

  /** (doc_id, sh) for any documents-shaped frame (doc_id + text) — the
    * shared entry into the MinHash family for both the batch corpus path
    * and the streaming ingest-dedup path. */
  def shingleFrame(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), tokens(col("text")).as("toks"))
      .withColumn("sh", shingleExpr)
      .select(col("doc_id"), col("sh"))

  private def withShingles(spark: SparkSession, sfDir: String): DataFrame =
    shingleCache.getOrElseUpdate(spark, sfDir) {
      shingleFrame(Tables.documents(spark, sfDir))
    }

  /** Exact dedup by content hash (whitespace-normalized, lowercased —
    * [[TextOps.normText]], the shared canonical content key):
    * keeper = min doc_id per group. One shuffle on the 128-bit hash. */
  def exactDedup(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .groupBy(md5(TextOps.normText(col("text"))).as("content_hash"))
      .agg(count(lit(1)).as("n_copies"), min(col("doc_id")).as("keeper_doc_id"))
      .orderBy("keeper_doc_id")

  /** Exact Jaccard over a set of candidate (doc_a, doc_b) pairs, computed
    * relationally: explode shingles into an inverted index, equi-join on
    * the shingle, count the co-occurrences per pair (= |A ∩ B|), and use
    * |A ∪ B| = |A| + |B| − |A ∩ B|. Every step is a hash join or a hash
    * aggregate — no per-pair array intersection (which is interpreted, not
    * codegen'd, and measured ~100x slower at sf0.1). `candidates` may be
    * null, meaning all co-occurring pairs (a < b). */
  private def exactJaccard(shingled: DataFrame, candidates: Option[DataFrame]): DataFrame = {
    val sizes = shingled.select(col("doc_id"), size(col("sh")).as("n_sh"))
    val ex = shingled.select(col("doc_id"), explode(col("sh")).as("g"))
    // With candidates: drive the co-occurrence join FROM the candidate
    // pairs (cand ⋈ shingles(a) ⋈ shingles(b)) so only candidate pairs are
    // ever expanded. Building the full inverted-index join first and
    // semi-joining after would expand every co-occurring pair in the
    // corpus (measured 105 s vs <10 s at sf0.1 — frequent shingles make
    // the unscoped join quadratic in their document frequency).
    val counted = candidates match {
      case Some(c) =>
        c.join(ex.as("ea"), col("doc_a") === col("ea.doc_id"))
          .join(ex.as("eb"),
            col("doc_b") === col("eb.doc_id") && col("ea.g") === col("eb.g"))
          .groupBy(col("doc_a"), col("doc_b"))
      case None =>
        ex.as("ea").join(ex.as("eb"),
            col("ea.g") === col("eb.g") && col("ea.doc_id") < col("eb.doc_id"))
          .groupBy(col("ea.doc_id").as("doc_a"), col("eb.doc_id").as("doc_b"))
    }
    counted
      .agg(count(lit(1)).as("inter"))
      .join(sizes.select(col("doc_id").as("doc_a"), col("n_sh").as("n_a")), "doc_a")
      .join(sizes.select(col("doc_id").as("doc_b"), col("n_sh").as("n_b")), "doc_b")
      .select(col("doc_a"), col("doc_b"),
        (col("inter").cast("double") / (col("n_a") + col("n_b") - col("inter")))
          .as("jaccard"))
  }

  /** Exact Jaccard for given candidate (doc_a, doc_b) pairs over one
    * shingled frame (union both sides' shingles first when the pairs span
    * frames) — the public face of the candidate-driven inverted-index
    * verification, reused by the streaming ingest dedup. */
  def jaccardForCandidates(shingled: DataFrame, candidates: DataFrame): DataFrame =
    exactJaccard(shingled, Some(candidates))

  /** Sample bound for the exact all-pairs baseline: O(n²) array
    * intersections are a verifier, not a production path — on the full
    * sf0.1 corpus the unbounded version measured 818 s vs < 30 s for the
    * LSH path finding the same pairs. */
  val ExactBaselineMaxDocId = 500L

  /** EXACT all-pairs n-gram Jaccard >= 0.6 over a bounded sample
    * (doc_id < [[ExactBaselineMaxDocId]]) — the quadratic ground truth the
    * LSH path is validated against. Deliberately NOT a 100 TB plan; the
    * sample bound is how one verifies LSH recall in production too. */
  def jaccardPairs(spark: SparkSession, sfDir: String): DataFrame = {
    // docs with < 3 tokens have no shingles: they cannot near-dup anything,
    // and an empty-vs-empty pair would be a 0/0 division
    val s = withShingles(spark, sfDir)
      .filter(size(col("sh")) > 0 && col("doc_id") < ExactBaselineMaxDocId)
    exactJaccard(s, candidates = None)
      .filter(col("jaccard") >= 0.6)
      .orderBy("doc_a", "doc_b")
  }

  /** Candidate-pipeline recall/precision telemetry for the near-dup
    * family — the text/embedding twin of
    * [[SimilarityOps.annRecallReport]]: each approximate pair pipeline
    * counted against its exact reference relation, as a REGISTERED row
    * (found, exact, hits, precision_bp, recall_bp per family), so the
    * recall certificates the sf1 sweeps measure by hand become a
    * dashboard number an operator watches per corpus.
    *
    * Three legs, two kinds of claim:
    *  - `minhash_near_dup` vs the full-corpus exact Jaccard relation and
    *    `emb_lsh_near_dup_hi` vs the exact cosine-0.8 relation are
    *    CERTIFICATES: both pipelines verify candidates exactly, so
    *    precision is 10000 by construction and recall 10000 is the
    *    banded-candidate completeness claim their own oracles assert —
    *    here it is measured and reported rather than assumed.
    *  - `semdedup_clustered` pairs vs the same exact 0.8 relation is
    *    true APPROXIMATION telemetry: cluster-scoped pairing misses
    *    cross-cluster pairs by design (the refinement law pins pairs ⊆
    *    exact, so precision stays 10000 while recall is the number to
    *    watch as L grows with the corpus).
    *
    * Telemetry by construction (the annRecallReport convention): the
    * exact references are the registered quadratic-class baselines, so
    * this row costs what they cost — in production the same report runs
    * over a BOUNDED audit sample (the [[jaccardPairs]] note), not the
    * full corpus. The counting plan is scale-clean: one union of pair
    * streams, one (a, b)-keyed aggregate, one global fold — no joins,
    * no windows. */
  def dedupRecallReport(spark: SparkSession, sfDir: String): DataFrame = {
    def leg(name: String, found: DataFrame, exact: DataFrame): DataFrame =
      found.toDF("a", "b")
        .select(col("a"), col("b"), lit(1L).as("in_f"), lit(0L).as("in_x"))
        .unionAll(exact.toDF("a", "b")
          .select(col("a"), col("b"), lit(0L).as("in_f"), lit(1L).as("in_x")))
        .groupBy("a", "b")
        .agg(max("in_f").as("f"), max("in_x").as("x"))
        .agg(coalesce(sum("f"), lit(0L)).as("found"),
          coalesce(sum("x"), lit(0L)).as("exact"),
          coalesce(sum(col("f") * col("x")), lit(0L)).as("hits"))
        .select(lit(name).as("family"),
          col("found").cast("long").as("found"),
          col("exact").cast("long").as("exact"),
          col("hits").cast("long").as("hits"),
          expr("CASE WHEN found = 0 THEN 10000 " +
            "ELSE (10000 * hits) div found END").cast("long").as("precision_bp"),
          expr("CASE WHEN exact = 0 THEN 10000 " +
            "ELSE (10000 * hits) div exact END").cast("long").as("recall_bp"))
    // full-corpus exact Jaccard relation (the minhash oracle's claim,
    // computed engine-side): the inverted-index join — NOT banded, so a
    // pair at 0.6 necessarily shares shingles and cannot hide
    val jacFull = exactJaccard(
        withShingles(spark, sfDir).filter(size(col("sh")) > 0),
        candidates = None)
      .filter(col("jaccard") >= 0.6)
      .select(col("doc_a"), col("doc_b"))
    val exactEmb08 = SimilarityOps.embNearDup(spark, sfDir, threshold = 0.8)
      .select(col("vec_a"), col("vec_b"))
    leg("minhash_near_dup",
        minhashNearDup(spark, sfDir).select(col("doc_a"), col("doc_b")),
        jacFull)
      .unionAll(leg("emb_lsh_near_dup_hi",
        SimilarityOps.embLshNearDupHi(spark, sfDir)
          .select(col("vec_a"), col("vec_b")),
        exactEmb08))
      .unionAll(leg("semdedup_clustered",
        SimilarityOps.semDedupClusteredPairs(spark, sfDir)
          .select(col("doc_a"), col("doc_b")),
        exactEmb08))
      // the harness corpora have ZERO exact pairs at 0.8 (measured at
      // sf0.01/sf0.1/sf1 — the orthogonal-transform copies preserve no
      // cross-copy cosine above threshold), so the 0.8 legs are
      // certificates over an empty relation there; this leg runs the
      // clustered pairing at the 0.47 noise threshold where harness
      // pairs EXIST, so the report carries a live recall number per
      // corpus, not only on planted fixtures
      .unionAll(leg("semdedup_clustered_047",
        SimilarityOps.semDedupClusteredPairs(spark, sfDir, threshold = 0.47)
          .select(col("doc_a"), col("doc_b")),
        SimilarityOps.embNearDup(spark, sfDir, threshold = 0.47)
          .select(col("vec_a"), col("vec_b"))))
      // incremental-semdedup probe completeness: the probed cross-stage
      // relation vs the exact batch×base relation, BEFORE drop policy —
      // at the production 0.8 point (a certificate over the harness's
      // empty relation, the emb_lsh_near_dup_hi convention) and at the
      // 0.47 point where the number is live (probed candidates MISS
      // cross-list pairs by design — this is the decay-with-L metric an
      // operator watches, the semdedup_clustered_047 twin)
      .unionAll(leg("incr_semdedup_ann",
        SimilarityOps.incrSemAnnCrossPairs(spark, sfDir,
          SimilarityOps.IncrSemProdThetaMilli)
          .select(col("vec_a"), col("vec_b")),
        SimilarityOps.incrSemExactCrossPairs(spark, sfDir,
          SimilarityOps.IncrSemProdThetaMilli)
          .select(col("vec_a"), col("vec_b"))))
      .unionAll(leg("incr_semdedup_ann_047",
        SimilarityOps.incrSemAnnCrossPairs(spark, sfDir,
          SimilarityOps.IncrSemLiveThetaMilli)
          .select(col("vec_a"), col("vec_b")),
        SimilarityOps.incrSemExactCrossPairs(spark, sfDir,
          SimilarityOps.IncrSemLiveThetaMilli)
          .select(col("vec_a"), col("vec_b"))))
      // the BANDED face's twin legs — the probed-vs-banded comparison
      // at both thresholds is the operating decision this report now
      // answers per corpus: centroid probes lose near-threshold pairs
      // (724 bp at 0.47/sf1) while LSH collisions hold most of them
      // with no list structure, at the cost of collision-physics
      // candidate volume
      .unionAll(leg("incr_semdedup_banded",
        SimilarityOps.incrSemBandedCrossPairs(spark, sfDir,
          SimilarityOps.IncrSemProdThetaMilli)
          .select(col("vec_a"), col("vec_b")),
        SimilarityOps.incrSemExactCrossPairs(spark, sfDir,
          SimilarityOps.IncrSemProdThetaMilli)
          .select(col("vec_a"), col("vec_b"))))
      .unionAll(leg("incr_semdedup_banded_047",
        SimilarityOps.incrSemBandedCrossPairs(spark, sfDir,
          SimilarityOps.IncrSemLiveThetaMilli)
          .select(col("vec_a"), col("vec_b")),
        SimilarityOps.incrSemExactCrossPairs(spark, sfDir,
          SimilarityOps.IncrSemLiveThetaMilli)
          .select(col("vec_a"), col("vec_b"))))
      .orderBy("family")
  }

  private val NumPerms = graft.functions.MinHashSignature.NumPerms // 128
  /** Rows per doc in [[bandFrame]] — broadcast gates sized in DOCS must
    * multiply by this before comparing a band frame against a row cap. */
  private[graft] val Bands = 32
  private val RowsPerBand = NumPerms / Bands // 4

  /** 128-perm MinHash signature as an array<long> column (input: distinct
    * shingle array). Shingles are hashed with the built-in xxhash64, then
    * all 128 affine-permutation minima are computed in one codegen'd pass
    * ([[graft.functions.MinHashSignature]] — the equivalent
    * array_min(transform(...)) x128 formulation is interpreted and
    * measured ~30 s at sf0.1 vs sub-second for the native loop). */
  private def minhashSig(sh: Column): Column =
    graft.functions.SketchFunctions.minhashSignature(
      transform(sh, s => xxhash64(s)))

  /** MinHash + LSH near-duplicate detection with exact verification —
    * result set identical to `jaccardPairs` whenever banding recall holds
    * (with 32 bands of 4 rows, recall at j=0.6 is ~0.99 and at the
    * planted-duplicate level j>=0.9 is ~1.0).
    *
    * Plan shape: scan → signature (no shuffle) → explode 32 band keys →
    * hash join on (band, key) → distinct candidate pairs → join back to
    * shingles → exact Jaccard filter. At 100 TB the only shuffles are the
    * band-key join and the candidate join — both equi-joins. */
  /** (doc_id, band, band_key) LSH banding of a shingled frame — 32 bands
    * of 4 MinHash rows each, hashed to one key per band. */
  def bandFrame(shingled: DataFrame): DataFrame =
    shingled.filter(size(col("sh")) > 0)
      .select(col("doc_id"), minhashSig(col("sh")).as("sig"))
      .select(col("doc_id"),
        posexplode(transform(sequence(lit(0), lit(Bands - 1)), b =>
          hash(slice(col("sig"), b * RowsPerBand + 1, lit(RowsPerBand)), b))))
      .select(col("doc_id"), col("pos").as("band"), col("col").as("band_key"))

  /** Hot-key guard for every banded LSH self-join (MinHash, SimHash,
    * hyperplane): append a `shard` column so the self-join key becomes
    * (bandCols..., shard) and a degenerate band key shared by m rows
    * (boilerplate docs, near-empty docs after shingle filtering, a
    * template that collapses thousands of documents to one signature)
    * produces O(m·maxDf) candidate pairs instead of m² — the same df-cap
    * contract [[TextOps.winnowPairs]] uses on its inverted index, applied
    * as sub-salting instead of dropping so hot buckets keep local recall.
    *
    * Mechanics: keys with df <= maxDf get shard 0 (results bit-identical
    * to the uncapped join — defaults are chosen above the harness data's
    * max df, so every oracle row is unchanged); hotter keys split into
    * ceil(df/maxDf) shards by a hash of the row id alone — deliberately
    * NOT band-dependent: a fully degenerate group (every band key shared
    * by all m members) then produces the SAME within-shard pair set in
    * every band, so total candidates are bounded by ~m·maxDf/2 instead of
    * re-growing toward m² through the union of 32 independent shardings.
    * The sacrificed cross-shard pairs are the honest cost of bounding
    * quadratic output; exact duplicates (the common cause of degenerate
    * buckets) are [[exactDedup]]'s job UPSTREAM of any LSH pass, and a
    * pair whose other band keys are cold still meets there unsharded.
    *
    * Scale shape: df counts come from a partial+final hash aggregate
    * (map-side combine — no single-reducer straggler on the hot key
    * itself), only keys ABOVE the cap survive the filter (at most
    * n·bands/maxDf of them, by counting), and they join back BROADCAST —
    * the banded frame never shuffles for the guard. AQE's skew split can
    * divide a hot shuffle partition; it cannot shrink quadratic join
    * OUTPUT — this cap is what does.
    *
    * The shard hash is the md5-derived POSITIVE 60-bit integer of the
    * id's decimal string (first 15 hex chars of md5, the engine's
    * standard cross-engine hash trick) rather than xxhash64: DuckDB has
    * no xxhash64, and the r8 sf1 sweep hit the first corpus where a
    * guard binds on an ORACLE-CHECKED row (simhash over the sf1 tree —
    * token-permuted copies are signature-identical twins because simhash
    * is order-invariant, so band keys carry 10× twin mass). With a
    * replayable hash the oracle reproduces the exact sharding and the
    * row stays hash-green THROUGH the guard regime instead of being
    * documented around it. */
  private[graft] def subSaltHotKeys(
      banded: DataFrame, idCol: String, maxDf: Int,
      bandCols: Seq[String] = Seq("band", "band_key")): DataFrame = {
    require(maxDf > 0, s"maxDf must be positive, got $maxDf")
    val hot = banded.groupBy(bandCols.map(col): _*)
      .agg(count(lit(1)).as("df"))
      .filter(col("df") > maxDf)
    banded.join(broadcast(hot), bandCols, "left")
      .withColumn("shard",
        when(col("df").isNull, lit(0L))
          .otherwise(
            expr(s"cast(conv(substring(md5(cast($idCol as string)), 1, 15), 16, 10) as bigint)")
              % expr(s"(df + ${maxDf - 1}) div $maxDf")))
      .drop("df")
  }

  /** Band-key df cap for the MinHash self-join. Harness max df per
    * (band, band_key) measured 18 at sf0.1 (32-bit keys, no degenerate
    * signatures in the generated corpus), so 1024 never engages there —
    * it exists for the adversarial regime (ExtOpsSpec plants identical
    * docs and proves the candidate count collapses ~m/cap-fold). A
    * production corpus tunes it to its boilerplate profile. */
  val MinHashBandDfCap = 1024

  /** Band-key df cap for the SimHash self-join — higher than MinHash's
    * because SimHash band keys are structurally DENSE: 7-8 bits each, and
    * real token distributions skew the vote bits, so legitimate buckets
    * are large (measured max df 1405 over 5000 docs at sf0.1; the cap
    * sits above that, so the pigeonhole guarantee is exact on the
    * harness rows at ≤ sf0.1). A corpus whose buckets outgrow it trades
    * the tail of cross-shard pairs for bounded join output, and
    * transitive clustering recovers members — and since r8 the guard's
    * sharding is REPLAYED by the oracle (md5-based shard hash), so the
    * row stays hash-checked even where the cap binds: the sf1 tree's
    * twin-heavy signatures (order-invariant simhash over token-permuted
    * copies) are the first measured instance. */
  val SimhashBandDfCap = 4096

  /** MinHash band frame cached per (session, sfDir): with the hot-key
    * guard the banded frame feeds THREE consumers (both self-join sides +
    * the df aggregate) — uncached, the 128-perm signature pass runs three
    * times per query (measured +1.1 s at sf0.1 when the guard landed).
    * One row per (doc, band) of three longs; evicts on session end. */
  private val bandCache = new graft.SessionFrameCache[String]

  def minhashNearDup(spark: SparkSession, sfDir: String,
      maxBandDf: Int = MinHashBandDfCap): DataFrame =
    minhashNearDupCore(spark, sfDir, scope = None, maxBandDf)

  /** [[minhashNearDup]] restricted to a survivor id set (`scope`: a
    * one-column doc_id frame) — the staged-curation path, where dedup
    * runs over quality SURVIVORS. Shingles and bands SEMI-JOIN the
    * session-cached corpus frames down to the scope, so the 128-perm
    * signature pass is built once per session and shared with the
    * full-corpus row; the scoped run pays only survivor-sized joins.
    * The hot-key guard resharding and the verify join both see the
    * scoped frames, so the result is exactly the corpus pair graph
    * INDUCED on the scope (both endpoints surviving). */
  def minhashNearDupScoped(spark: SparkSession, sfDir: String,
      scope: DataFrame, maxBandDf: Int = MinHashBandDfCap): DataFrame =
    minhashNearDupCore(spark, sfDir, Some(scope.select(col("doc_id"))),
      maxBandDf)

  /** The full-corpus 32×4 band frame, cached per (session, sfDir) — the
    * persistent LSH INDEX every MinHash-family consumer shares (self-join
    * dedup, decontam, and the incremental-ingest path, which treats the
    * base slice of this frame as the accepted-set index a production
    * ingest loop maintains on disk). */
  private def corpusBands(spark: SparkSession, sfDir: String): DataFrame =
    bandCache.getOrElseUpdate(spark, sfDir)(
      bandFrame(withShingles(spark, sfDir).filter(size(col("sh")) > 0)))

  private def minhashNearDupCore(spark: SparkSession, sfDir: String,
      scope: Option[DataFrame], maxBandDf: Int): DataFrame = {
    def scoped(df: DataFrame): DataFrame =
      scope.fold(df)(ids => df.join(ids, Seq("doc_id"), "left_semi"))
    val s = scoped(withShingles(spark, sfDir).filter(size(col("sh")) > 0))
    val bands = subSaltHotKeys(
      scoped(corpusBands(spark, sfDir)),
      "doc_id", maxBandDf)
    val cand = bands.as("x").join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.band_key") === col("y.band_key") &&
          col("x.shard") === col("y.shard") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()
    exactJaccard(s, candidates = Some(cand))
      .filter(col("jaccard") >= 0.6)
      .orderBy("doc_a", "doc_b")
  }

  /** Fuzzy benchmark decontamination — the NEAR-duplicate analog of
    * [[TextOps.decontamNgram]]: exact n-gram overlap catches verbatim
    * contamination, but a lightly paraphrased eval example (one sentence
    * reworded, whitespace shuffled) sails through it and still leaks the
    * answer into training. Here contamination is a MinHash near-dup
    * relation between a corpus document and a benchmark document (the
    * same doc_id % 100 == 0 eval-slice convention as decontam_ngram):
    * both sides reuse the corpus-wide shingle + 32×4 band frames
    * (session-cached, shared with [[minhashNearDup]]), candidates come
    * from an equi-join on (band, band_key), and every candidate is
    * verified by exact Jaccard — so the output is exactly the ≥ 0.6 pair
    * set whenever banding recall holds, same contract as the self-join
    * path. One row per (contaminated corpus doc, bench doc) pair; policy
    * (drop / flag) thresholds downstream.
    *
    * The harness slice is doc_id % [[DecontamBenchMod]] == 0, NOT
    * decontam_ngram's % 100: near-dup-level contamination is far rarer
    * than a shared verbatim 4-gram, and at the driver's sf0.01 gate the
    * % 100 slice crosses zero near-dup pairs — a vacuously-green oracle
    * row. Widening the slice to ~3.4% keeps the row exercised at every
    * checked scale (5 pairs at sf0.01, 20 at sf0.1 — measured via the
    * exact cross-slice join).
    *
    * Scale shape: eval benchmarks are broadcast-sized BY DEFINITION (the
    * same asymmetry decontam_ngram exploits), so the band join is a
    * broadcast hash join — the corpus band frame never shuffles, and no
    * hot-key shard guard is needed: a degenerate corpus band key meeting
    * the bench side yields at most (bench rows on that key) candidates
    * per corpus row — bounded by the broadcast side, not by corpus df,
    * so quadratic blowup is structurally impossible. The verify join is
    * candidate-driven (only candidate pairs expand shingles), identical
    * to the batch dedup path. */
  val DecontamBenchMod = 29

  def decontamNearDup(spark: SparkSession, sfDir: String): DataFrame = {
    val s = withShingles(spark, sfDir).filter(size(col("sh")) > 0)
    val bands = corpusBands(spark, sfDir)
    val cand = bands.filter(col("doc_id") % DecontamBenchMod =!= 0).as("x")
      .join(broadcast(bands.filter(col("doc_id") % DecontamBenchMod === 0).as("y")),
        col("x.band") === col("y.band") && col("x.band_key") === col("y.band_key"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()
    exactJaccard(s, candidates = Some(cand))
      .filter(col("jaccard") >= 0.6)
      .select(col("doc_a").as("doc_id"), col("doc_b").as("bench_doc_id"),
        col("jaccard"))
      .orderBy("doc_id", "bench_doc_id")
  }

  /** Increment slice for the registered harness row: doc_id %
    * [[IncrIngestMod]] == [[IncrIngestMod]]−1 (25% of the corpus) is the
    * "new batch"; the rest is the already-accepted base. Chosen so BOTH
    * drop reasons are exercised at the driver's sf0.01 gate (7 base-dups
    * and 2 in-batch losers — measured against the exact pair set; a
    * thinner slice crosses zero in-batch pairs and the reason would be
    * vacuously green, the decontam %-100 lesson). */
  val IncrIngestMod = 4

  /** INCREMENTAL-ingest near-dup dedup — the batch face of the daily
    * delta an LLM pipeline actually runs at 100 TB: the accepted corpus
    * (`base`) is never re-deduped against itself; only the new batch
    * (`incr`) pays work. Verdict per increment doc, mirroring
    * [[graft.streaming.StreamingOps.runMinhashDedupStream]]'s policy
    * EXACTLY (the batch/stream equivalence is spec-asserted):
    *
    *  - `dropped_base`: verified near-dup (Jaccard >= `threshold`) of ANY
    *    base doc; `dup_of` = the smallest such base id;
    *  - `dropped_batch`: among the docs that survive the base check,
    *    near-dup clusters (transitive closure of verified pairs) keep
    *    their min doc_id; losers carry `dup_of` = the cluster keeper;
    *  - `kept` otherwise (including docs with < 3 tokens — no shingles,
    *    so they cannot near-dup anything, same as the stream).
    *
    * Plan shape — the incremental contract: the base side contributes its
    * band frame (a persistent index: the ingest loop appends each kept
    * batch's bands, exactly what the streaming processor's band STATE is)
    * to ONE equi-join against the batch bands and its shingles only to
    * the candidate-driven verify join. No base×base pair is ever formed,
    * so per-batch cost is O(batch + matched candidates) regardless of
    * corpus size — re-running [[minhashNearDup]] over base ∪ batch would
    * pay the full corpus self-join every day.
    *
    * The within-batch self-join carries the [[subSaltHotKeys]] df-cap
    * guard like every banded self-join. The cross join is deliberately
    * unguarded: its per-key output is df_base(key) × df_incr(key) where
    * the increment side is batch-sized by construction, and a DEGENERATE
    * base band key (the m-identical-docs regime the self-join guard
    * exists for) cannot arise in an accepted set that was itself deduped
    * at the same threshold on the way in — exact copies collapse to one
    * keeper before their bands ever reach the index. A corpus whose
    * sub-threshold boilerplate still concentrates band keys would shard
    * the INDEX side with the same md5 trick and replicate batch rows
    * across shards (complete, output-identical salting). */
  def incrIngestDedup(base: DataFrame, incr: DataFrame,
      threshold: Double = 0.6,
      maxBandDf: Int = MinHashBandDfCap): DataFrame = {
    val sBase = shingleFrame(base).filter(size(col("sh")) > 0)
    val sIncr = shingleFrame(incr).filter(size(col("sh")) > 0)
    incrIngestCore(incr.select(col("doc_id")), sBase, bandFrame(sBase),
      sIncr, bandFrame(sIncr), threshold, maxBandDf)
  }

  /** The registered harness instantiation of [[incrIngestDedup]]: the
    * corpus split by doc_id % [[IncrIngestMod]]. Both sides are FILTERS
    * of the session-cached corpus shingle and band frames — the 128-perm
    * signature pass is shared with the whole MinHash family, and the base
    * slice of [[corpusBands]] plays the persistent accepted-set index. */
  def incrIngestDedupCorpus(spark: SparkSession, sfDir: String): DataFrame = {
    val isIncr = (col("doc_id") % IncrIngestMod) === (IncrIngestMod - 1)
    val s = withShingles(spark, sfDir).filter(size(col("sh")) > 0)
    val bands = corpusBands(spark, sfDir)
    incrIngestCore(
      Tables.documents(spark, sfDir).filter(isIncr).select(col("doc_id")),
      s.filter(!isIncr), bands.filter(!isIncr),
      s.filter(isIncr), bands.filter(isIncr),
      threshold = 0.6, maxBandDf = MinHashBandDfCap)
  }

  /** On-disk location of the persisted incremental-ingest BASE index —
    * the accepted set's shingle frame and MinHash band index as two
    * parquet tables under one artifact directory ([[graft.Artifacts]]
    * conventions: temp-root stand-in for a lakehouse table, provenance
    * sidecar keyed on the documents table's fingerprint). */
  def incrBaseArtifactPath(sfDir: String): String =
    graft.Artifacts.artifactDir(sfDir) + "/incr_base_index"

  /** TRAIN-AND-PERSIST half of the incremental-ingest artifact
    * contract: the accepted base's shingle frame (`doc_id, sh`) and
    * band index (`doc_id, band, band_key`) written to parquet — the
    * table a production daily loop maintains on disk and appends each
    * day's kept docs to. Content is the session-cached corpus frames'
    * base slice VERBATIM (the same frames the in-session row reads), so
    * the served verdict cannot fork from [[incrIngestDedupCorpus]];
    * the [[graft.Artifacts]] sidecar stamps the corpus fingerprint so a
    * serve session refuses a stale index. */
  def writeIncrBaseArtifact(spark: SparkSession, sfDir: String): String = {
    val path = incrBaseArtifactPath(sfDir)
    val isIncr = (col("doc_id") % IncrIngestMod) === (IncrIngestMod - 1)
    withShingles(spark, sfDir).filter(size(col("sh")) > 0).filter(!isIncr)
      .write.mode("overwrite").parquet(path + "/shingles")
    corpusBands(spark, sfDir).filter(!isIncr)
      .write.mode("overwrite").parquet(path + "/bands")
    graft.Artifacts.writeSidecar(path,
      graft.Artifacts.fingerprint(Tables.documents(spark, sfDir), "doc_id"))
    path
  }

  /** SERVE half of the incremental-ingest artifact contract — the
    * production daily loop's actual shape: verdict today's batch
    * against the READ-BACK base index, with no session-cache
    * dependence and no corpus-wide shingle pass. The base side comes
    * entirely from the persisted parquet tables
    * ([[writeIncrBaseArtifact]]; freshness-checked against the current
    * corpus fingerprint); the batch side shingles and bands are
    * computed from the batch slice alone (the filter reaches the
    * parquet scan — a serve session pays O(batch), not O(corpus)).
    * Policy is [[incrIngestCore]] VERBATIM, so the served verdict
    * shares the in-session row's oracle text — the no-fork rule.
    * Spec-proven cross-session: a SECOND SparkSession with empty
    * session caches reproduces [[incrIngestDedupCorpus]] bit-for-bit
    * from the artifact alone. */
  def incrIngestDedupFromArtifact(spark: SparkSession,
      sfDir: String): DataFrame = {
    val path = incrBaseArtifactPath(sfDir)
    graft.Artifacts.requireFresh(path,
      graft.Artifacts.fingerprint(Tables.documents(spark, sfDir), "doc_id"),
      "incremental-ingest base index")
    val isIncr = (col("doc_id") % IncrIngestMod) === (IncrIngestMod - 1)
    val batch = Tables.documents(spark, sfDir).filter(isIncr)
    val sIncr = shingleFrame(batch).filter(size(col("sh")) > 0)
    incrIngestCore(
      batch.select(col("doc_id")),
      spark.read.parquet(path + "/shingles"),
      spark.read.parquet(path + "/bands"),
      sIncr, bandFrame(sIncr),
      threshold = 0.6, maxBandDf = MinHashBandDfCap)
  }

  /** Once-per-session guard for the base-index write (the bench's
    * warm-up + repeated timed passes must pay the write once — the
    * [[graft.ext.SimilarityOps.annIvfArtifactTopk]] convention). */
  private val incrBaseWritten = new graft.SessionValueCache[String, String]

  /** The registered SERVED incremental-ingest row — r15's two best
    * deliveries composed into the real daily production loop: the
    * accepted base's shingle + band index PERSISTED as a cross-session
    * parquet artifact ([[writeIncrBaseArtifact]], once per session),
    * then the batch verdicted against the READ-BACK index
    * ([[incrIngestDedupFromArtifact]]). Output and oracle text are
    * [[incrIngestDedupCorpus]]'s exactly (same policy core, same
    * %-split) — what this row adds is the demonstrated artifact
    * boundary: the plan under the verdict scans the artifact files for
    * the base side and only the batch slice of the corpus. At 100 TB:
    * the corpus-wide signature pass happens once at index build;
    * every daily batch thereafter pays O(batch + matched candidates)
    * against the on-disk index, and each day's kept docs append to it
    * (the accept-then-grow recurrence the _multi row exercises
    * in-session). */
  def incrIngestDedupServed(spark: SparkSession, sfDir: String): DataFrame = {
    incrBaseWritten.getOrElseUpdate(spark, sfDir) {
      writeIncrBaseArtifact(spark, sfDir)
    }
    incrIngestDedupFromArtifact(spark, sfDir)
  }

  /** Number of deterministic arrival waves of the MULTI-batch
    * incremental row: the single-step batch slice (doc_id %
    * [[IncrIngestMod]] == [[IncrIngestMod]]−1) divided into K waves by
    * doc_id % ([[IncrIngestMod]]·K) — wave k (1-based) is residue
    * [[IncrIngestMod]]·k − 1 (3, 7, 11 at the defaults), so the waves
    * partition exactly the single-step batch and the two rows diff
    * directly. */
  val IncrMultiK = 3

  /** MULTI-BATCH incremental ingest — the accept-then-grow loop the
    * single-step row ([[incrIngestDedupCorpus]]) deliberately does not
    * exercise: batch k is verdicted against the base AS GROWN by batches
    * 1..k−1's survivors, i.e. the production daily loop where each
    * day's kept docs join the accepted index before the next day
    * arrives. Policy per wave is [[incrIngestCore]] VERBATIM (the
    * single-step machinery — the two rows cannot fork on verdict
    * semantics); what's new is only the base recurrence
    * base_k = base_{k−1} ∪ kept_k.
    *
    * Non-vacuous at the driver gate (measured sf0.01): every wave has
    * live drops, and wave 3 drops two docs whose dup_of is an EARLIER
    * WAVE's survivor (docs 107→387, 383→31) — pairs the single-step row
    * classifies as in-batch become grown-base hits here, which is
    * exactly the semantics under test (spec-asserted in ExtOpsSpec).
    *
    * Plan/scale shape: per wave, the batch bands equi-join the grown
    * base's band index (a left-semi filter of the session-cached corpus
    * band frame — the index-append convention) and only candidates pay
    * the verify join, so per-batch cost stays O(batch + matched
    * candidates) as the base grows; nothing ever re-pairs base×base.
    * The K verdicts localCheckpoint per wave — bounded (K=3), exactly
    * the per-batch materialization a production loop does when it
    * writes each day's verdict table — and the unioned verdict frame is
    * itself session-cached (the per-increment ARTIFACT convention of
    * the semantic siblings: a production loop writes each day's verdict
    * table ONCE; re-deriving all K waves per consumer call would pay
    * 3× the single-step row on every invocation — measured 21.6 s/pass
    * at sf0.1 uncached). */
  private val incrMultiCache = new graft.SessionFrameCache[String]

  def incrIngestDedupMulti(spark: SparkSession, sfDir: String): DataFrame = {
    val verdicts = incrMultiCache.getOrElseUpdateRaw(spark, sfDir) {
      val mod = IncrIngestMod * IncrMultiK
      def isWave(k: Int): Column =
        (col("doc_id") % mod) === (IncrIngestMod * k - 1)
      val isAnyWave = (col("doc_id") % IncrIngestMod) === (IncrIngestMod - 1)
      val s = withShingles(spark, sfDir).filter(size(col("sh")) > 0)
      val bands = corpusBands(spark, sfDir)
      val docs = Tables.documents(spark, sfDir).select(col("doc_id"))
      val base0 = docs.filter(!isAnyWave)
      val (_, waves) = (1 to IncrMultiK)
        .foldLeft((base0, List.empty[DataFrame])) { case ((base, acc), k) =>
          val v = incrIngestCore(
            docs.filter(isWave(k)),
            s.join(base, Seq("doc_id"), "left_semi"),
            bands.join(base, Seq("doc_id"), "left_semi"),
            s.filter(isWave(k)), bands.filter(isWave(k)),
            threshold = 0.6, maxBandDf = MinHashBandDfCap)
            .withColumn("batch_k", lit(k.toLong))
            .localCheckpoint()
          val grown = base.unionByName(
            v.filter(col("status") === "kept").select(col("doc_id")))
          (grown, acc :+ v)
        }
      waves.reduce(_.unionByName(_)).localCheckpoint()
    }
    verdicts
      .select(col("doc_id"), col("batch_k"), col("status"), col("dup_of"))
      .orderBy("doc_id")
  }

  /** The two lazily-planned pair stages of the incremental path —
    * (base-dup verdicts, within-batch survivor pairs) — split out so
    * PlanAuditSpec can pin their plan shapes (the final verdict frame
    * sits behind [[connectedComponents]]' localCheckpoint wall, which
    * truncates lineage and hides the joins from the output plan). */
  private[graft] def incrIngestPairStages(
      sBase: DataFrame, bBase: DataFrame,
      sIncr: DataFrame, bIncr: DataFrame,
      threshold: Double, maxBandDf: Int): (DataFrame, DataFrame) = {
    // cross-batch candidates: batch bands ⋈ accepted-index bands — an
    // equi-join on (band, band_key); the base frame appears on ONE side
    // only, never against itself
    val cand = bIncr.as("x").join(bBase.as("y"),
        col("x.band") === col("y.band") &&
          col("x.band_key") === col("y.band_key"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()
    // verify candidates only; shingle lookup spans both sides (doc_a is
    // batch, doc_b is base) so the union feeds the inverted-index join
    val baseDup = exactJaccard(sIncr.unionByName(sBase), Some(cand))
      .filter(col("jaccard") >= threshold)
      .groupBy(col("doc_a").as("doc_id"))
      .agg(min(col("doc_b")).as("base_dup_of"))
    // within-batch pairs among the base-check SURVIVORS (the stream
    // clusters after the cross-batch drop — order matters: a doc dropped
    // against base must not also claim batch losers)
    val bSurv = subSaltHotKeys(
      bIncr.join(baseDup, Seq("doc_id"), "left_anti"), "doc_id", maxBandDf)
    val icand = bSurv.as("x").join(bSurv.as("y"),
        col("x.band") === col("y.band") &&
          col("x.band_key") === col("y.band_key") &&
          col("x.shard") === col("y.shard") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()
    val ipairs = exactJaccard(sIncr, Some(icand))
      .filter(col("jaccard") >= threshold)
    (baseDup, ipairs)
  }

  /** [[incrIngestPairStages]] over the registered corpus %-split — the
    * PlanAuditSpec entry point. */
  private[graft] def incrIngestCorpusStages(
      spark: SparkSession, sfDir: String): (DataFrame, DataFrame) = {
    val isIncr = (col("doc_id") % IncrIngestMod) === (IncrIngestMod - 1)
    val s = withShingles(spark, sfDir).filter(size(col("sh")) > 0)
    val bands = corpusBands(spark, sfDir)
    incrIngestPairStages(s.filter(!isIncr), bands.filter(!isIncr),
      s.filter(isIncr), bands.filter(isIncr), 0.6, MinHashBandDfCap)
  }

  private def incrIngestCore(incrIds: DataFrame,
      sBase: DataFrame, bBase: DataFrame,
      sIncr: DataFrame, bIncr: DataFrame,
      threshold: Double, maxBandDf: Int): DataFrame = {
    val (baseDup, ipairs) = incrIngestPairStages(
      sBase, bBase, sIncr, bIncr, threshold, maxBandDf)
    // transitive closure; keeper = component min, losers point at it
    val batchDup = connectedComponents(
        ipairs.select(col("doc_a"), col("doc_b")))
      .filter(col("label") =!= col("doc_id"))
      .select(col("doc_id"), col("label").as("batch_dup_of"))
    incrIds
      .join(baseDup, Seq("doc_id"), "left")
      .join(batchDup, Seq("doc_id"), "left")
      .select(col("doc_id"),
        when(col("base_dup_of").isNotNull, lit("dropped_base"))
          .when(col("batch_dup_of").isNotNull, lit("dropped_batch"))
          .otherwise(lit("kept")).as("status"),
        coalesce(col("base_dup_of"), col("batch_dup_of")).as("dup_of"))
      .orderBy("doc_id")
  }

  /** Per-token 64-bit hash = the first 8 bytes of md5, big-endian (the
    * two 32-bit hex halves reassembled with shift-or — a single conv of
    * 16 hex chars would pass through a >2^63 unsigned decimal string that
    * cannot round-trip a signed long cast). md5 instead of xxhash64 so the
    * full SimHash family is CROSS-ENGINE REPRODUCIBLE: DuckDB has md5 but
    * not xxhash64, which is what turns doc_simhash/simhash_near_dup from
    * rows-only into hash-checked oracle rows. Distributionally equivalent
    * (both uniform 64-bit), so banding recall is unchanged. */
  private def md5hash64(t: Column): Column =
    shiftleft(conv(substring(md5(t), 1, 8), 16, 10).cast("long"), 32)
      .bitwiseOR(conv(substring(md5(t), 9, 8), 16, 10).cast("long"))

  /** 64-bit SimHash per document, computed in one shuffle-free projection:
    * md5-derived token hashes ([[md5hash64]]), then the 64-bit vote fold in
    * a single codegen'd loop ([[graft.functions.SimHash64]] — bit j set iff
    * the ±1 vote sum of token-hash bit j is >= 0). Output is the signature
    * itself — pairing is done by `simhashNearDup`. */
  /** Signature frame cached per (session, sfDir): md5-per-token is ~2.5x
    * the xxhash64 it replaced, and [[simhashNearDup]]'s band self-join
    * references the frame on BOTH sides — without the persist the md5 pass
    * runs twice per query (and once more for doc_simhash). One row per doc
    * (doc_id, long); evicts on session end. */
  private val simhashCache = new graft.SessionFrameCache[String]

  def simhash(spark: SparkSession, sfDir: String): DataFrame =
    simhashCache.getOrElseUpdate(spark, sfDir) {
      Tables.documents(spark, sfDir)
        .select(col("doc_id"), tokens(col("text")).as("toks"))
        .select(col("doc_id"),
          graft.functions.SketchFunctions.simhash64(
            transform(col("toks"), t => md5hash64(t))).as("simhash"))
    }.orderBy("doc_id")

  private val SimhashBands = 9 // > maxHamming: pigeonhole guarantees a clean band

  /** SimHash near-dup pairs: XOR popcount <= maxHamming over signatures.
    *
    * Pairing is banded, not all-pairs: the 64 bits are cut into 9 bands,
    * so any pair within hamming distance 8 shares at least one identical
    * band (pigeonhole) — candidates come from an equi-join on
    * (band index, band bits) and only candidates pay the popcount. Same
    * blocking idea as MinHash banding, exact instead of probabilistic. */
  /** SimHash band frame cached per (session, sfDir) — same three-consumer
    * shape as the MinHash band cache once the hot-key guard landed. */
  private val simBandCache = new graft.SessionFrameCache[String]

  /** Band split of a 64-bit signature frame (doc_id, `sigName`): nBands
    * bands over the LOW `cover` bits — band i covers bits
    * [i·cover/nBands, (i+1)·cover/nBands). Shared by [[simhashNearDup]]
    * (9 bands over all 64 bits) and the media perceptual-hash path
    * ([[JsonMediaOps.mediaNearDup]] — 4 bands over the low 32), so the
    * Hamming families can never diverge on banding.
    *
    * Recall contract: pigeonhole needs only nBands > maxHamming,
    * REGARDLESS of cover — a pair with ≤ maxHamming errors over all 64
    * bits has ≤ maxHamming errors inside ANY bit subset, so one of the
    * > maxHamming disjoint bands inside that subset agrees. Banding a
    * SUBSET is the lever when part of the signature is low-entropy: the
    * media dHash's tail bits are constant-zero for same-length docs
    * (PERF.md r11), and a band over them is one degenerate key holding
    * the whole corpus — measured 191 s at sf1 vs 2.4 s with the tail
    * excluded from banding (verification still reads all 64 bits). */
  private[graft] def hammingBands(sig: DataFrame, sigName: String,
      nBands: Int = SimhashBands, cover: Int = 64): DataFrame = {
    val bounds = (0 to nBands).map(i => i * cover / nBands)
    sig.select(col("doc_id"), col(sigName),
      posexplode(array((0 until nBands).map { i =>
        val width = bounds(i + 1) - bounds(i)
        shiftrightunsigned(col(sigName), bounds(i))
          .bitwiseAND(lit((1L << width) - 1))
      }: _*)))
      .select(col("doc_id"), col(sigName),
        col("pos").as("band"), col("col").as("band_bits"))
  }

  def simhashNearDup(spark: SparkSession, sfDir: String, maxHamming: Int = 8,
      maxBandDf: Int = SimhashBandDfCap): DataFrame = {
    val banded = simBandCache.getOrElseUpdate(spark, sfDir) {
      hammingBands(simhash(spark, sfDir), "simhash")
    }
    hammingBandNearDup(banded, "simhash", maxHamming, maxBandDf)
  }

  /** The Hamming near-dup pair join over a pre-banded signature frame
    * (doc_id, `sigName`, band, band_bits) — hot-key sub-salting, the
    * first-matching-band gate, and the bit_count verify, shared across
    * signature kinds (SimHash text signatures, media dHashes). */
  private[graft] def hammingBandNearDup(banded: DataFrame, sigName: String,
      maxHamming: Int, maxBandDf: Int,
      nBands: Int = SimhashBands, cover: Int = 64): DataFrame = {
    require(maxHamming < nBands, "bands must outnumber allowed bit errors")
    val bounds = (0 to nBands).map(i => i * cover / nBands)
    val bands = subSaltHotKeys(banded,
      "doc_id", maxBandDf, bandCols = Seq("band", "band_bits"))
    // FIRST-MATCHING-BAND gate: emit a pair only at the lowest band
    // where the signatures agree. SimHash bits on real text are skewed
    // (common tokens push vote bits the same way), so near-identical
    // signatures agree in MANY bands — measured 8.17M band-join rows for
    // 5.85M distinct pairs at sf0.1 (1.4× duplication), with the
    // duplicates growing with similarity density. Both signatures ride
    // each joined row, so "no earlier band agrees" is a pure projection
    // of their XOR (9 mask tests, codegen'd) evaluated as the LAST
    // conjunct — it cuts join OUTPUT before the verify projection, and
    // it makes every emitted pair globally unique, so the result needs
    // no distinct() (one whole shuffle of the verified pairs gone;
    // measured 1.0–1.7 s → ~0.5 s warm at sf0.1). Hot-key caveat: when
    // sub-salting engages (df > cap), a pair whose first agreeing band
    // is sharded away is no longer recovered via a later band — an
    // extension of the documented cap trade (cross-shard pairs are
    // already dropped); transitive clustering recovers members, and the
    // adversarial fixture (identical docs ⇒ identical shard layout in
    // every band) keeps the same bounds.
    val xorSig = col(s"x.$sigName").bitwiseXOR(col(s"y.$sigName"))
    val firstBand = (0 until nBands).reverse
      .foldLeft(lit(nBands)) { (acc, i) =>
        val width = bounds(i + 1) - bounds(i)
        val mask = ((1L << width) - 1) << bounds(i)
        when(xorSig.bitwiseAND(lit(mask)) === 0, lit(i)).otherwise(acc)
      }
    bands.as("x").join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.band_bits") === col("y.band_bits") &&
          col("x.shard") === col("y.shard") &&
          col("x.doc_id") < col("y.doc_id") &&
          firstBand === col("x.band"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        bit_count(xorSig).cast("long").as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .orderBy("doc_a", "doc_b")
  }

  /** Hamming band join of TWO banded signature frames (left: corpus,
    * right: a broadcast-bounded reference set — the caller wraps it in
    * broadcast()): pairs within `maxHamming` bits, each emitted exactly
    * once via the first-matching-band gate. No df-cap sharding — on the
    * cross path the candidate volume per corpus row is bounded by the
    * broadcast side's occupancy of the key ([[decontamNearDup]]'s
    * structural argument), so the guard's shuffle machinery would cost
    * more than it saves. Exactness: pigeonhole over the banded subset
    * guarantees every qualifying pair agrees on some band, and no cap
    * drops any — the output IS the exact cross-set pair set, so the
    * oracle can replay it with a direct n·(bench) bit_count join and no
    * banding machinery at all. */
  private[graft] def hammingBandJoin(left: DataFrame, right: DataFrame,
      sigName: String, maxHamming: Int, nBands: Int, cover: Int): DataFrame = {
    require(maxHamming < nBands, "bands must outnumber allowed bit errors")
    val bounds = (0 to nBands).map(i => i * cover / nBands)
    val xorSig = col(s"x.$sigName").bitwiseXOR(col(s"y.$sigName"))
    val firstBand = (0 until nBands).reverse
      .foldLeft(lit(nBands)) { (acc, i) =>
        val width = bounds(i + 1) - bounds(i)
        val mask = ((1L << width) - 1) << bounds(i)
        when(xorSig.bitwiseAND(lit(mask)) === 0, lit(i)).otherwise(acc)
      }
    left.as("x").join(right.as("y"),
        col("x.band") === col("y.band") &&
          col("x.band_bits") === col("y.band_bits") &&
          firstBand === col("x.band"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        bit_count(xorSig).cast("long").as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }

  /** One large-star round (Kiveris et al., "Connected Components in
    * MapReduce and Beyond"): every node u connects its strictly-LARGER
    * neighbors to m = min(Γ(u) ∪ {u}). One symmetric explode, one hash
    * aggregate for the mins, one equi-join — no driver data. */
  private def largeStar(e: DataFrame): DataFrame = {
    val sym = e.union(e.select(col("v").as("u"), col("u").as("v")))
    val mins = sym.groupBy("u").agg(min("v").as("mn"))
      .select(col("u"), least(col("u"), col("mn")).as("m"))
    sym.join(mins, "u")
      .filter(col("v") > col("u"))
      .select(col("v").as("u"), col("m").as("v"))
      .distinct()
  }

  /** One small-star round: edges directed downward (hi → lo); every node u
    * re-points its ≤-neighbors (and itself) at m = min(Γ≤(u) ∪ {u}). */
  private def smallStar(e: DataFrame): DataFrame = {
    val dir = e.select(greatest(col("u"), col("v")).as("u"),
        least(col("u"), col("v")).as("v"))
      .filter(col("u") =!= col("v")).distinct()
    val mins = dir.groupBy("u").agg(min("v").as("mn")) // mn < u by direction
    dir.join(mins, "u")
      .select(col("v").as("u"), col("mn").as("v"))
      .filter(col("u") =!= col("v")) // drop the (m, m) self-edge
      .union(mins.select(col("u"), col("mn").as("v")))
      .distinct()
  }

  /** Connected components over an undirected pair graph via alternating
    * large-star/small-star — O(log n) rounds on ANY graph shape (a
    * diameter-d min-label propagation needs d rounds; star contraction
    * halves path lengths, so a 100-node chain converges in ~7). Each round
    * is `smallStar(largeStar(edges))` = two aggregates + two joins, and
    * `localCheckpoint` cuts the plan lineage so round k's plan does not
    * embed rounds 1..k-1 (unbounded lineage is the classic iterative-Spark
    * OOM/stack-overflow at scale; on a production cluster with a
    * fault-tolerance requirement, swap for reliable `checkpoint` to a
    * cluster-visible directory). Driver traffic per round is ONE
    * (count, hash-sum) row for the convergence check — never edge data.
    *
    * Convergence: the star edge set is a fixpoint of both rounds, detected
    * by an (edge count, order-independent xxhash64 sum) signature match
    * between consecutive rounds. At the fixpoint every non-root node
    * carries exactly one edge to its component min.
    *
    * @param pairs undirected edges as (doc_a, doc_b) — any orientation
    * @return (doc_id, label): component-min label for every node that
    *         appears in `pairs` (callers join singletons back themselves)
    */
  def connectedComponents(pairs: DataFrame, maxRounds: Int = 25): DataFrame = {
    var edges = pairs
      .select(col("doc_a").cast("long").as("u"), col("doc_b").cast("long").as("v"))
      .filter(col("u") =!= col("v")).distinct()
      .localCheckpoint()
    // (count, xor-of-hashes): order-independent, overflow-free (a SUM of
    // longs trips ANSI overflow), and sound as a SET signature because the
    // edge frame is distinct
    def signature(e: DataFrame): (Long, Long) = {
      val r = e.agg(count(lit(1)), bit_xor(xxhash64(col("u"), col("v")))).head()
      (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
    }
    var sig = signature(edges)
    var converged = sig._1 == 0L
    var round = 0
    while (!converged && round < maxRounds) {
      val prev = edges
      edges = smallStar(largeStar(edges)).localCheckpoint()
      val next = signature(edges)
      converged = next == sig
      sig = next
      round += 1
      // Dataset.unpersist is a CacheManager no-op for localCheckpoint'd
      // frames (RDD-level storage) — release the round's blocks eagerly
      // through the bridge, or they pile up for the whole loop
      org.apache.spark.sql.GraftBridge.unpersistLocalCheckpoint(prev)
    }
    // fixpoint edges are (node → component min); min() guards the
    // pre-convergence maxRounds exit where a node could carry two edges
    val nonRoots = edges.groupBy(col("u").as("doc_id")).agg(min(col("v")).as("label"))
    val roots = edges.select(col("v").as("r")).distinct()
      .join(edges.select(col("u")), col("r") === col("u"), "left_anti")
      .select(col("r").as("doc_id"), col("r").as("label"))
    // materialize the (small) label table and release the fixpoint edges'
    // checkpoint blocks — otherwise every invocation strands them for the
    // JVM's lifetime (Dataset.unpersist can't reach them; see
    // GraftBridge.unpersistLocalCheckpoint). The RESULT is itself a local
    // checkpoint: callers that invoke this repeatedly (per micro-batch
    // streams) should release it the same way once consumed.
    val labels = nonRoots.union(roots).localCheckpoint()
    org.apache.spark.sql.GraftBridge.unpersistLocalCheckpoint(edges)
    labels
  }

  /** Dedup clusters — the step that turns near-dup PAIRS into CLUSTERS
    * (keeper = min doc_id per component; transitive near-dups A~B~C
    * collapse to one cluster even when A and C are not directly similar).
    * Pairs come from the banded MinHash path; components are computed with
    * [[connectedComponents]] (large-star/small-star, O(log n) rounds);
    * singleton docs keep their own id via the left join, so the output is
    * the complete (doc_id, cluster_id) keeper table. */
  /** Converged labels cached per (session, sfDir): the returned frame
    * hangs off localCheckpoint'd edge RDDs a caller cannot release —
    * without the cache every invocation (bench runs each query twice:
    * warm-up + timed) would strand blocks in the block manager. Entries
    * evict on session end like the shingle cache. */
  private val clusterCache = new graft.SessionFrameCache[String]

  def dedupClusters(spark: SparkSession, sfDir: String): DataFrame =
    clusterCache.getOrElseUpdate(spark, sfDir) {
      val pairs = minhashNearDup(spark, sfDir).select(col("doc_a"), col("doc_b"))
      val comp = connectedComponents(pairs)
      Tables.documents(spark, sfDir)
        .join(comp.withColumnRenamed("doc_id", "cc_id"),
          col("doc_id") === col("cc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("label"), col("doc_id")).as("label"))
    }.select(col("doc_id"), col("label").as("cluster_id")).orderBy("doc_id")

  /** [[dedupClusters]] over a survivor id set: components of the corpus
    * near-dup graph INDUCED on the scope ([[minhashNearDupScoped]]), so
    * clusters can legitimately SPLIT relative to the full-corpus table
    * when a bridge document is outside the scope — the staged-curation
    * semantics. Scoped singletons label themselves. UNCACHED (the scope
    * is caller state a (session, sfDir) key cannot see) — callers that
    * re-invoke per benchmark iteration should cache the result frame
    * themselves, as [[graft.ext.TextOps.curationPipelineStaged]] does. */
  def dedupClustersScoped(spark: SparkSession, sfDir: String,
      scope: DataFrame): DataFrame = {
    val pairs = minhashNearDupScoped(spark, sfDir, scope)
      .select(col("doc_a"), col("doc_b"))
    val comp = connectedComponents(pairs)
    scope.select(col("doc_id"))
      .join(comp.withColumnRenamed("doc_id", "cc_id"),
        col("doc_id") === col("cc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("label"), col("doc_id")).as("cluster_id"))
  }

  /** Near-dup-aware train/test split — closes the leakage mode
    * [[TextOps.trainTestSplit]] cannot: content-hash splitting co-assigns
    * byte-identical copies, but a NEAR-duplicate pair (one sentence
    * changed) can straddle the boundary, leaking test content into train
    * (Lee et al. '21 measure this inflating eval scores). Here the split
    * is decided once per near-dup CLUSTER ([[dedupClusters]] — the
    * transitive MinHash closure) by hashing the cluster representative's
    * normalized text with the exact split's salt+cut scheme, and every
    * member inherits it: near-dups land on the same side by construction,
    * and a singleton doc (its own representative) gets byte-for-byte the
    * split [[TextOps.trainTestSplit]] gives it — the op only REFINES the
    * exact split within clusters, so split fractions are preserved up to
    * cluster granularity.
    *
    * Plan: the (session-cached) cluster table joins the documents scan's
    * (doc_id, split) projection on cluster_id = representative doc_id —
    * one equi-join of two doc-sized frames; text is hashed inside the
    * scan, so only (id, 5-char split) rows ever shuffle. At 100 TB this
    * adds one hash-partitioned join on top of the cluster build itself —
    * no window, no skew (a cluster key repeats once per MEMBER, and
    * near-dup clusters are small by construction). */
  def trainTestSplitNearDup(spark: SparkSession, sfDir: String,
      testPct: Int = 10, salt: String = "graft"): DataFrame = {
    require(testPct >= 0 && testPct < 100,
      s"testPct must be in [0, 99], got $testPct")
    val cut = f"${(256 * testPct) / 100}%02x"
    val h = md5(concat(lit(salt), TextOps.normText(col("text"))))
    val repSplit = Tables.documents(spark, sfDir)
      .select(col("doc_id").as("cluster_id"),
        when(substring(h, 1, 2) < cut, "test").otherwise("train").as("split"))
    dedupClusters(spark, sfDir)
      .join(repSplit, "cluster_id")
      .select(col("doc_id"), col("cluster_id"), col("split"))
      .orderBy("doc_id")
  }

  /** Quality-aware cluster representatives — production dedup keeps the
    * BEST document per near-dup cluster, not the first: one row per
    * cluster with the argmax-quality member (ties broken by min doc_id —
    * deterministic cross-engine because the quality score is built from
    * exact integer ratios, see [[TextOps.textQuality]]), the member count,
    * and the winning score.
    *
    * Plan: clusters (large-star/small-star) ⋈ quality (single scan), one
    * window per cluster_id. Near-dup clusters are small by construction
    * (banded LSH pairs), so the per-cluster window cannot funnel; the
    * aggregate shuffles one row per doc. */
  def clusterKeepers(spark: SparkSession, sfDir: String): DataFrame = {
    val quality = TextOps.textQuality(spark, sfDir)
      .select(col("doc_id"), col("quality_score"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("cluster_id"))
      .orderBy(col("quality_score").desc, col("doc_id").asc)
    dedupClusters(spark, sfDir)
      .join(quality, "doc_id")
      .withColumn("rk", row_number().over(w))
      .groupBy(col("cluster_id"))
      .agg(
        min(when(col("rk") === 1, col("doc_id"))).as("keeper_doc_id"),
        count(lit(1)).as("n_members"),
        max(when(col("rk") === 1, col("quality_score"))).as("keeper_quality"))
      .orderBy("cluster_id")
  }

  /** Fuzzy-match constants shared with the oracle: candidate blocks are
    * (first two lowercased tokens, length div 40); blocks larger than
    * [[FuzzyBlockCap]] are dropped as non-discriminative (the winnow
    * df-cap contract — a degenerate prefix shared by m documents would
    * otherwise cost m² edit distances); a pair matches when the edit
    * distance is at most [[FuzzyMaxDistPct]]% of the longer text. */
  val FuzzyBlockCap = 50
  val FuzzyMaxDistPct = 20

  /** Occupancy threshold above which a block's key is REFINED (third
    * token + length-div-10) before the cap is applied. The two-token key
    * space saturates as the corpus grows — the sf1 probe measured
    * distinct blocks growing 2.9× on 10× docs, so occupancy (and with it
    * candidate pairs, ~m² per block) rises super-linearly: 1,318 →
    * 121,876 pairs (92×) at 10× data, with the cap (50) not yet binding
    * at max occupancy 18. Refining only blocks past this threshold keeps
    * small blocks byte-identical to the unrefined construction (at
    * sf0.1, max occupancy 5, refinement never engages) while splitting
    * dense ones BEFORE they approach the cap's recall cliff. Chosen
    * comfortably under the sf1 max so the probe exercises the refined
    * path; a pair split apart by the finer key is the blocking
    * trade-off, replayed identically by the oracle. */
  val FuzzyRefineAt = 8

  /** The fuzzy-match base block key: (first two lowercased tokens,
    * length-div-40 bucket), null when the text has fewer than two
    * tokens. ONE definition shared by [[fuzzyMatch]] and
    * [[fuzzyDroppedBlocks]] (via [[fuzzyKeyedDocs]]) — the telemetry
    * row's whole contract is that it counts the SAME key space the
    * matcher blocks on. */
  private def fuzzyBlockKey: Column = concat(
    expr("try_element_at(split(trim(lower(text)), ' '), 1)"), lit("|"),
    expr("try_element_at(split(trim(lower(text)), ' '), 2)"), lit("|"),
    expr("cast(length(text) div 40 as string)"))

  /** Refinement suffix for saturated blocks: third token (empty when
    * absent — coalesce so refinement can never null out an existing
    * key) + the finer length-div-10 bucket. */
  private def fuzzyFineKey: Column = concat(
    fuzzyBlockKey, lit("|"),
    coalesce(expr("try_element_at(split(trim(lower(text)), ' '), 3)"), lit("")),
    lit("|"), expr("cast(length(text) div 10 as string)"))

  /** Keyed-docs frame cached per (session, sfDir, refineAt): the
    * occupancy pre-pass costs one extra doc scan + aggregate, and the
    * frame has FOUR consumers per bench pass (fuzzyMatch's kept-count
    * aggregate and both join sides, plus fuzzyDroppedBlocks) — without
    * the persist each would re-run the counts + re-key. */
  private val fuzzyKeyCache = new graft.SessionFrameCache[(String, Int)]

  /** (doc_id, text, blk) with the occupancy-adaptive key: documents in
    * base-key blocks whose occupancy exceeds [[FuzzyRefineAt]] carry the
    * refined key, all others the base key. Two aggregation passes over
    * the doc scan (base-key counts, then the final key) — both linear;
    * the saturated-key list is bounded by n/[[FuzzyRefineAt]] keys and
    * joins back broadcast, so the doc frame never shuffles for the
    * guard. Shared by [[fuzzyMatch]] and [[fuzzyDroppedBlocks]] so the
    * telemetry row counts exactly the key space the matcher blocks on. */
  private def fuzzyKeyedDocs(spark: SparkSession, sfDir: String,
      refineAt: Int): DataFrame =
    fuzzyKeyCache.getOrElseUpdate(spark, (sfDir, refineAt)) {
      val d = Tables.documents(spark, sfDir)
        .select(col("doc_id"), col("text"), fuzzyBlockKey.as("blk0"))
      val sat = d.filter(col("blk0").isNotNull)
        .groupBy(col("blk0")).agg(count(lit(1)).as("bn0"))
        .filter(col("bn0") > refineAt)
        .select(col("blk0"), lit(true).as("sat"))
      d.join(broadcast(sat), Seq("blk0"), "left")
        .select(col("doc_id"), col("text"),
          when(col("sat").isNotNull, fuzzyFineKey).otherwise(col("blk0")).as("blk"))
    }

  /** Fuzzy string matching (record linkage): near-identical documents
    * found by BLOCKED Levenshtein — the classic dedup path for short
    * records (titles, addresses) where token sets are too coarse. The
    * edit-distance predicate is integer-exact (dist·100 ≤ pct·maxlen), so
    * the result is oracle-checkable against DuckDB's levenshtein, which
    * implements the same unit-cost DP.
    *
    * Scale shape: one composite-key equi-join (block key), with block
    * sizes capped BEFORE the join so candidate volume is ≤ cap·|blocks|;
    * the O(len²) distance runs only on candidates. Documents whose block
    * key is null (fewer than two tokens) are excluded by the
    * null-propagating key on both sides. */
  def fuzzyMatch(spark: SparkSession, sfDir: String,
      maxDistPct: Int = FuzzyMaxDistPct, blockCap: Int = FuzzyBlockCap,
      refineAt: Int = FuzzyRefineAt): DataFrame = {
    val d = fuzzyKeyedDocs(spark, sfDir, refineAt)
    val kept = d.join(
      d.groupBy(col("blk")).agg(count(lit(1)).as("bn"))
        .filter(col("bn") <= blockCap).select(col("blk")), "blk")
    // Banded DP with a PER-PAIR bound (r5 verdict: full-DP levenshtein
    // was 6.5 s — 14% of the whole bench — on bounded candidate volume):
    // dist ≤ floor(mx·pct/100) ⟺ dist·100 ≤ mx·pct for integer dist, so
    // filtering on the bounded kernel's -1 sentinel is bit-identical to
    // the full-DP + threshold formulation the oracle replays. The kernel
    // also short-circuits |len(a)-len(b)| > bound pairs in O(1) — the
    // length-difference pre-filter, subsumed rather than bolted on.
    //
    // The distance predicate is written as the LAST join conjunct, not a
    // post-join .filter: Catalyst merges a both-sides filter into the
    // join condition with the merged predicate FIRST, which evaluated
    // the DP for every same-block candidate — including the ~half that
    // fail the cheap doc_id< conjunct (measured 4.8 s → 1.0 s at sf0.1
    // from the reorder alone; short-circuit AND order inside a join
    // condition follows the written order). The projected dist then
    // recomputes the kernel only on the few SURVIVING pairs.
    def levWithin(a: Column, b: Column): Column =
      graft.functions.TextDistanceFunctions.levenshteinWithin(a, b,
        expr(s"(greatest(length(a.text), length(b.text)) * $maxDistPct) div 100"))
    kept.as("a").join(kept.as("b"),
        col("a.blk") === col("b.blk") && col("a.doc_id") < col("b.doc_id") &&
          levWithin(col("a.text"), col("b.text")) >= 0)
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        levWithin(col("a.text"), col("b.text")).cast("long").as("dist"))
      .orderBy("doc_a", "doc_b")
  }

  /** Telemetry for [[fuzzyMatch]]'s block cap (the winnow-df-cap
    * contract, made driver-visible): how many candidate blocks — and
    * documents in them — the cap drops as non-discriminative, counted
    * over the SAME occupancy-adaptive key space the matcher blocks on
    * ([[fuzzyKeyedDocs]]). With refinement in front of it, the cap now
    * only drops blocks that saturate even the refined key; this row is
    * still the number to watch, and its oracle replays the same
    * two-phase key + cap. */
  def fuzzyDroppedBlocks(spark: SparkSession, sfDir: String,
      blockCap: Int = FuzzyBlockCap, refineAt: Int = FuzzyRefineAt): DataFrame =
    fuzzyKeyedDocs(spark, sfDir, refineAt)
      .filter(col("blk").isNotNull)
      .groupBy(col("blk")).agg(count(lit(1)).as("bn"))
      .filter(col("bn") > blockCap)
      .agg(count(lit(1)).as("n_dropped_blocks"),
        coalesce(sum(col("bn")), lit(0L)).as("n_dropped_docs"))

  /** Total PageRank mass (integer units), damping numerator (percent),
    * and iteration count — shared with the generated oracle. */
  val PrMass = 1000000000000L
  val PrDamp = 85
  val PrIters = 2

  private val prEdgeCache = new graft.SessionFrameCache[String]

  /** INTEGER-deterministic PageRank over the (undirected, symmetrized)
    * near-duplicate graph — "how central is a document in its boilerplate
    * neighborhood". All arithmetic is integer: ranks carry [[PrMass]]
    * units, each node's contribution is `rank div degree`, damping is
    * `(85 · inflow) div 100`, so the result is bit-identical on any
    * engine and any partial-sum order — which is what lets a PageRank,
    * normally a float fixpoint, be hash-checked by a generated DuckDB
    * replay ([[pagerankOracleSql]]). Dangling (isolated) mass is NOT
    * redistributed: isolated docs sit at the base rank, a documented
    * simplification shared by both sides.
    *
    * Plan shape per iteration (the scalable Gauss-Jordan-free loop):
    * contribution = ranks ⋈ degree (one equi-join), inflow = edges ⋈
    * contribution + one hash aggregate on dst — O(E) shuffled rows per
    * round, no windows, no driver state; the edge frame is a session-
    * cached localCheckpoint so iterations do not replay the LSH pair
    * join. At 100 TB the same loop runs with edges pre-partitioned by
    * src (one-time shuffle amortized across iterations). */
  def pagerankNearDup(spark: SparkSession, sfDir: String,
      iters: Int = PrIters): DataFrame = {
    val edges = prEdgeCache.getOrElseUpdateRaw(spark, sfDir) {
      val pairs = minhashNearDup(spark, sfDir).select(col("doc_a"), col("doc_b"))
      pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
        .unionByName(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
        .localCheckpoint()
    }
    val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    val nodes = Tables.documents(spark, sfDir).select(col("doc_id"))
    val tot = nodes.agg(count(lit(1)).as("n"))
    var ranks = nodes.crossJoin(broadcast(tot))
      .select(col("doc_id"), expr(s"$PrMass div n").as("r"))
    for (_ <- 1 to iters) {
      val contrib = ranks.withColumnRenamed("doc_id", "src").join(deg, "src")
        .select(col("src"), expr("r div deg").as("c"))
      val inflow = edges.join(contrib, "src")
        .groupBy(col("dst")).agg(sum(col("c")).as("inc"))
      ranks = nodes.crossJoin(broadcast(tot))
        .join(inflow, col("doc_id") === col("dst"), "left")
        .select(col("doc_id"), expr(
          s"($PrMass * ${100 - PrDamp}) div (100 * n)" +
            s" + ($PrDamp * coalesce(inc, 0L)) div 100").as("r"))
    }
    ranks.select(col("doc_id"), col("r").as("pr_rank")).orderBy("doc_id")
  }

  /** Literal iteration-by-iteration replay of [[pagerankNearDup]],
    * generated from the same constants. */
  private[ext] def pagerankOracleSql(iters: Int = PrIters): String = {
    val base = s"($PrMass * ${100 - PrDamp}) // (100 * n)"
    val iterCtes = (1 to iters).map { i =>
      s"""c$i AS (
         |  SELECT r.doc_id AS src, r.r // d.deg AS c
         |  FROM r${i - 1} r JOIN deg d ON r.doc_id = d.src),
         |in$i AS (
         |  SELECT e.dst, CAST(SUM(c.c) AS BIGINT) AS inc
         |  FROM edges e JOIN c$i c ON e.src = c.src GROUP BY e.dst),
         |r$i AS (
         |  SELECT d.doc_id,
         |    $base + ($PrDamp * COALESCE(i.inc, 0)) // 100 AS r
         |  FROM documents d CROSS JOIN tot LEFT JOIN in$i i ON d.doc_id = i.dst)"""
        .stripMargin
    }.mkString(",\n")
    shingleCteFrom("documents") +
      s""", sx AS (
         |  SELECT doc_id, len(sh) AS nsh, unnest(sh) AS g FROM s
         |), pairs AS MATERIALIZED (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM sx a JOIN sx b ON a.g = b.g AND a.doc_id < b.doc_id
         |  GROUP BY a.doc_id, b.doc_id, a.nsh, b.nsh
         |  HAVING CAST(COUNT(*) AS DOUBLE) / (a.nsh + b.nsh - COUNT(*)) >= 0.6
         |), edges AS MATERIALIZED (
         |  SELECT doc_a AS src, doc_b AS dst FROM pairs
         |  UNION ALL SELECT doc_b, doc_a FROM pairs
         |), deg AS (SELECT src, COUNT(*) AS deg FROM edges GROUP BY src),
         |tot AS (SELECT COUNT(*) AS n FROM documents),
         |r0 AS (SELECT doc_id, $PrMass // n AS r FROM documents CROSS JOIN tot),
         |$iterCtes
         |SELECT doc_id, r AS pr_rank FROM r$iters ORDER BY doc_id""".stripMargin
  }

  /** The shared shingle CTE for DuckDB oracles. `s` is MATERIALIZED
    * (hint-only, no semantic change): DuckDB inlines CTEs by default,
    * and the multi-consumer oracles (closure, PageRank rounds) would
    * otherwise recompute the shingle build — and anything stacked on
    * it — once per reference. */
  private def shingleCteFrom(from: String) =
    s"""WITH t AS (
      |  SELECT doc_id, list_filter(string_split(trim(text), ' '), x -> x <> '') AS toks
      |  FROM $from
      |), s AS MATERIALIZED (
      |  SELECT doc_id, CASE WHEN len(toks) < 3 THEN []
      |    ELSE list_distinct([toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
      |                        for i in range(1, len(toks) - 1)]) END AS sh
      |  FROM t
      |)
      |""".stripMargin

  /** Exact Jaccard pairs via an INVERTED-INDEX join (r8): |A∩B| is the
    * group-count of shared shingles, |A∪B| = |A| + |B| − ∩ (the sh
    * lists are distinct), so the doubles are built from the same
    * integers as the original all-pairs `list_intersect` form —
    * bit-identical values. Exactness is unchanged — a pair at Jaccard
    * ≥ 0.6 necessarily shares shingles, so no qualifying pair can be
    * missed — and the replay still uses no LSH machinery, preserving
    * the independence argument. The rewrite is what makes the family's
    * sf0.1/sf1 sweeps tractable: DuckDB executes the old inequality
    * self-join as a single-threaded nested loop (measured ≥ 25 min at
    * 5k docs, unbounded at 50k), where the equi-join on shingle value
    * is hash-partitioned and output-bounded by true shared-shingle
    * mass. */
  private def jaccardSql(from: String) = shingleCteFrom(from) +
    """, sx AS (
      |  SELECT doc_id, len(sh) AS nsh, unnest(sh) AS g FROM s
      |)
      |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
      |  CAST(COUNT(*) AS DOUBLE) / (a.nsh + b.nsh - COUNT(*)) AS jaccard
      |FROM sx a JOIN sx b ON a.g = b.g AND a.doc_id < b.doc_id
      |GROUP BY a.doc_id, b.doc_id, a.nsh, b.nsh
      |HAVING CAST(COUNT(*) AS DOUBLE) / (a.nsh + b.nsh - COUNT(*)) >= 0.6
      |ORDER BY doc_a, doc_b""".stripMargin

  /** DuckDB replay of [[simhash]]: per-token 64-bit hash = first 8 md5 hex
    * chars (hi32) and next 8 (lo32), decoded via strpos-over-hex-alphabet;
    * per-bit ±1 vote sums replayed with a 64-row bit table; the signed
    * long is reassembled as low-63-bits + an explicit sign-bit term (DuckDB
    * BIGINT can't shift into bit 63 without overflow). Tokenless docs fold
    * to all-ones = -1 (vote 0 >= 0 on every bit), restored by the COALESCE
    * since they produce no unnested token rows. */
  private val simhashCte: String =
    """WITH t AS (
      |  SELECT doc_id, list_filter(string_split(trim(text), ' '), x -> x <> '') AS toks
      |  FROM documents
      |), tok AS (
      |  SELECT doc_id, unnest(toks) AS tk FROM t
      |), hl AS (
      |  SELECT doc_id,
      |    list_sum([(strpos('0123456789abcdef', substr(md5(tk), i, 1)) - 1)::BIGINT
      |              << (4*(8-i)) for i in range(1,9)]) AS hi,
      |    list_sum([(strpos('0123456789abcdef', substr(md5(tk), i+8, 1)) - 1)::BIGINT
      |              << (4*(8-i)) for i in range(1,9)]) AS lo
      |  FROM tok
      |), votes AS (
      |  SELECT doc_id, b.bit,
      |    2 * SUM(CASE WHEN b.bit < 32 THEN (lo >> b.bit) & 1
      |                 ELSE (hi >> (b.bit - 32)) & 1 END) - COUNT(*) AS vote
      |  FROM hl CROSS JOIN (SELECT unnest(range(64)) AS bit) b
      |  GROUP BY doc_id, b.bit
      |), shv AS (
      |  SELECT doc_id,
      |    SUM(CASE WHEN vote >= 0 AND bit < 63 THEN 1::BIGINT << bit ELSE 0 END)
      |      + CASE WHEN MAX(CASE WHEN bit = 63 AND vote >= 0 THEN 1 ELSE 0 END) = 1
      |             THEN -9223372036854775808 ELSE 0 END AS simhash
      |  FROM votes GROUP BY doc_id
      |), sh AS (
      |  SELECT d.doc_id, COALESCE(shv.simhash, -1)::BIGINT AS simhash
      |  FROM documents d LEFT JOIN shv ON d.doc_id = shv.doc_id
      |)
      |""".stripMargin

  /** The 9-band split of [[simhashCte]] signatures as (band, divisor, mod)
    * rows — unsigned semantics via a HUGEINT lift of the signed value. */
  private def bandsSql(nBands: Int, cover: Int): String = {
    val bounds = (0 to nBands).map(i => i * cover / nBands)
    val rows = (0 until nBands).map { i =>
      val divisor = BigInt(1) << bounds(i)
      val modv = BigInt(1) << (bounds(i + 1) - bounds(i))
      s"($i, ${divisor}::HUGEINT, ${modv}::HUGEINT)"
    }.mkString(", ")
    s""", u AS (
      |  SELECT doc_id, simhash,
      |    CASE WHEN simhash < 0
      |         THEN simhash::HUGEINT + 18446744073709551616::HUGEINT
      |         ELSE simhash::HUGEINT END AS uh
      |  FROM sh
      |), bx AS (
      |  SELECT doc_id, simhash, b.band,
      |    ((uh // b.divisor) % b.modv)::BIGINT AS band_bits
      |  FROM u CROSS JOIN (VALUES $rows) b(band, divisor, modv)
      |)
      |""".stripMargin
  }

  /** DuckDB replay of the engine's FIRST-MATCHING-BAND gate: the lowest
    * band index whose mask of xor(x.simhash, y.simhash) is zero (9 if
    * none — then no band join matched anyway). Generated from the same
    * band bounds as [[simhashNearDup]]; masks are signed 64-bit literals
    * so band 8 (bit 63) wraps identically in both engines. */
  private def firstBandSql(nBands: Int, cover: Int): String = {
    val bounds = (0 to nBands).map(i => i * cover / nBands)
    val whens = (0 until nBands).map { i =>
      val width = bounds(i + 1) - bounds(i)
      val mask = ((1L << width) - 1) << bounds(i)
      s"WHEN (xor(x.simhash, y.simhash) & (${mask}::BIGINT)) = 0 THEN $i"
    }.mkString(" ")
    s"CASE $whens ELSE $nBands END"
  }

  /** CTE pair (d0 → d, no WITH keyword) replaying the occupancy-adaptive
    * block key of [[fuzzyKeyedDocs]]: base two-token key, then the
    * refined key for blocks past [[FuzzyRefineAt]]. Shared by the
    * fuzzy_match and fuzzy_dropped_blocks oracles so the two replays
    * (and the Scala side) cannot drift. */
  private def FuzzyKeyCtes: String =
    s"""d0 AS (
       |  SELECT doc_id, text,
       |    string_split(trim(lower(text)), ' ')[1] || '|' ||
       |    string_split(trim(lower(text)), ' ')[2] || '|' ||
       |    CAST(length(text) // 40 AS VARCHAR) AS blk0
       |  FROM documents
       |), d AS (
       |  SELECT doc_id, text,
       |    CASE WHEN blk0 IS NOT NULL
       |           AND COUNT(*) OVER (PARTITION BY blk0) > $FuzzyRefineAt
       |      THEN blk0 || '|' ||
       |        COALESCE(string_split(trim(lower(text)), ' ')[3], '') || '|' ||
       |        CAST(length(text) // 10 AS VARCHAR)
       |      ELSE blk0 END AS blk
       |  FROM d0
       |)""".stripMargin

  /** The whole Hamming-pair replay downstream of a signature CTE — the
    * 9-band split, the df-cap sub-salt guard, the first-matching-band
    * gate, and the bit_count verify. Expects the preceding CTE chain to
    * end with `sh(doc_id, simhash)`; shared VERBATIM by the
    * simhash_near_dup and media_near_dup oracles (the no-fork
    * discipline: one banding replay, two signature kinds). */
  /** The CTE chain (u/bx/dfc/bs) of [[hammingPairsSql]] — split out so
    * stacking oracles (the media cluster closure) can reuse the banding
    * replay and wrap only the pair SELECT in their own CTE. */
  private[graft] def hammingPairsCtes(cap: Int = SimhashBandDfCap,
      nBands: Int = SimhashBands, cover: Int = 64): String =
    bandsSql(nBands, cover) +
    s""", dfc AS (
       |  SELECT band, band_bits, COUNT(*)::BIGINT AS df
       |  FROM bx GROUP BY band, band_bits
       |), bs AS (
       |  SELECT bx.doc_id, bx.simhash, bx.band, bx.band_bits,
       |    CASE WHEN d.df > $cap THEN
       |      list_sum([(strpos('0123456789abcdef',
       |          substr(md5(CAST(bx.doc_id AS VARCHAR)), i, 1)) - 1)::BIGINT
       |          << (4 * (15 - i)) FOR i IN range(1, 16)])
       |        % ((d.df + ${cap - 1}) // $cap)
       |    ELSE 0 END AS shard
       |  FROM bx JOIN dfc d USING (band, band_bits)
       |)
       |""".stripMargin

  /** The pair SELECT over [[hammingPairsCtes]]' `bs` frame (no ORDER BY
    * — callers embed it as a CTE body or append their own). */
  private[graft] def hammingPairsSelect(maxHamming: Int = 8,
      nBands: Int = SimhashBands, cover: Int = 64): String =
    s"""SELECT x.doc_id AS doc_a, y.doc_id AS doc_b,
       |  bit_count(xor(x.simhash, y.simhash))::BIGINT AS hamming
       |FROM bs x JOIN bs y
       |  ON x.band = y.band AND x.band_bits = y.band_bits
       |  AND x.shard = y.shard AND x.doc_id < y.doc_id
       |  AND (${firstBandSql(nBands, cover)}) = x.band
       |WHERE bit_count(xor(x.simhash, y.simhash)) <= $maxHamming""".stripMargin

  private[graft] def hammingPairsSql(maxHamming: Int = 8,
      cap: Int = SimhashBandDfCap,
      nBands: Int = SimhashBands, cover: Int = 64): String =
    hammingPairsCtes(cap, nBands, cover) +
      hammingPairsSelect(maxHamming, nBands, cover) + "\nORDER BY doc_a, doc_b"

  /** One leg of the dedup recall report: found/exact pair relations
    * unioned with membership flags, folded to the five counters — the
    * literal SQL twin of the engine's union + (a,b)-keyed aggregate. */
  private def recallLegSql(name: String, aCol: String, bCol: String,
      foundSql: String, exactSql: String): String =
    s"""SELECT '$name' AS family,
       |  CAST(COALESCE(SUM(in_f), 0) AS BIGINT) AS found,
       |  CAST(COALESCE(SUM(in_x), 0) AS BIGINT) AS exact,
       |  CAST(COALESCE(SUM(in_f * in_x), 0) AS BIGINT) AS hits,
       |  CAST(CASE WHEN COALESCE(SUM(in_f), 0) = 0 THEN 10000
       |    ELSE (10000 * SUM(in_f * in_x)) // SUM(in_f) END AS BIGINT) AS precision_bp,
       |  CAST(CASE WHEN COALESCE(SUM(in_x), 0) = 0 THEN 10000
       |    ELSE (10000 * SUM(in_f * in_x)) // SUM(in_x) END AS BIGINT) AS recall_bp
       |FROM (
       |  SELECT a, b, MAX(in_f) AS in_f, MAX(in_x) AS in_x FROM (
       |    SELECT $aCol AS a, $bCol AS b, 1 AS in_f, 0 AS in_x FROM ($foundSql) ff
       |    UNION ALL
       |    SELECT $aCol AS a, $bCol AS b, 0 AS in_f, 1 AS in_x FROM ($exactSql) xx
       |  ) u GROUP BY a, b) g""".stripMargin

  /** Exact embedding near-dup relation at the production 0.8 threshold —
    * the emb_lsh_near_dup_hi oracle's pair set, shared by two legs. */
  private val EmbExact08Sql =
    """SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
      |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
      |WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.8""".stripMargin

  /** Oracle for [[dedupRecallReport]]: each leg's found/exact relations
    * are the families' own oracle texts (minhash = the full-corpus exact
    * Jaccard claim; emb legs = the exact 0.8 join; clustered = the Lloyd
    * replay's within-cluster pairs), so the report cannot fork from the
    * rows it audits. */
  private def dedupRecallReportSql: String = {
    val clusteredPairsSql =
      s"""WITH ${SimilarityOps.kmeansCtesSql()}
         |SELECT ma.vec_id AS vec_a, mb.vec_id AS vec_b
         |FROM afinal ma JOIN afinal mb
         |  ON ma.cluster = mb.cluster AND ma.vec_id < mb.vec_id
         |JOIN embeddings a ON a.vec_id = ma.vec_id
         |JOIN embeddings b ON b.vec_id = mb.vec_id
         |WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.8""".stripMargin
    Seq(
      recallLegSql("emb_lsh_near_dup_hi", "vec_a", "vec_b",
        EmbExact08Sql, EmbExact08Sql),
      recallLegSql("minhash_near_dup", "doc_a", "doc_b",
        jaccardSql("documents"), jaccardSql("documents")),
      recallLegSql("semdedup_clustered", "vec_a", "vec_b",
        clusteredPairsSql, EmbExact08Sql),
      recallLegSql("semdedup_clustered_047", "vec_a", "vec_b",
        clusteredPairsSql.replace(">= 0.8", ">= 0.47"),
        EmbExact08Sql.replace(">= 0.8", ">= 0.47")),
      recallLegSql("incr_semdedup_ann", "vec_a", "vec_b",
        SimilarityOps.incrSemAnnCrossPairsSql(
          SimilarityOps.IncrSemProdThetaMilli),
        SimilarityOps.incrSemExactCrossPairsSql(
          SimilarityOps.IncrSemProdThetaMilli)),
      recallLegSql("incr_semdedup_ann_047", "vec_a", "vec_b",
        SimilarityOps.incrSemAnnCrossPairsSql(
          SimilarityOps.IncrSemLiveThetaMilli),
        SimilarityOps.incrSemExactCrossPairsSql(
          SimilarityOps.IncrSemLiveThetaMilli)),
      recallLegSql("incr_semdedup_banded", "vec_a", "vec_b",
        SimilarityOps.incrSemBandedCrossPairsSql(
          SimilarityOps.IncrSemProdThetaMilli),
        SimilarityOps.incrSemExactCrossPairsSql(
          SimilarityOps.IncrSemProdThetaMilli)),
      recallLegSql("incr_semdedup_banded_047", "vec_a", "vec_b",
        SimilarityOps.incrSemBandedCrossPairsSql(
          SimilarityOps.IncrSemLiveThetaMilli),
        SimilarityOps.incrSemExactCrossPairsSql(
          SimilarityOps.IncrSemLiveThetaMilli)))
      .mkString("SELECT family, found, exact, hits, precision_bp, recall_bp FROM (\n",
        "\nUNION ALL\n", "\n) rr ORDER BY family")
  }

  /** Oracle for [[incrIngestDedupMulti]]: the single-step policy replay
    * CHAINED K times on the exact pair graph — per wave k, base-dup
    * check against base_{k−1}, in-wave closure over survivors, then
    * base_k = base_{k−1} ∪ kept_k feeds wave k+1 (the accept-then-grow
    * recurrence as literal CTEs, generated from the same K/mod
    * constants the engine reads). */
  private def incrMultiOracleSql: String = {
    val m = IncrIngestMod
    val mod = m * IncrMultiK
    val steps = (1 to IncrMultiK).map { k =>
      val r = m * k - 1
      val prev = s"base${k - 1}"
      s"""basedup$k AS MATERIALIZED (
         |  SELECT i AS doc_id, MIN(b) AS dup_of FROM (
         |    SELECT jp.doc_a AS i, jp.doc_b AS b FROM jp
         |    JOIN $prev bb ON bb.doc_id = jp.doc_b
         |    WHERE jp.doc_a % $mod = $r
         |    UNION ALL
         |    SELECT jp.doc_b AS i, jp.doc_a AS b FROM jp
         |    JOIN $prev bb ON bb.doc_id = jp.doc_a
         |    WHERE jp.doc_b % $mod = $r
         |  ) u GROUP BY i
         |), surv$k AS MATERIALIZED (
         |  SELECT doc_id FROM documents WHERE doc_id % $mod = $r
         |    AND doc_id NOT IN (SELECT doc_id FROM basedup$k)
         |), ip$k AS MATERIALIZED (
         |  SELECT doc_a, doc_b FROM jp
         |  WHERE doc_a IN (SELECT doc_id FROM surv$k)
         |    AND doc_b IN (SELECT doc_id FROM surv$k)
         |), edges$k AS MATERIALIZED (
         |  SELECT doc_a AS src, doc_b AS dst FROM ip$k
         |  UNION ALL SELECT doc_b, doc_a FROM ip$k
         |), reach$k AS (
         |  SELECT src, dst FROM edges$k
         |  UNION
         |  SELECT r.src, e.dst FROM reach$k r JOIN edges$k e ON r.dst = e.src
         |), batchdup$k AS MATERIALIZED (
         |  SELECT src AS doc_id, MIN(dst) AS dup_of FROM reach$k
         |  GROUP BY src HAVING MIN(dst) < src
         |), base$k AS MATERIALIZED (
         |  SELECT doc_id FROM $prev
         |  UNION ALL
         |  SELECT doc_id FROM surv$k
         |  WHERE doc_id NOT IN (SELECT doc_id FROM batchdup$k)
         |)""".stripMargin
    }
    val finals = (1 to IncrMultiK).map { k =>
      val r = m * k - 1
      s"""SELECT d.doc_id, CAST($k AS BIGINT) AS batch_k,
         |  CASE WHEN bd.dup_of IS NOT NULL THEN 'dropped_base'
         |       WHEN iu.dup_of IS NOT NULL THEN 'dropped_batch'
         |       ELSE 'kept' END AS status,
         |  COALESCE(bd.dup_of, iu.dup_of) AS dup_of
         |FROM documents d
         |LEFT JOIN basedup$k bd ON bd.doc_id = d.doc_id
         |LEFT JOIN batchdup$k iu ON iu.doc_id = d.doc_id
         |WHERE d.doc_id % $mod = $r""".stripMargin
    }
    shingleCteFrom("documents").replaceFirst("WITH ", "WITH RECURSIVE ") +
      s""", sx AS (
         |  SELECT doc_id, len(sh) AS nsh, unnest(sh) AS g FROM s
         |), jp AS MATERIALIZED (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM sx a JOIN sx b ON a.g = b.g AND a.doc_id < b.doc_id
         |  GROUP BY a.doc_id, b.doc_id, a.nsh, b.nsh
         |  HAVING CAST(COUNT(*) AS DOUBLE) / (a.nsh + b.nsh - COUNT(*)) >= 0.6
         |), base0 AS MATERIALIZED (
         |  SELECT doc_id FROM documents WHERE doc_id % $m <> ${m - 1}
         |), """.stripMargin +
      steps.mkString(",\n") +
      "\nSELECT doc_id, batch_k, status, dup_of FROM (\n" +
      finals.mkString("\nUNION ALL\n") +
      "\n) v ORDER BY doc_id"
  }

  /** The incremental-ingest policy replay on the exact pair graph —
    * shared VERBATIM by the in-session row (incr_ingest_dedup) and
    * the artifact-served row (incr_ingest_dedup_served). */
  private def incrIngestOracleSql: String = (shingleCteFrom("documents")
      .replaceFirst("WITH ", "WITH RECURSIVE ") +
      s""", sx AS (
         |  SELECT doc_id, len(sh) AS nsh, unnest(sh) AS g FROM s
         |), jp AS MATERIALIZED (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM sx a JOIN sx b ON a.g = b.g AND a.doc_id < b.doc_id
         |  GROUP BY a.doc_id, b.doc_id, a.nsh, b.nsh
         |  HAVING CAST(COUNT(*) AS DOUBLE) / (a.nsh + b.nsh - COUNT(*)) >= 0.6
         |), basedup AS (
         |  SELECT i AS doc_id, MIN(b) AS base_dup_of FROM (
         |    SELECT doc_a AS i, doc_b AS b FROM jp
         |    WHERE doc_a % $IncrIngestMod = ${IncrIngestMod - 1}
         |      AND doc_b % $IncrIngestMod <> ${IncrIngestMod - 1}
         |    UNION ALL
         |    SELECT doc_b AS i, doc_a AS b FROM jp
         |    WHERE doc_b % $IncrIngestMod = ${IncrIngestMod - 1}
         |      AND doc_a % $IncrIngestMod <> ${IncrIngestMod - 1}
         |  ) GROUP BY i
         |), ip AS MATERIALIZED (
         |  SELECT doc_a, doc_b FROM jp
         |  WHERE doc_a % $IncrIngestMod = ${IncrIngestMod - 1}
         |    AND doc_b % $IncrIngestMod = ${IncrIngestMod - 1}
         |    AND doc_a NOT IN (SELECT doc_id FROM basedup)
         |    AND doc_b NOT IN (SELECT doc_id FROM basedup)
         |), edges AS MATERIALIZED (
         |  SELECT doc_a AS src, doc_b AS dst FROM ip
         |  UNION ALL SELECT doc_b, doc_a FROM ip
         |), reach AS (
         |  SELECT src, dst FROM edges
         |  UNION
         |  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
         |), batchdup AS (
         |  SELECT src AS doc_id, MIN(dst) AS batch_dup_of FROM reach
         |  GROUP BY src HAVING MIN(dst) < src
         |)
         |SELECT d.doc_id,
         |  CASE WHEN bd.base_dup_of IS NOT NULL THEN 'dropped_base'
         |       WHEN iu.batch_dup_of IS NOT NULL THEN 'dropped_batch'
         |       ELSE 'kept' END AS status,
         |  COALESCE(bd.base_dup_of, iu.batch_dup_of) AS dup_of
         |FROM documents d
         |LEFT JOIN basedup bd ON bd.doc_id = d.doc_id
         |LEFT JOIN batchdup iu ON iu.doc_id = d.doc_id
         |WHERE d.doc_id % $IncrIngestMod = ${IncrIngestMod - 1}
         |ORDER BY d.doc_id""".stripMargin)

  val oracles: Map[String, String] = Map(
    "dedup_recall_report" -> dedupRecallReportSql,
    "incr_ingest_dedup_multi" -> incrMultiOracleSql,
    "doc_simhash" -> (simhashCte +
      "SELECT doc_id, simhash FROM sh ORDER BY doc_id"),
    // the guard replay (dfc/bs) is inert wherever band dfs stay under
    // the cap (shard ≡ 0 and the first-band gate ≡ DISTINCT over the
    // plain band join); on twin-heavy corpora (the sf1 tree:
    // token-permuted copies share signatures, simhash being
    // order-invariant) it reproduces subSaltHotKeys' exact sharding AND
    // the engine's gate semantics under it — a pair whose first
    // bits-agreeing band was sharded apart is dropped, the documented
    // cap trade — so the row stays hash-green THROUGH the guard regime
    "simhash_near_dup" -> (simhashCte + hammingPairsSql()),
    "doc_dedup_exact" ->
      s"""SELECT md5(regexp_replace(lower(trim(text)), '${TextOps.WsRunRe}', ' ', 'g')) AS content_hash,
         |  COUNT(*) AS n_copies, MIN(doc_id) AS keeper_doc_id
         |FROM documents GROUP BY 1 ORDER BY keeper_doc_id""".stripMargin,
    "jaccard_pairs" -> jaccardSql(
      s"(SELECT * FROM documents WHERE doc_id < $ExactBaselineMaxDocId) dd"),
    // LSH + exact verification must reproduce the exact all-pairs result
    // over the FULL corpus (the whole point of the banded path):
    "minhash_near_dup" -> jaccardSql("documents"),
    // fuzzy decontamination: the oracle is the EXACT cross-slice Jaccard
    // join (no LSH machinery) — banding + verify must reproduce it, the
    // same independence argument as minhash_near_dup's oracle
    "decontam_neardup" -> (shingleCteFrom("documents") +
      s""", sx AS (
        |  SELECT doc_id, len(sh) AS nsh, unnest(sh) AS g FROM s
        |)
        |SELECT a.doc_id AS doc_id, b.doc_id AS bench_doc_id,
        |  CAST(COUNT(*) AS DOUBLE) / (a.nsh + b.nsh - COUNT(*)) AS jaccard
        |FROM sx a JOIN sx b ON a.g = b.g
        |  AND a.doc_id % $DecontamBenchMod <> 0 AND b.doc_id % $DecontamBenchMod = 0
        |GROUP BY a.doc_id, b.doc_id, a.nsh, b.nsh
        |HAVING CAST(COUNT(*) AS DOUBLE) / (a.nsh + b.nsh - COUNT(*)) >= 0.6
        |ORDER BY doc_id, bench_doc_id""".stripMargin),
    // components via transitive closure (recursive CTE) over the same
    // exact-Jaccard pair graph the banded path reproduces:
    "dedup_clusters" -> (clustersCte +
      "SELECT doc_id, cluster_id FROM clusters ORDER BY doc_id"),
    // incremental ingest: the oracle replays the POLICY (base check
    // first, then in-batch closure over survivors) on the exact pair
    // graph — banding + verify must reproduce that graph, the same
    // independence argument as minhash_near_dup's oracle
    "incr_ingest_dedup" -> incrIngestOracleSql,
    // the SERVED row verdicts the same batch against the same policy
    // from the READ-BACK artifact — oracle text shared VERBATIM (the
    // no-fork rule): the artifact boundary must be invisible to the
    // result
    "incr_ingest_dedup_served" -> incrIngestOracleSql,
    // cluster-granular split: every member inherits its representative's
    // content-hash split (same salt+cut as the train_test_split oracle)
    "train_test_split_neardup" -> (clustersCte +
      s""", rep AS (
         |  SELECT doc_id AS cluster_id,
         |    CASE WHEN substr(md5('graft' || regexp_replace(lower(trim(text)), '${TextOps.WsRunRe}', ' ', 'g')), 1, 2) < '19'
         |         THEN 'test' ELSE 'train' END AS split
         |  FROM documents
         |)
         |SELECT c.doc_id, c.cluster_id, r.split
         |FROM clusters c JOIN rep r ON r.cluster_id = c.cluster_id
         |ORDER BY c.doc_id""".stripMargin),
    "pagerank_near_dup" -> pagerankOracleSql(),
    // DuckDB levenshtein is the same unit-cost DP; the block key and the
    // integer threshold are replayed from the shared constants
    "fuzzy_match" ->
      s"""WITH $FuzzyKeyCtes, k AS (
         |  SELECT * FROM d
         |  QUALIFY COUNT(*) OVER (PARTITION BY blk) <= $FuzzyBlockCap
         |)
         |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |  CAST(levenshtein(a.text, b.text) AS BIGINT) AS dist
         |FROM k a JOIN k b ON a.blk = b.blk AND a.doc_id < b.doc_id
         |WHERE levenshtein(a.text, b.text) * 100
         |      <= $FuzzyMaxDistPct * greatest(length(a.text), length(b.text))
         |ORDER BY doc_a, doc_b""".stripMargin,
    // same two-phase key + cap, aggregated: the blocks the cap drops
    "fuzzy_dropped_blocks" ->
      s"""WITH $FuzzyKeyCtes, g AS (
         |  SELECT blk, COUNT(*) AS bn FROM d WHERE blk IS NOT NULL
         |  GROUP BY blk HAVING COUNT(*) > $FuzzyBlockCap
         |)
         |SELECT CAST(COUNT(*) AS BIGINT) AS n_dropped_blocks,
         |  CAST(COALESCE(SUM(bn), 0) AS BIGINT) AS n_dropped_docs
         |FROM g""".stripMargin,
    // keeper = argmax quality per component (quality formula identical to
    // the text_quality oracle — exact integer ratios, so scores and
    // therefore the argmax agree bit-for-bit):
    "cluster_keepers" -> (clustersCte +
      """, q AS (
        |  SELECT doc_id,
        |    (CASE WHEN len(toks) BETWEEN 5 AND 100000 THEN 1.0 ELSE 0.0 END)
        |      * (CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS DOUBLE) / length(text)
        |         + CAST(len(list_filter(toks, t -> t IN ('the','a','of','and','to','in','is','it','on','for'))) AS DOUBLE) / len(toks)
        |         + CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks)) / 3.0 AS quality_score
        |  FROM (SELECT doc_id, text,
        |          list_filter(string_split(trim(text), ' '), t -> t <> '') AS toks
        |        FROM documents) d
        |), ranked AS (
        |  SELECT c.cluster_id, c.doc_id, q.quality_score,
        |    ROW_NUMBER() OVER (PARTITION BY c.cluster_id
        |      ORDER BY q.quality_score DESC, c.doc_id) AS rk
        |  FROM clusters c JOIN q ON c.doc_id = q.doc_id)
        |SELECT cluster_id,
        |  MIN(CASE WHEN rk = 1 THEN doc_id END) AS keeper_doc_id,
        |  COUNT(*) AS n_members,
        |  MAX(CASE WHEN rk = 1 THEN quality_score END) AS keeper_quality
        |FROM ranked GROUP BY cluster_id ORDER BY cluster_id""".stripMargin),
  )

  /** Shingles → exact-Jaccard pairs → transitive closure → per-doc
    * cluster_id, as a reusable WITH-prefix for DuckDB oracles. */
  private def clustersCteFrom(from: String): String = (shingleCteFrom(from)
    .replaceFirst("WITH ", "WITH RECURSIVE ") +
    s""", sx AS (
      |  SELECT doc_id, len(sh) AS nsh, unnest(sh) AS g FROM s
      |), pairs AS MATERIALIZED (
      |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
      |  FROM sx a JOIN sx b ON a.g = b.g AND a.doc_id < b.doc_id
      |  GROUP BY a.doc_id, b.doc_id, a.nsh, b.nsh
      |  HAVING CAST(COUNT(*) AS DOUBLE) / (a.nsh + b.nsh - COUNT(*)) >= 0.6
      |), edges AS MATERIALIZED (
      |  SELECT doc_a AS src, doc_b AS dst FROM pairs
      |  UNION ALL SELECT doc_b, doc_a FROM pairs
      |), reach AS (
      |  SELECT src, dst FROM edges
      |  UNION
      |  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
      |), clusters AS (
      |  SELECT d.doc_id,
      |    LEAST(d.doc_id, COALESCE(MIN(r.dst), d.doc_id)) AS cluster_id
      |  FROM $from d LEFT JOIN reach r ON r.src = d.doc_id
      |  GROUP BY d.doc_id
      |)
      |""".stripMargin)

  private def clustersCte: String = clustersCteFrom("documents")

  /** Complete cluster-table replay over an arbitrary FROM source — the
    * staged-curation oracle re-scopes the SAME recursive-closure CTE
    * chain as `dedup_clusters` to the quality-survivor set (the no-fork
    * discipline: one definition, re-scoped, never re-derived). */
  private[graft] def clustersOracleFrom(from: String): String =
    clustersCteFrom(from) +
      "SELECT doc_id, cluster_id FROM clusters ORDER BY doc_id"
}
