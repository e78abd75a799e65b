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

  private def withShingles(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .withColumn("sh", shingleExpr)
      .select(col("doc_id"), col("sh"))

  /** Exact dedup by content hash (whitespace-normalized, lowercased):
    * keeper = min doc_id per group. One shuffle on the 128-bit hash. */
  def exactDedup(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .groupBy(md5(regexp_replace(lower(trim(col("text"))), "\\s+", " ")).as("content_hash"))
      .agg(count(lit(1)).as("n_copies"), min(col("doc_id")).as("keeper_doc_id"))
      .orderBy("keeper_doc_id")

  private def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") / size(array_union(a, b))

  /** EXACT all-pairs n-gram Jaccard >= 0.6 — the quadratic ground truth
    * that the LSH path must reproduce. Kept deliberately as the verifier
    * for `minhash_near_dup`; not a 100 TB plan. */
  def jaccardPairs(spark: SparkSession, sfDir: String): DataFrame = {
    // docs with < 3 tokens have no shingles: they cannot near-dup anything,
    // and an empty-vs-empty pair would be a 0/0 division
    val s = withShingles(spark, sfDir).filter(size(col("sh")) > 0)
    val a = s.select(col("doc_id").as("doc_a"), col("sh").as("sh_a"))
    val b = s.select(col("doc_id").as("doc_b"), col("sh").as("sh_b"))
    a.join(b, col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"), jaccard(col("sh_a"), col("sh_b")).as("jaccard"))
      .filter(col("jaccard") >= 0.6)
      .orderBy("doc_a", "doc_b")
  }

  private val NumPerms = 128
  private val Bands = 32
  private val RowsPerBand = NumPerms / Bands // 4
  // Affine permutations h -> (a*h + b) mod p over a 31-bit Mersenne prime;
  // coefficients are fixed odd constants so signatures are deterministic.
  private val P = 2147483647L

  /** 128-perm MinHash signature as an array<long> column (input: distinct
    * shingle array). Base hash once per shingle, then cheap affine perms. */
  private def minhashSig(sh: Column): Column = {
    val base = transform(sh, s => pmod(xxhash64(s), lit(P)))
    val perms = (0 until NumPerms).map { i =>
      val a = 2L * i + 1
      val b = 104729L * (i + 1) % P
      array_min(transform(base, h => (h * a + b) % P))
    }
    array(perms: _*)
  }

  /** MinHash + LSH near-duplicate detection with exact verification —
    * result set identical to `jaccardPairs` whenever banding recall holds
    * (with 32 bands of 4 rows, recall at j=0.6 is ~0.99 and at the
    * planted-duplicate level j>=0.9 is ~1.0).
    *
    * Plan shape: scan → signature (no shuffle) → explode 32 band keys →
    * hash join on (band, key) → distinct candidate pairs → join back to
    * shingles → exact Jaccard filter. At 100 TB the only shuffles are the
    * band-key join and the candidate join — both equi-joins. */
  def minhashNearDup(spark: SparkSession, sfDir: String): DataFrame = {
    val s = withShingles(spark, sfDir).filter(size(col("sh")) > 0)
    val sig = s.select(col("doc_id"), minhashSig(col("sh")).as("sig"))
    val bands = sig.select(col("doc_id"),
      posexplode(transform(sequence(lit(0), lit(Bands - 1)), b =>
        hash(slice(col("sig"), b * RowsPerBand + 1, lit(RowsPerBand)), b))))
      .select(col("doc_id"), col("pos").as("band"), col("col").as("band_key"))
    val cand = bands.as("x").join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.band_key") === col("y.band_key") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()
    cand
      .join(s.select(col("doc_id").as("doc_a"), col("sh").as("sh_a")), "doc_a")
      .join(s.select(col("doc_id").as("doc_b"), col("sh").as("sh_b")), "doc_b")
      .select(col("doc_a"), col("doc_b"), jaccard(col("sh_a"), col("sh_b")).as("jaccard"))
      .filter(col("jaccard") >= 0.6)
      .orderBy("doc_a", "doc_b")
  }

  /** 64-bit SimHash per document, computed in one shuffle-free projection
    * (nested higher-order functions; at larger docs the same expression
    * vectorizes per row). Output is the signature itself — pairing is done
    * by `simhashNearDup`. */
  def simhash(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .select(col("doc_id"), expr(
        """aggregate(sequence(0, 63), 0L, (acc, j) ->
          |  acc + CASE WHEN aggregate(transform(toks, t -> xxhash64(t)), 0L,
          |    (s, h) -> s + CASE WHEN (shiftrightunsigned(h, j) & 1) = 1
          |                       THEN 1 ELSE -1 END) >= 0
          |    THEN shiftleft(1L, j) ELSE 0L END)""".stripMargin).as("simhash"))
      .orderBy("doc_id")

  /** SimHash near-dup pairs: XOR popcount <= maxHamming over signatures.
    * The pairing here is all-pairs on 64-bit longs (cheap at this n); the
    * scale path blocks on signature prefixes exactly like LSH banding. */
  def simhashNearDup(spark: SparkSession, sfDir: String, maxHamming: Int = 8): DataFrame = {
    val s = simhash(spark, sfDir)
    val a = s.select(col("doc_id").as("doc_a"), col("simhash").as("h_a"))
    val b = s.select(col("doc_id").as("doc_b"), col("simhash").as("h_b"))
    a.join(b, col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        bit_count(col("h_a").bitwiseXOR(col("h_b"))).cast("long").as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .orderBy("doc_a", "doc_b")
  }

  /** The shared shingle CTE for DuckDB oracles. */
  private val shingleCte =
    """WITH t AS (
      |  SELECT doc_id, list_filter(string_split(trim(text), ' '), x -> x <> '') AS toks
      |  FROM documents
      |), s AS (
      |  SELECT doc_id, CASE WHEN len(toks) < 3 THEN []
      |    ELSE list_distinct([toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
      |                        for i in range(1, len(toks) - 1)]) END AS sh
      |  FROM t
      |)
      |""".stripMargin

  private val jaccardSql = shingleCte +
    """SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
      |  CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
      |    / len(list_distinct(list_concat(a.sh, b.sh))) AS jaccard
      |FROM s a JOIN s b ON a.doc_id < b.doc_id
      |WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
      |    / len(list_distinct(list_concat(a.sh, b.sh))) >= 0.6
      |ORDER BY doc_a, doc_b""".stripMargin

  val oracles: Map[String, String] = Map(
    "doc_dedup_exact" ->
      """SELECT md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS content_hash,
        |  COUNT(*) AS n_copies, MIN(doc_id) AS keeper_doc_id
        |FROM documents GROUP BY 1 ORDER BY keeper_doc_id""".stripMargin,
    "jaccard_pairs" -> jaccardSql,
    // LSH + exact verification must reproduce the exact all-pairs result:
    "minhash_near_dup" -> jaccardSql,
  )
}
