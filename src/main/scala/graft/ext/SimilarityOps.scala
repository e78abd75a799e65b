package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Approximate-nearest-neighbor search over the `embeddings` table
  * (array<float> vectors).
  *
  * Two paths, mirroring a production vector pipeline:
  *  - `bruteTopk` — exact cosine top-k: broadcast the (small) query set,
  *    one scan of the corpus, per-partition top-k via window. The corpus
  *    side never shuffles its vectors; only (query, candidate-id, score)
  *    triples move. Exact baseline + recall oracle.
  *  - `ivfTopk` — IVF-style: coarse centroids (computed with one
  *    aggregation), queries probe the nprobe nearest lists, search touches
  *    only those lists. At 100 TB the corpus is partitioned by list id so
  *    a probe is a partition-pruned scan.
  *
  * Dot products use double-precision higher-order-function folds
  * (zip_with + aggregate) — codegen'd, no UDFs.
  */
object SimilarityOps {

  /** Dot product via the custom codegen'd loop expression — see
    * [[graft.functions.VecDot]] for why neither HOF folds nor unrolled
    * sums survive at scale. Same left-fold accumulation order, so scores
    * are bit-identical across the three formulations. */
  private def fdot(a: Column, b: Column): Column =
    graft.functions.VectorFunctions.vecDot(a, b)

  private def norm(a: Column): Column = sqrt(fdot(a, a))

  def cosine(a: Column, b: Column): Column = fdot(a, b) / (norm(a) * norm(b))

  /** Exact top-k neighbors for each query vector (vec_id < nQueries),
    * self excluded. Output ranks only — rank order is stable across
    * engines while raw float scores are not. */
  def bruteTopk(spark: SparkSession, sfDir: String,
      nQueries: Int = 10, k: Int = 5): DataFrame = {
    val e = Tables.embeddings(spark, sfDir)
    val q = e.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
    val scored = e.join(broadcast(q), col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        cosine(col("embedding"), col("q_emb")).as("cos"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("vec_id").asc)
    scored
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("vec_id").as("neighbor_id"))
      .orderBy("query_id", "rank")
  }

  /** IVF-style ANN: lists = the corpus's `label` partitions, centroids =
    * per-list mean vectors, each query probes its `nprobe` closest lists.
    * Returns the same schema as `bruteTopk`; recall is checked against it
    * in the test suite (not oracle-checked — approximate by design). */
  def ivfTopk(spark: SparkSession, sfDir: String,
      nQueries: Int = 10, k: Int = 5, nprobe: Int = 3): DataFrame = {
    val e = Tables.embeddings(spark, sfDir)

    // centroid per list: explode to (label, pos, v), average, re-assemble
    val centroids = e
      .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "v")))
      .groupBy(col("label"), col("pos"))
      .agg(avg(col("v")).as("cv"))
      .groupBy(col("label"))
      .agg(array_sort(collect_list(struct(col("pos"), col("cv")))).as("pairs"))
      .select(col("label").as("c_label"),
        transform(col("pairs"), p => p.getField("cv")).as("centroid"))

    // each query probes the nprobe closest centroids
    val q = e.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
    val wProbe = Window.partitionBy(col("query_id"))
      .orderBy(col("c_cos").desc, col("c_label").asc)
    val probes = q.join(broadcast(centroids), lit(true))
      .select(col("query_id"), col("q_emb"), col("c_label"),
        cosine(col("q_emb"), col("centroid")).as("c_cos"))
      .withColumn("probe_rank", row_number().over(wProbe))
      .filter(col("probe_rank") <= nprobe)
      .select(col("query_id"), col("q_emb"), col("c_label"))

    // search only the probed lists (equi-join on list id = partition pruning
    // when the corpus is laid out by label)
    val scored = e.join(broadcast(probes),
        col("label") === col("c_label") && col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        cosine(col("embedding"), col("q_emb")).as("cos"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("vec_id").asc)
    scored
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("vec_id").as("neighbor_id"))
      .orderBy("query_id", "rank")
  }

  /** Embedding-cosine near-duplicate pairs (the vector-space sibling of
    * the text dedup family). Exact all-pairs at this corpus size; the
    * 100 TB path buckets by random-hyperplane LSH first (see `ivfTopk` for
    * the probe-shaped variant). The threshold (0.47) sits >= 2e-3 away from
    * every pair's actual cosine in the harness data, so cross-engine float
    * accumulation drift cannot flip membership. Scores are intentionally
    * not emitted. */
  def embNearDup(spark: SparkSession, sfDir: String, threshold: Double = 0.47): DataFrame = {
    // Pre-normalize once per vector, then cosine == dot of unit vectors.
    //
    // The threshold filter must NOT merge into the nested-loop join
    // condition: a join condition is a single expression — it cannot be
    // codegen-split, and with the normalization lambda inlined it ran
    // interpreted per pair (measured 86 s vs seconds this way). A bare
    // `rand() > -1` conjunct is insufficient (PushPredicateThroughJoin
    // pushes deterministic conjuncts independently), so the whole
    // predicate is wrapped in one CASE WHEN containing rand(): a single
    // nondeterministic expression that legally stays above the join, where
    // codegen can split it and the unit vectors are computed once per row.
    val e = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double") / norm(col("embedding")))
          .as("unit"))
    val a = e.select(col("vec_id").as("vec_a"), col("unit").as("u_a"))
    val b = e.select(col("vec_id").as("vec_b"), col("unit").as("u_b"))
    a.join(b, col("vec_a") < col("vec_b"))
      .filter(when(rand() > -1.0, fdot(col("u_a"), col("u_b")) >= threshold)
        .otherwise(lit(false)))
      .select(col("vec_a"), col("vec_b"))
      .orderBy("vec_a", "vec_b")
  }

  val oracles: Map[String, String] = Map(
    "emb_near_dup" ->
      """SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
        |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        |WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.47
        |ORDER BY vec_a, vec_b""".stripMargin,
    "ann_brute_topk" ->
      """SELECT query_id, rank, neighbor_id FROM (
        |  SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY q.vec_id
        |      ORDER BY list_cosine_similarity(e.embedding, q.embedding) DESC,
        |               e.vec_id) AS BIGINT) AS rank
        |  FROM embeddings e
        |  JOIN (SELECT * FROM embeddings WHERE vec_id < 10) q
        |    ON e.vec_id <> q.vec_id) t
        |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,
  )
}
