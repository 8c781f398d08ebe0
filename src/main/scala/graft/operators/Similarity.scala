package graft.operators

import graft.{QueryDef, Tables}
import graft.functions.VectorFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Vector-similarity operators over the `embeddings` fixture
  * (north-star set: brute-force cosine top-k as the baseline, LSH-bucketed
  * search as the 100 TB scale path).
  *
  * Spark side computes cosine through [[graft.functions.CosineSimilarity]] —
  * a codegen'd Catalyst expression (fused dot/norm loop) — registered as
  * `cosine_sim`. The DuckDB oracle mirrors the same arithmetic
  * (left-to-right double accumulation), with outputs rounded to 6 decimals.
  *
  * Scale notes:
  *   - top-k vs one query vector is a map + TakeOrderedAndProject: no
  *     shuffle of the corpus, only k rows to the driver per partition;
  *   - LSH bucketing (8 fixed hyperplanes -> 256 buckets) cuts candidate
  *     scans ~256x; buckets are a plain groupBy/equi-join key so the whole
  *     pipeline shuffles once on a byte-sized key;
  *   - the hyperplane constants are literals baked into BOTH engines from
  *     one deterministic generator, so plans constant-fold them.
  */
object Similarity {

  /** 8 fixed hyperplanes x 64 dims, deterministic LCG, 6-decimal literals
    * (decimal literals parse to identical doubles in both engines).
    */
  val planes: Seq[Seq[Double]] = {
    var state = 42L
    def next(): Double = {
      state = state * 6364136223846793005L + 1442695040888963407L
      math.rint((((state >>> 33).toDouble / (1L << 31).toDouble) - 0.5) * 1e6) / 1e6
    }
    Seq.fill(8)(Seq.fill(64)(next()))
  }

  private def planeLits(p: Seq[Double]): String = p.mkString(", ")

  /** Spark SQL: dot(embedding, plane_i) via zip_with/aggregate (constant
    * array folds into codegen).
    */
  private def dotPlaneSpark(i: Int): String =
    s"aggregate(zip_with(embedding, array(${planeLits(planes(i))}), (x, y) -> cast(x as double) * y), cast(0 as double), (acc, v) -> acc + v)"

  /** DuckDB: same dot product over the literal list. */
  private def dotPlaneDuck(i: Int): String =
    s"list_aggregate(list_transform(generate_series(1, len(embedding)), k -> cast(embedding[k] as double) * ([${planeLits(planes(i))}])[k]), 'sum')"

  private def bucketSpark: String =
    (0 until planes.size).map(i => s"case when ${dotPlaneSpark(i)} > 0 then ${1 << i} else 0 end").mkString("cast(", " + ", " as bigint)")

  private def bucketDuck: String =
    (0 until planes.size).map(i => s"case when ${dotPlaneDuck(i)} > 0 then ${1 << i} else 0 end").mkString("cast(", " + ", " as bigint)")

  /** DuckDB cosine between two list cols (cast-to-double, order-stable).
    * Each dot product iterates min(len(x), len(y)) of ITS OWN operands,
    * matching CosineSimilarity's truncate-to-min semantics for (hypothetical)
    * unequal-length vectors.
    */
  private def cosDuck(a: String, b: String): String = {
    def dot(x: String, y: String) =
      s"list_aggregate(list_transform(generate_series(1, least(len($x), len($y))), k -> cast($x[k] as double) * cast($y[k] as double)), 'sum')"
    s"(${dot(a, b)} / (sqrt(${dot(a, a)}) * sqrt(${dot(b, b)})))"
  }

  /** (Multi-probe) LSH ANN probe over any frame with (vec_id, embedding):
    * candidates are vectors in the query's sign-bucket or any bucket within
    * `maxHamming` flipped sign bits (radius 0 = 1 bucket ~ 1/256 of the
    * corpus; radius 1 = 9 buckets ~ 9/256 — the standard recall lever,
    * mirroring IVF's nprobe). Scoring within candidates is EXACT cosine, so
    * the probe returns the true top-k of its candidate set (pinned by
    * SimilarityRecallSpec).
    *
    * Scale shape: the probe BUCKETS are enumerated on the 1-row query side
    * (query bucket XOR each single-bit flip) and broadcast into an
    * equi-join on the bucket key — against a bucket-partitioned corpus
    * layout this prunes to the probed buckets, where a
    * `bit_count(bucket ^ q_bucket) <= r` filter would scan every row. Radius
    * is capped at 1 because radius-2 enumeration (37 buckets here) belongs
    * to a banded-signature design, not more XOR terms.
    */
  def lshProbe(emb: DataFrame, queryVecId: Long, maxHamming: Int = 0, k: Int = 5): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 1, "supported probe radius: 0 or 1")
    VectorFunctions.register(emb.sparkSession)
    val withBucket = emb.withColumn("bucket", expr(bucketSpark))
    val q = withBucket
      .filter(col("vec_id") === queryVecId)
      .select(col("embedding").as("q_emb"), col("bucket").as("q_bucket"))
    val flips = lit(0L) +: (if (maxHamming >= 1) planes.indices.map(i => lit(1L << i)) else Nil)
    val probes = q.select(
      col("q_emb"),
      col("q_bucket"),
      explode(array(flips: _*)).as("flip")
    ).select(col("q_emb"), col("q_bucket").bitwiseXOR(col("flip")).as("probe_bucket"))
    withBucket
      .join(broadcast(probes), col("bucket") === col("probe_bucket"))
      .filter(col("vec_id") =!= queryVecId)
      .select(
        col("vec_id"),
        col("bucket"),
        round(expr("cosine_sim(embedding, q_emb)"), 6).as("cos_sim")
      )
      .orderBy(col("cos_sim").desc, col("vec_id"))
      .limit(k)
  }

  /** Batched k-NN JOIN: every query vector gets its top-k cosine neighbors
    * from the corpus — the retrieval-eval / dedup-against-another-dataset
    * shape, where [[lshProbe]] is the single-query special case. Blocking
    * is the same multi-probe LSH (each query's probe bucket ids enumerated
    * and broadcast into an equi-join on the bucket key), and the per-query
    * top-k runs as the [[graft.functions.TopK]] typed AGGREGATE: map tasks
    * keep at most k candidates per query, the shuffle carries
    * O(queries x k x partitions) — a `row_number()` window would shuffle
    * and sort EVERY candidate pair. Scores are rounded to 6 decimals
    * BEFORE ranking so the ordering is reproducible across engines.
    *
    * Expects both frames to carry (vec_id, embedding); distinct probe
    * flips yield distinct buckets, so a corpus vector pairs with a given
    * query at most once (no candidate dedup step needed).
    *
    * `broadcastProbes = true` (default) hints the probe side broadcast —
    * the common eval/dedup shape (queries << corpus, q x 9 rows). A query
    * set too large to broadcast (dedup of one large corpus against
    * another) MUST pass `broadcastProbes = false`: the join runs unhinted
    * on the bucket key, both sides shuffle on the byte-sized key and AQE
    * picks the strategy from runtime sizes — rather than forcing a
    * driver/executor-OOM broadcast. The unhinted plan shape (no
    * BroadcastExchange when the threshold rules it out) is pinned in
    * PlanSpec.
    */
  def knnJoin(
      queries: DataFrame,
      corpus: DataFrame,
      k: Int,
      maxHamming: Int = 1,
      broadcastProbes: Boolean = true
  ): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 1, "supported probe radius: 0 or 1")
    val s = queries.sparkSession
    VectorFunctions.register(s)
    val fn = graft.functions.TopK.register(s, k)
    val flips = lit(0L) +: (if (maxHamming >= 1) planes.indices.map(i => lit(1L << i)) else Nil)
    val probes = queries
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"), expr(bucketSpark).as("q_bucket"))
      .select(col("q_id"), col("q_emb"), col("q_bucket"), explode(array(flips: _*)).as("flip"))
      .select(col("q_id"), col("q_emb"), col("q_bucket").bitwiseXOR(col("flip")).as("probe_bucket"))
    val probeSide = if (broadcastProbes) broadcast(probes) else probes
    corpus
      .withColumn("bucket", expr(bucketSpark))
      .join(probeSide, col("bucket") === col("probe_bucket"))
      .select(
        col("q_id"),
        col("vec_id"),
        round(expr("cosine_sim(embedding, q_emb)"), 6).as("cos_sim")
      )
      .groupBy(col("q_id"))
      .agg(expr(s"$fn(cos_sim, vec_id)").as("top"))
      .select(col("q_id"), posexplode(col("top")).as(Seq("i", "s")))
      .select(
        col("q_id"),
        (col("i") + 1).cast("long").as("rank"),
        col("s.key").as("vec_id"),
        col("s.score").as("cos_sim")
      )
      .orderBy(col("q_id"), col("rank"))
  }

  /** Embedding-cosine near-dup PAIR GENERATOR (the q_dedup_embed body,
    * extracted so the planted-pair spec can drive it directly): candidates
    * must share (label, LSH bucket), so the self-join cost is sum(block^2)
    * over small blocks, never corpus x corpus; scoring within a block is
    * exact cosine, thresholded at `threshold`. `vec_a < vec_b` emits each
    * unordered pair once. A genuine near-duplicate (cos -> 1) flips sign
    * bits with probability theta/pi per plane, so it lands in its twin's
    * bucket with high probability — the same planted-recovery guarantee
    * SimilarityRecallSpec pins for the probe paths, pinned for THIS join in
    * the planted-pair spec (round-7 finding #3: an sf-gate 0=0 match would
    * otherwise hide a broken join predicate).
    */
  def embedNearDupPairs(emb: DataFrame, threshold: Double = 0.85): DataFrame = {
    VectorFunctions.register(emb.sparkSession)
    val withBucket =
      emb.select(col("vec_id"), col("label"), col("embedding"), expr(bucketSpark).as("bucket"))
    val a = withBucket.alias("a")
    val b = withBucket.alias("b")
    a.join(
      b,
      col("a.label") === col("b.label") && col("a.bucket") === col("b.bucket") &&
        col("a.vec_id") < col("b.vec_id")
    ).select(
        col("a.vec_id").as("vec_a"),
        col("b.vec_id").as("vec_b"),
        round(expr("cosine_sim(a.embedding, b.embedding)"), 6).as("cos_sim")
      )
      .filter(col("cos_sim") >= threshold)
      .orderBy(col("vec_a"), col("vec_b"))
  }

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "q_sim_topk",
      "brute-force cosine top-k vs a query vector (codegen'd CosineSimilarity expression; TakeOrderedAndProject, corpus never shuffles)",
      (s, dir) => {
        VectorFunctions.register(s)
        val emb = Tables.fanout(Tables.embeddings(s, dir))
        val q   = emb.filter(col("vec_id") === 0).select(col("embedding").as("q_emb"))
        emb
          .filter(col("vec_id") =!= 0)
          .crossJoin(broadcast(q))
          .select(
            col("vec_id"),
            col("label"),
            round(expr("cosine_sim(embedding, q_emb)"), 6).as("cos_sim")
          )
          .orderBy(col("cos_sim").desc, col("vec_id"))
          .limit(10)
      },
      Some(s"""WITH q AS (SELECT embedding AS q_emb FROM embeddings WHERE vec_id = 0)
              |SELECT vec_id, label,
              |  round(${cosDuck("embedding", "q_emb")}, 6) AS cos_sim
              |FROM embeddings CROSS JOIN q
              |WHERE vec_id <> 0
              |ORDER BY cos_sim DESC, vec_id LIMIT 10""".stripMargin)
    ),
    QueryDef(
      "q_sim_lsh_buckets",
      "random-hyperplane LSH bucketing: 8 sign bits -> 256 buckets (the ANN scale path); bucket histogram",
      (s, dir) =>
        Tables
          .fanout(Tables.embeddings(s, dir))
          .select(expr(bucketSpark).as("bucket"))
          .groupBy(col("bucket"))
          .agg(count(lit(1)).as("n"))
          .orderBy(col("bucket")),
      Some(s"""SELECT $bucketDuck AS bucket, count(1) AS n
              |FROM embeddings GROUP BY 1 ORDER BY bucket""".stripMargin)
    ),
    QueryDef(
      "q_sim_lsh_probe",
      "LSH-bucketed ANN probe: top-5 by cosine among vectors sharing the query's bucket (~1/256 of the corpus scanned)",
      (s, dir) => lshProbe(Tables.fanout(Tables.embeddings(s, dir)), queryVecId = 0, maxHamming = 0, k = 5),
      Some(s"""WITH bk AS (
              |  SELECT vec_id, embedding, $bucketDuck AS bucket FROM embeddings),
              |q AS (SELECT embedding AS q_emb, bucket AS q_bucket FROM bk WHERE vec_id = 0)
              |SELECT vec_id, bucket,
              |  round(${cosDuck("embedding", "q_emb")}, 6) AS cos_sim
              |FROM bk CROSS JOIN q
              |WHERE vec_id <> 0 AND bucket = q_bucket
              |ORDER BY cos_sim DESC, vec_id LIMIT 5""".stripMargin)
    ),
    QueryDef(
      "q_sim_lsh_probe2",
      "multi-probe LSH (Hamming radius 1): top-5 by cosine across the query's bucket plus its 8 single-bit-flip neighbors (~9/256 scanned) — the LSH recall lever, mirroring IVF nprobe=2",
      (s, dir) => lshProbe(Tables.fanout(Tables.embeddings(s, dir)), queryVecId = 0, maxHamming = 1, k = 5),
      Some(s"""WITH bk AS (
              |  SELECT vec_id, embedding, $bucketDuck AS bucket FROM embeddings),
              |q AS (SELECT embedding AS q_emb, bucket AS q_bucket FROM bk WHERE vec_id = 0)
              |SELECT vec_id, bucket,
              |  round(${cosDuck("embedding", "q_emb")}, 6) AS cos_sim
              |FROM bk CROSS JOIN q
              |WHERE vec_id <> 0 AND bit_count(xor(bucket, q_bucket)) <= 1
              |ORDER BY cos_sim DESC, vec_id LIMIT 5""".stripMargin)
    ),
    QueryDef(
      "q_sim_knn_join",
      "batched k-NN join: top-3 cosine neighbors for EACH of the first 3 query vectors, multi-probe-LSH-blocked, ranked by a mergeable typed top-k aggregate (no ranking window over the candidate pairs)",
      (s, dir) => {
        val emb = Tables.fanout(Tables.embeddings(s, dir))
        knnJoin(
          emb.filter(col("vec_id") < 3).select(col("vec_id"), col("embedding")),
          emb.filter(col("vec_id") >= 3).select(col("vec_id"), col("embedding")),
          k = 3,
          maxHamming = 1
        )
      },
      Some(s"""WITH bk AS (
              |  SELECT vec_id, embedding, $bucketDuck AS bucket FROM embeddings),
              |q AS (SELECT vec_id AS q_id, embedding AS q_emb, bucket AS q_bucket
              |      FROM bk WHERE vec_id < 3),
              |cand AS (
              |  SELECT q.q_id, b.vec_id,
              |    round(${cosDuck("b.embedding", "q.q_emb")}, 6) AS cos_sim
              |  FROM bk b CROSS JOIN q
              |  WHERE b.vec_id >= 3 AND bit_count(xor(b.bucket, q.q_bucket)) <= 1)
              |SELECT q_id, rn AS "rank", vec_id, cos_sim FROM (
              |  SELECT q_id, vec_id, cos_sim,
              |    row_number() OVER (PARTITION BY q_id ORDER BY cos_sim DESC, vec_id) AS rn
              |  FROM cand) t
              |WHERE rn <= 3 ORDER BY q_id, "rank"""".stripMargin)
    ),
    QueryDef(
      "q_dedup_embed",
      "embedding-cosine near-dup pairs, LSH-blocked: candidates share (label, bucket) so cost is sum(block^2), never all-pairs",
      // gate threshold 0.2, not the 0.85 API default: the synthetic fixture
      // holds no genuine near-dups (max within-block cosine ~0.34 at
      // sf0.01), so 0.85 would compare 0 rows = 0 rows and a broken join
      // predicate could hide (round-7 finding #3). 0.2 pushes real pairs
      // through join + score + filter in BOTH engines; the 0.85 semantics
      // are pinned separately by the planted-pair spec.
      (s, dir) => embedNearDupPairs(Tables.fanout(Tables.embeddings(s, dir)), threshold = 0.2),
      Some(s"""WITH bk AS (
              |  SELECT vec_id, label, embedding, $bucketDuck AS bucket FROM embeddings)
              |SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
              |  round(${cosDuck("a.embedding", "b.embedding")}, 6) AS cos_sim
              |FROM bk a JOIN bk b
              |  ON a.label = b.label AND a.bucket = b.bucket AND a.vec_id < b.vec_id
              |WHERE round(${cosDuck("a.embedding", "b.embedding")}, 6) >= 0.2
              |ORDER BY vec_a, vec_b""".stripMargin)
    ),
    QueryDef(
      "q_embed_stats",
      "per-label embedding stats: count and L2-norm min/max/avg (per-row norm is order-stable; avg rounded)",
      (s, dir) => {
        VectorFunctions.register(s)
        Tables
          .fanout(Tables.embeddings(s, dir))
          .withColumn(
            "norm",
            sqrt(expr(
              "aggregate(embedding, cast(0 as double), (acc, x) -> acc + cast(x as double) * cast(x as double))"
            ))
          )
          .groupBy(col("label"))
          .agg(
            count(lit(1)).as("n"),
            round(min(col("norm")), 6).as("min_norm"),
            round(max(col("norm")), 6).as("max_norm"),
            round(sum(col("norm").cast("decimal(18,12)")).cast("double") / count(lit(1)), 6)
              .as("avg_norm")
          )
          .orderBy(col("label"))
      },
      Some("""WITH n AS (
             |  SELECT label,
             |    sqrt(list_aggregate(list_transform(embedding, x -> cast(x as double) * cast(x as double)), 'sum')) AS norm
             |  FROM embeddings)
             |SELECT label, count(1) AS n,
             |  round(min(norm), 6) AS min_norm,
             |  round(max(norm), 6) AS max_norm,
             |  round(cast(sum(cast(norm as decimal(18,12))) as double) / count(1), 6) AS avg_norm
             |FROM n GROUP BY label ORDER BY label""".stripMargin)
    )
  )
}
