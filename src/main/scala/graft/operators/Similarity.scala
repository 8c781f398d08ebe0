package graft.operators

import graft.{QueryDef, Tables}
import graft.functions.VectorFunctions
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
      (s, dir) => {
        VectorFunctions.register(s)
        val withBucket = Tables
          .fanout(Tables.embeddings(s, dir))
          .withColumn("bucket", expr(bucketSpark))
        val q = withBucket
          .filter(col("vec_id") === 0)
          .select(col("embedding").as("q_emb"), col("bucket").as("q_bucket"))
        withBucket
          .crossJoin(broadcast(q))
          .filter(col("vec_id") =!= 0 && col("bucket") === col("q_bucket"))
          .select(
            col("vec_id"),
            col("bucket"),
            round(expr("cosine_sim(embedding, q_emb)"), 6).as("cos_sim")
          )
          .orderBy(col("cos_sim").desc, col("vec_id"))
          .limit(5)
      },
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
      "q_dedup_embed",
      "embedding-cosine near-dup pairs, LSH-blocked: candidates share (label, bucket) so cost is sum(block^2), never all-pairs",
      (s, dir) => {
        VectorFunctions.register(s)
        val withBucket = Tables
          .fanout(Tables.embeddings(s, dir))
          .select(col("vec_id"), col("label"), col("embedding"), expr(bucketSpark).as("bucket"))
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
          .filter(col("cos_sim") >= 0.85)
          .orderBy(col("vec_a"), col("vec_b"))
      },
      Some(s"""WITH bk AS (
              |  SELECT vec_id, label, embedding, $bucketDuck AS bucket FROM embeddings)
              |SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
              |  round(${cosDuck("a.embedding", "b.embedding")}, 6) AS cos_sim
              |FROM bk a JOIN bk b
              |  ON a.label = b.label AND a.bucket = b.bucket AND a.vec_id < b.vec_id
              |WHERE round(${cosDuck("a.embedding", "b.embedding")}, 6) >= 0.85
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
