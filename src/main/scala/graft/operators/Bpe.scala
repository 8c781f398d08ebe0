package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed BPE merge training (Sennrich et al. 2016 shape) over word
  * tokens — phrase-vocabulary mining: each round counts adjacent-pair
  * frequencies across the whole corpus, picks the most frequent pair
  * (deterministic tiebreak: count desc, then lexicographic), and rewrites
  * every document with the merged symbol (joined with '_', which the
  * corpus alphabet never contains). The learned merge table IS the
  * tokenizer artifact a training pipeline ships.
  *
  * Spark-first scale shape:
  *   - Each round is ONE corpus pass: a map-only adjacent-pair explode
  *     (the q_text_bigrams shape) into a map-side-combinable pair count,
  *     a 1-ROW argmax frame (TakeOrderedAndProject — per-partition heaps,
  *     never a global sort), and a map-only rewrite with the argmax
  *     CROSS-JOINED as a broadcast literal — the driver never collects
  *     anything, so K rounds are K jobs of corpus-pass cost each.
  *   - Document lineage is truncated per round with pinIter (the
  *     iterative-loop discipline); the 1-row argmax is pinned because it
  *     is referenced twice (rewrite + output union).
  *   - MERGE SEMANTICS: a round applies the winning pair with FOUR passes
  *     of non-overlapping left-to-right `replace` on the ' '-delimited
  *     token string. Both engines' replace (Java UTF8String / DuckDB)
  *     scan the input continuing AFTER each match, so the pass-by-pass
  *     result is bit-identical cross-engine; four passes merge same-token
  *     runs of any realistic length (a run of n identical tokens needs
  *     ~log2 passes), and any residual adjacency beyond that is the SAME
  *     residual on both sides. This iterated-replace rule is the
  *     documented, deterministic variant of greedy BPE merging.
  */
object Bpe {

  private val Rounds = 6

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "q_bpe_merges",
      s"distributed BPE merge training, $Rounds rounds over the documents corpus: per round one adjacent-pair count pass + 1-row argmax (count desc, lexicographic tiebreak) + broadcast-literal rewrite of every doc with the '_'-joined merge; output is the learned merge table (round, a, b, n) — the tokenizer artifact. No driver collect anywhere: the argmax rides a 1-row crossJoin broadcast into the rewrite",
      (s, dir) => {
        var docs: DataFrame = Tables
          .fanout(Tables.documents(s, dir))
          .select(col("doc_id"), concat(lit(" "), col("text"), lit(" ")).as("s"))
        val merges = Seq.newBuilder[DataFrame]
        for (k <- 1 to Rounds) {
          val pairs = docs
            .select(split(trim(col("s")), " ").as("t"))
            .select(
              explode(
                when(
                  size(col("t")) >= 2,
                  transform(
                    sequence(lit(1), size(col("t")) - 1),
                    i =>
                      struct(
                        element_at(col("t"), i).as("a"),
                        element_at(col("t"), i + 1).as("b")
                      )
                  )
                ).otherwise(array().cast("array<struct<a:string,b:string>>"))
              ).as("p")
            )
            .select(col("p.a").as("a"), col("p.b").as("b"))
            .groupBy(col("a"), col("b"))
            .agg(count(lit(1)).as("n"))
          // 1-row argmax, pinned with TRUNCATED lineage (pinIter, not
          // pin): referenced by BOTH the rewrite and the output union —
          // unpinned, each reference re-derives the whole corpus pass;
          // lineage-retaining, an evicted mk block would recompute into
          // the superseded generation's deleted checkpoint. The mk pins
          // stay live — the returned frame's union reads their blocks
          // when the CALLER evaluates.
          val mk = Tables.pinIter(pairs.orderBy(col("n").desc, col("a"), col("b")).limit(1))
          merges += mk.select(lit(k.toLong).as("round"), col("a"), col("b"), col("n"))
          // the final round's merge needs no rewrite (nothing reads it) —
          // and once round k+1's generation is eagerly materialized, round
          // k's corpus copy is dead and its checkpoint storage is
          // reclaimed (the CC-loop unpin discipline; without it K rounds
          // hold K corpus copies)
          if (k < Rounds) {
            val pat = concat(lit(" "), col("a"), lit(" "), col("b"), lit(" "))
            val rep = concat(lit(" "), col("a"), lit("_"), col("b"), lit(" "))
            var sNew: Column = col("s")
            for (_ <- 1 to 4) sNew = call_function("replace", sNew, pat, rep)
            val next = Tables.pinIter(
              docs.crossJoin(broadcast(mk)).select(col("doc_id"), sNew.as("s"))
            )
            Tables.unpin(docs) // no-op on the un-checkpointed round-1 base
            docs = next
          }
        }
        // the final generation fed the last round's (pinned) argmax and
        // has no further consumer — reclaim the last corpus copy too
        Tables.unpin(docs)
        merges.result().reduce(_ unionByName _).orderBy(col("round"))
      },
      Some {
        val ctes = Seq.newBuilder[String]
        ctes += "d0 AS (SELECT doc_id, ' ' || text || ' ' AS s FROM documents)"
        val sel = Seq.newBuilder[String]
        for (k <- 1 to Rounds) {
          ctes += s"""p$k AS (
                     |  SELECT split_part(pr, ' ', 1) AS a, split_part(pr, ' ', 2) AS b,
                     |    cast(count(1) as bigint) AS n
                     |  FROM (SELECT unnest(list_transform(generate_series(1, len(t) - 1),
                     |                                     i -> t[i] || ' ' || t[i+1])) AS pr
                     |        FROM (SELECT string_split(trim(s), ' ') AS t FROM d${k - 1}) x
                     |        WHERE len(t) >= 2) y
                     |  GROUP BY 1, 2)""".stripMargin
          ctes += s"m$k AS (SELECT a, b, n FROM p$k ORDER BY n DESC, a, b LIMIT 1)"
          val rep = (1 to 4).foldLeft("s") { (acc, _) =>
            s"replace($acc, ' ' || m.a || ' ' || m.b || ' ', ' ' || m.a || '_' || m.b || ' ')"
          }
          ctes += s"d$k AS (SELECT doc_id, $rep AS s FROM d${k - 1} CROSS JOIN m$k m)"
          sel += s"SELECT cast($k as bigint) AS round, a, b, n FROM m$k"
        }
        "WITH " + ctes.result().mkString(",\n") +
          "\nSELECT * FROM (" + sel.result().mkString(" UNION ALL ") + ") ORDER BY round"
      }
    )
  )
}
