package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed BPE merge training (Sennrich et al. 2016) over word
  * tokens — phrase-vocabulary mining: each round counts adjacent-pair
  * frequencies, picks the most frequent pair (deterministic tiebreak:
  * count desc, then lexicographic), and rewrites every sequence with the
  * merged symbol (joined with '_', which the corpus alphabet never
  * contains). The learned merge table IS the tokenizer artifact a
  * training pipeline ships.
  *
  * Spark-first scale shape — Sennrich's ACTUAL formulation: training runs
  * on the DISTINCT-SEQUENCE FREQUENCY TABLE, not the raw corpus. One
  * up-front aggregation collapses the corpus to (distinct sequence,
  * count) — vocabulary-shaped, orders of magnitude smaller than the
  * corpus on any real dataset (the paper trains on the word-frequency
  * dictionary for exactly this reason) — and every round's pair count and
  * rewrite runs against that weighted frame, with pair counts weighted by
  * `w`. The merge table is IDENTICAL to the raw-corpus derivation (the
  * weighted sum is the same total), but per-round cost is now
  * |distinct sequences|, which is what makes a 10^4-10^5-merge production
  * vocabulary trainable: 10^5 rounds over the frequency table is a plan,
  * 10^5 full-corpus passes is not.
  *
  *   - Per round: a map-only adjacent-pair explode (the q_text_bigrams
  *     shape) into a map-side-combinable weighted pair count, a 1-ROW
  *     argmax frame (TakeOrderedAndProject — per-partition heaps, never a
  *     global sort), and a map-only rewrite with the argmax CROSS-JOINED
  *     as a broadcast literal — the driver never collects anything.
  *   - After each rewrite the frame RE-AGGREGATES on the rewritten text:
  *     two previously-distinct sequences can collapse once a merge lands
  *     (" x a b " and " x a_b " become equal), and re-aggregation keeps
  *     the frame the distinct-sequence table with exact weights.
  *   - Sequence-frame lineage is truncated per round with pinIter (the
  *     iterative-loop discipline); the 1-row argmax is pinned because it
  *     is referenced twice (rewrite + output union); superseded
  *     generations are unpinned so K rounds never hold K frame copies.
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

  /** The training loop over any (text) frame — exposed with a per-round
    * observer so the spec can pin the scale invariant (the round-k input
    * frame is DISTINCT-TEXT-sized, never doc-count-sized). Returns the
    * merge table (round, a, b, n).
    */
  private[graft] def trainMerges(
      docs: DataFrame,
      rounds: Int = Rounds,
      onRoundFrame: (Int, DataFrame) => Unit = (_, _) => ()
  ): DataFrame =
    trainMergesWeighted(
      // THE one corpus-sized pass: collapse to (distinct sequence, weight).
      // pinIter, not pin — this is generation 0 of the loop frame below.
      Tables.pinIter(
        docs
          .select(concat(lit(" "), col("text"), lit(" ")).as("s"))
          .groupBy(col("s"))
          .agg(count(lit(1)).as("w"))
      ),
      rounds,
      onRoundFrame
    )

  /** The training loop over an ALREADY-BUILT frequency frame (s, w) with
    * space-padded sequences — the entry point [[graft.streaming
    * .StreamingBpe]] retrains through: frequency tables are additive, so a
    * re-aggregated union of per-batch partials trains bit-identically to
    * the batch build. The caller passes a MATERIALIZED frame (the loop
    * unpins superseded generations, generation 0 included).
    */
  private[graft] def trainMergesWeighted(
      seqs0: DataFrame,
      rounds: Int = Rounds,
      onRoundFrame: (Int, DataFrame) => Unit = (_, _) => ()
  ): DataFrame = {
    var seqs: DataFrame = seqs0
    val merges = Seq.newBuilder[DataFrame]
    for (k <- 1 to rounds) {
      onRoundFrame(k, seqs)
      val pairs = seqs
        .select(col("w"), split(trim(col("s")), " ").as("t"))
        .select(
          col("w"),
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
        .select(col("p.a").as("a"), col("p.b").as("b"), col("w"))
        .groupBy(col("a"), col("b"))
        .agg(sum(col("w")).as("n"))
      // 1-row argmax, pinned with TRUNCATED lineage (pinIter, not
      // pin): referenced by BOTH the rewrite and the output union —
      // unpinned, each reference re-derives the whole pair-count pass;
      // lineage-retaining, an evicted mk block would recompute into
      // the superseded generation's deleted checkpoint. The mk pins
      // stay live — the returned frame's union reads their blocks
      // when the CALLER evaluates.
      val mk = Tables.pinIter(pairs.orderBy(col("n").desc, col("a"), col("b")).limit(1))
      merges += mk.select(lit(k.toLong).as("round"), col("a"), col("b"), col("n"))
      // the final round's merge needs no rewrite (nothing reads it) —
      // and once round k+1's generation is eagerly materialized, round
      // k's frame copy is dead and its checkpoint storage is reclaimed
      // (the CC-loop unpin discipline)
      if (k < rounds) {
        val pat = concat(lit(" "), col("a"), lit(" "), col("b"), lit(" "))
        val rep = concat(lit(" "), col("a"), lit("_"), col("b"), lit(" "))
        var sNew: Column = col("s")
        for (_ <- 1 to 4) sNew = call_function("replace", sNew, pat, rep)
        // re-aggregate on the rewritten text: merges can make distinct
        // sequences collapse, and the frame must STAY the distinct-
        // sequence table (exact weights) for every later round
        val next = Tables.pinIter(
          seqs
            .crossJoin(broadcast(mk))
            .select(sNew.as("s"), col("w"))
            .groupBy(col("s"))
            .agg(sum(col("w")).as("w"))
        )
        Tables.unpin(seqs)
        seqs = next
      }
    }
    // the final generation fed the last round's (pinned) argmax and
    // has no further consumer — reclaim the last frame copy too
    Tables.unpin(seqs)
    merges.result().reduce(_ unionByName _).orderBy(col("round"))
  }

  /** Tokenizer APPLY: run the same weighted training loop on an
    * (original text, current text, weight) frame — the extra `s0` key
    * changes nothing about the argmax (pair counts are Σ w × pairs(s),
    * identical to [[trainMerges]]'s re-aggregated frame) — and rewrite
    * through ALL `rounds` merges, returning the (s0, enc) mapping for
    * every DISTINCT text. Encoding is a pure function of the text, so
    * per-doc results come from one join against this vocabulary-shaped
    * frame instead of running the merge cascade over every document copy.
    * Each round's 1-row argmax is unpinned as soon as the rewrite that
    * consumed it is materialized (unlike trainMerges, nothing re-reads it).
    */
  private[graft] def encodeDistinct(docs: DataFrame, rounds: Int = Rounds): DataFrame = {
    var seqs: DataFrame = Tables.pinIter(
      docs
        .select(concat(lit(" "), col("text"), lit(" ")).as("s0"))
        .groupBy(col("s0"))
        .agg(count(lit(1)).as("w"))
        .select(col("s0"), col("s0").as("s"), col("w"))
    )
    for (_ <- 1 to rounds) {
      val pairs = seqs
        .select(col("w"), split(trim(col("s")), " ").as("t"))
        .select(
          col("w"),
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
        .select(col("p.a").as("a"), col("p.b").as("b"), col("w"))
        .groupBy(col("a"), col("b"))
        .agg(sum(col("w")).as("n"))
      val mk  = Tables.pinIter(pairs.orderBy(col("n").desc, col("a"), col("b")).limit(1))
      val pat = concat(lit(" "), col("a"), lit(" "), col("b"), lit(" "))
      val rep = concat(lit(" "), col("a"), lit("_"), col("b"), lit(" "))
      var sNew: Column = col("s")
      for (_ <- 1 to 4) sNew = call_function("replace", sNew, pat, rep)
      val next = Tables.pinIter(
        seqs.crossJoin(broadcast(mk)).select(col("s0"), sNew.as("s"), col("w"))
      )
      Tables.unpin(seqs)
      Tables.unpin(mk)
      seqs = next
    }
    seqs.select(col("s0"), trim(col("s")).as("enc"))
  }

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "q_bpe_merges",
      s"distributed BPE merge training, $Rounds rounds, on the DISTINCT-SEQUENCE FREQUENCY TABLE (Sennrich et al. 2016's actual formulation): ONE corpus pass collapses documents to (distinct text, count), and every round's weighted pair count + 1-row argmax (count desc, lexicographic tiebreak) + broadcast-literal rewrite runs against that vocabulary-shaped frame — per-round cost is |distinct sequences|, not |corpus|, which is what makes a 10^4-merge production vocabulary trainable. The merge table (round, a, b, n) is IDENTICAL to the raw-corpus derivation (weighted sums are the same totals); rewritten sequences re-aggregate each round because merges can collapse previously-distinct texts. No driver collect anywhere: the argmax rides a 1-row crossJoin broadcast into the rewrite",
      (s, dir) => trainMerges(Tables.fanout(Tables.documents(s, dir)), Rounds),
      Some {
        val ctes = Seq.newBuilder[String]
        ctes += ("d0 AS (SELECT s, cast(count(1) as bigint) AS w FROM " +
          "(SELECT ' ' || text || ' ' AS s FROM documents) raw GROUP BY 1)")
        val sel = Seq.newBuilder[String]
        for (k <- 1 to Rounds) {
          ctes += s"""p$k AS (
                     |  SELECT split_part(pr, ' ', 1) AS a, split_part(pr, ' ', 2) AS b,
                     |    cast(sum(w) as bigint) AS n
                     |  FROM (SELECT w, unnest(list_transform(generate_series(1, len(t) - 1),
                     |                                        i -> t[i] || ' ' || t[i+1])) AS pr
                     |        FROM (SELECT w, string_split(trim(s), ' ') AS t FROM d${k - 1}) x
                     |        WHERE len(t) >= 2) y
                     |  GROUP BY 1, 2)""".stripMargin
          ctes += s"m$k AS (SELECT a, b, n FROM p$k ORDER BY n DESC, a, b LIMIT 1)"
          val rep = (1 to 4).foldLeft("s") { (acc, _) =>
            s"replace($acc, ' ' || m.a || ' ' || m.b || ' ', ' ' || m.a || '_' || m.b || ' ')"
          }
          ctes += (s"d$k AS (SELECT s, cast(sum(w) as bigint) AS w FROM " +
            s"(SELECT $rep AS s, w FROM d${k - 1} CROSS JOIN m$k m) r GROUP BY 1)")
          sel += s"SELECT cast($k as bigint) AS round, a, b, n FROM m$k"
        }
        "WITH " + ctes.result().mkString(",\n") +
          "\nSELECT * FROM (" + sel.result().mkString(" UNION ALL ") + ") ORDER BY round"
      }
    ),
    QueryDef(
      "q_bpe_encode",
      s"tokenizer APPLY — encode the corpus with the $Rounds learned BPE merges (the other half of shipping a tokenizer: q_bpe_merges learns the table, this query runs it): the weighted cascade rewrites every DISTINCT text through all rounds' merges (vocabulary-shaped work, argmax identical to training because pair counts stay Σ w x pairs), and per-doc results come from ONE join of documents against that (orig, encoded) mapping. Output per doc: whitespace token count before/after and md5 of the encoded text — the hash pins the full encode round trip. First 500 docs by id",
      (s, dir) => {
        val enc = encodeDistinct(Tables.fanout(Tables.documents(s, dir)), Rounds)
        Tables
          .documents(s, dir)
          .select(
            col("doc_id"),
            concat(lit(" "), col("text"), lit(" ")).as("s0"),
            size(split(col("text"), " ")).cast("long").as("n_tokens")
          )
          .join(enc, "s0")
          .select(
            col("doc_id"),
            col("n_tokens"),
            size(split(col("enc"), " ")).cast("long").as("n_enc"),
            md5(col("enc")).as("enc_hash")
          )
          .orderBy(col("doc_id"))
          .limit(500)
      },
      Some {
        val ctes = Seq.newBuilder[String]
        ctes += ("d0 AS (SELECT s, cast(count(1) as bigint) AS w FROM " +
          "(SELECT ' ' || text || ' ' AS s FROM documents) raw GROUP BY 1)")
        ctes += "enc0 AS (SELECT s AS s0, s FROM d0)"
        for (k <- 1 to Rounds) {
          ctes += s"""p$k AS (
                     |  SELECT split_part(pr, ' ', 1) AS a, split_part(pr, ' ', 2) AS b,
                     |    cast(sum(w) as bigint) AS n
                     |  FROM (SELECT w, unnest(list_transform(generate_series(1, len(t) - 1),
                     |                                        i -> t[i] || ' ' || t[i+1])) AS pr
                     |        FROM (SELECT w, string_split(trim(s), ' ') AS t FROM d${k - 1}) x
                     |        WHERE len(t) >= 2) y
                     |  GROUP BY 1, 2)""".stripMargin
          ctes += s"m$k AS (SELECT a, b, n FROM p$k ORDER BY n DESC, a, b LIMIT 1)"
          val rep = (1 to 4).foldLeft("s") { (acc, _) =>
            s"replace($acc, ' ' || m.a || ' ' || m.b || ' ', ' ' || m.a || '_' || m.b || ' ')"
          }
          ctes += (s"d$k AS (SELECT s, cast(sum(w) as bigint) AS w FROM " +
            s"(SELECT $rep AS s, w FROM d${k - 1} CROSS JOIN m$k m) r GROUP BY 1)")
          ctes += s"enc$k AS (SELECT s0, $rep AS s FROM enc${k - 1} CROSS JOIN m$k m)"
        }
        s"""WITH ${ctes.result().mkString(",\n")}
           |SELECT d.doc_id,
           |  cast(len(string_split(d.text, ' ')) as bigint) AS n_tokens,
           |  cast(len(string_split(trim(e.s), ' ')) as bigint) AS n_enc,
           |  md5(trim(e.s)) AS enc_hash
           |FROM documents d JOIN enc$Rounds e ON e.s0 = ' ' || d.text || ' '
           |ORDER BY d.doc_id LIMIT 500""".stripMargin
      }
    )
  )
}
