package graft.streaming

import graft.{Tables, TestSpark}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

case class Doc(doc_id: Long, text: String)

/** Streaming decontamination-on-ingest ([[StreamingPipelines
  * .decontaminateStream]]): the guarantee is NO FALSE NEGATIVES — every doc
  * sharing a 13-gram with the eval corpus is flagged — with an fpp-bounded
  * trickle of extra flags the batch exact-verify removes. Driven through
  * MemoryStream against an exact gram-join ground truth on fixture text.
  */
class DecontaminateStreamSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def grams13(df: org.apache.spark.sql.DataFrame) =
    df.select(col("doc_id"), split(col("text"), " ").as("t"))
      .select(
        col("doc_id"),
        explode(
          when(
            size(col("t")) >= 13,
            expr("transform(sequence(0, size(t) - 13), i -> md5(concat_ws(' ', slice(t, i + 1, 13))))")
          ).otherwise(expr("array()"))
        ).as("g")
      )

  test("streamed flags = exact contamination plus an fpp-bounded trickle; no false negatives") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    // eval corpus = 40 fixture docs; stream = 120 other docs PLUS 10 docs
    // that splice a whole eval doc into unrelated text (guaranteed overlap)
    val docs = Tables.documents(spark, TestSpark.sfDir).select(col("doc_id"), col("text"))
    val evalDocs   = docs.filter(col("doc_id") % 10 === 0).limit(40).cache()
    val cleanDocs  = docs.filter(col("doc_id") % 10 === 3).limit(120).collect().map(r => Doc(r.getLong(0), r.getString(1)))
    val evalTexts  = evalDocs.limit(10).collect().map(_.getString(1))
    val spliced = evalTexts.zipWithIndex.map { case (t, i) =>
      Doc(1000000L + i, s"prefix words here $t and a suffix")
    }
    val streamDocs = cleanDocs ++ spliced

    val bloom = StreamingPipelines.buildGramBloom(evalDocs, numBits = 1 << 21, numHashes = 5)
    assert(graft.functions.BloomFilter.numHashesOf(bloom) == 5)

    val input = MemoryStream[Doc]
    val q = StreamingPipelines
      .decontaminateStream(input.toDF(), bloom)
      .writeStream
      .format("memory")
      .queryName("decon_out")
      .start()
    val flagged =
      try {
        input.addData(streamDocs.toSeq)
        q.processAllAvailable()
        spark
          .table("decon_out")
          .filter(col("contaminated"))
          .select(col("doc_id"))
          .collect()
          .map(_.getLong(0))
          .toSet
      } finally q.stop()

    // exact ground truth: docs sharing >=1 13-gram with the eval corpus
    val evalGrams = grams13(evalDocs).select(col("g")).distinct()
    val exact = grams13(streamDocs.toSeq.toDF("doc_id", "text"))
      .join(evalGrams, Seq("g"), "left_semi")
      .select(col("doc_id"))
      .distinct()
      .collect()
      .map(_.getLong(0))
      .toSet

    assert(spliced.map(_.doc_id).toSet.subsetOf(exact), "splice construction must contaminate")
    val falseNegatives = exact -- flagged
    assert(falseNegatives.isEmpty, s"false negatives: $falseNegatives")
    val trickle = flagged -- exact
    assert(trickle.size <= 6, s"fpp trickle ${trickle.size}/120 far above the filter's design point")
  }

  test("batch and streaming forms produce identical flags (input-agnostic transform)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val docs  = Tables.documents(spark, TestSpark.sfDir).limit(60).select(col("doc_id"), col("text"))
    val bloom = StreamingPipelines.buildGramBloom(docs.limit(15), numBits = 1 << 20, numHashes = 4)

    val batch = StreamingPipelines
      .decontaminateStream(docs, bloom)
      .select(col("doc_id"), col("n_grams"), col("n_suspect"), col("contaminated"))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getBoolean(3)))
      .toSet

    val typed = docs.collect().map(r => Doc(r.getLong(0), r.getString(1)))
    val input = MemoryStream[Doc]
    val q = StreamingPipelines
      .decontaminateStream(input.toDF(), bloom)
      .writeStream
      .format("memory")
      .queryName("decon_twin")
      .start()
    val streamed =
      try {
        input.addData(typed.toSeq)
        q.processAllAvailable()
        spark
          .table("decon_twin")
          .select(col("doc_id"), col("n_grams"), col("n_suspect"), col("contaminated"))
          .collect()
          .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getBoolean(3)))
          .toSet
      } finally q.stop()

    assert(streamed == batch)
  }
}
