package graft.sources

import graft.{Tables, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** JSONL corpus ingest/egress: round-trip fidelity against the parquet
  * fixture, drop-on-malformed with measurable losses, sparse records as
  * nulls — the [[JsonDecode]] contract at corpus granularity.
  */
class JsonlCorpusSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("documents round-trip parquet -> jsonl -> frame losslessly") {
    val docs = Tables.documents(spark, TestSpark.sfDir)
    val dir  = java.nio.file.Files.createTempDirectory("graft-jsonl").toString + "/docs"
    JsonlCorpus.write(docs, dir, nFiles = 3)
    val back = JsonlCorpus.read(spark, dir)
    assert(back.schema.fieldNames.toSeq === JsonlCorpus.documentsSchema.fieldNames.toSeq)
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toString).sorted.toSeq
    assert(canon(back) === canon(docs), "jsonl round-trip must be lossless")
    val files = new java.io.File(dir).listFiles.count(_.getName.endsWith(".json"))
    assert(files === 3, "egress must honor the requested file count")
  }

  test("malformed lines drop (never fail) and are countable; sparse records keep nulls") {
    val dir  = java.nio.file.Files.createTempDirectory("graft-jsonl-bad").toString
    val file = java.nio.file.Paths.get(dir, "part-0.json")
    java.nio.file.Files.write(
      file,
      java.util.Arrays.asList(
        """{"doc_id": 1, "text": "good doc", "lang": "en", "source": "s", "n_chars": 8}""",
        """{"doc_id": 2, "text": "sparse doc"}""", // missing fields -> nulls, NOT corrupt
        """{"doc_id": 3, "text": "truncated""",    // malformed JSON
        "not json at all",
        ""                                          // blank line
      )
    )
    val kept = JsonlCorpus.read(spark, dir).orderBy("doc_id").collect()
    assert(kept.map(_.getLong(0)).toSeq === Seq(1L, 2L), "good + sparse survive, malformed drop")
    assert(kept(1).isNullAt(2) && kept(1).isNullAt(4), "sparse record keeps nulls for missing fields")

    val counted = JsonlCorpus.readCounted(spark, dir)
    val n = counted.agg(sum(when(col("_corrupt"), 1L).otherwise(0L))).collect()(0).getLong(0)
    assert(n === 3L, "the three bad lines (malformed x2, blank) must be counted, not silent")
  }
}
