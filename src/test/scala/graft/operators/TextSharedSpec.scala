package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Property-style check of the bucket-local pair generator the whole
  * LSH/shingle dedup family rests on: one Spark job over many generated
  * arrays, verified pairwise against a Scala reference implementation
  * (scalacheck-per-case would pay a Spark job per example).
  */
class TextSharedSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("orderedPairs == reference i<j combinations for 60 random arrays (sizes 0-12, with cap slices)") {
    import spark.implicits._
    val rng = new scala.util.Random(42)
    val cases: Seq[(Long, Seq[Long])] = (0 until 60).map { i =>
      val n = rng.nextInt(13)
      (i.toLong, Seq.fill(n)(rng.nextInt(1000).toLong).distinct.sorted)
    }
    def reference(xs: Seq[Long]): Seq[(Long, Long)] =
      for { i <- xs.indices; j <- (i + 1) until xs.size } yield (xs(i), xs(j))

    val out = cases
      .toDF("case_id", "ids")
      .select(
        col("case_id"),
        TextShared.orderedPairs(col("ids")).as("pairs"),
        // the bucket-cap form used by pairsFromSignatures: pairs of the
        // 4 smallest ids must equal the reference over take(4)
        TextShared.orderedPairs(slice(col("ids"), 1, 4)).as("capped")
      )
      .collect()
      .map(r =>
        r.getLong(0) -> (
          r.getSeq[org.apache.spark.sql.Row](1).map(p => (p.getLong(0), p.getLong(1))),
          r.getSeq[org.apache.spark.sql.Row](2).map(p => (p.getLong(0), p.getLong(1)))
        )
      )
      .toMap
    cases.foreach { case (id, xs) =>
      val (pairs, capped) = out(id)
      assert(pairs === reference(xs), s"case $id (n=${xs.size})")
      assert(pairs.size === xs.size * (xs.size - 1) / 2, s"case $id count")
      assert(capped === reference(xs.take(4)), s"case $id capped")
    }
  }
}
