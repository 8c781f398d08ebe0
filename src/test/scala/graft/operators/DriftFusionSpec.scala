package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Planted cases for the r17 drift/eval additions: the exact-integer KS
  * statistic against hand-computed CDFs, and RRF fusion recomputed from
  * the two source rankings' own outputs.
  */
class DriftFusionSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("KS: hand-computed exact statistic, ties to the smallest value") {
    import spark.implicits._
    // sample 1 (g=1): {1, 1, 2}; sample 2 (g=0): {2, 3, 3}
    // v=1: |2*3 - 0*3| = 6; v=2: |3*3 - 1*3| = 6; v=3: |9 - 9| = 0
    // max 6 ties at v=1 and v=2 -> smallest value wins; ks = 6/9
    val m = Seq((1L, 1L), (1L, 1L), (1L, 2L), (0L, 2L), (0L, 3L), (0L, 3L)).toDF("g", "v")
    val r = Profiling.ksDrift(m).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) === ((3L, 3L, 1L, 6L)))
    assert(r.getDouble(4) === 6.0 / 9.0)
  }

  test("KS: identical distributions give D = 0") {
    import spark.implicits._
    val m = Seq((1L, 5L), (1L, 7L), (0L, 5L), (0L, 7L)).toDF("g", "v")
    val r = Profiling.ksDrift(m).collect().head
    assert(r.getLong(3) === 0L, s"equal CDFs must give a zero numerator: $r")
    assert(r.getDouble(4) === 0.0)
  }

  test("KS: disjoint supports give D = n1*n2 (ks = 1)") {
    import spark.implicits._
    val m = Seq((1L, 1L), (1L, 2L), (0L, 10L), (0L, 11L), (0L, 12L)).toDF("g", "v")
    val r = Profiling.ksDrift(m).collect().head
    assert(r.getLong(3) === 6L && r.getDouble(4) === 1.0, s"fully separated samples: $r")
  }

  test("RRF fusion equals the picounit formula recomputed from the two source rankings") {
    val dir = TestSpark.sfDir
    val fused = graft.SparkEntry
      .queries("q_sim_rrf")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // recompute from the source rankers' own outputs
    val exact = graft.SparkEntry
      .queries("q_sim_topk")(spark, dir)
      .collect()
      .map(_.getLong(0))
      .zipWithIndex
      .map { case (v, i) => v -> (i + 1L) }
      .toMap
    val quant = graft.SparkEntry
      .queries("q_sim_quantized_topk")(spark, dir)
      .collect()
      .map(_.getLong(0))
      .zipWithIndex
      .map { case (v, i) => v -> (i + 1L) }
      .toMap
    def units(r: Long) = if (r > 0) 1000000000000L / (60L + r) else 0L
    val expected = (exact.keySet ++ quant.keySet).toSeq
      .map { v =>
        val (ra, rb) = (exact.getOrElse(v, 0L), quant.getOrElse(v, 0L))
        (v, ra, rb, units(ra) + units(rb))
      }
      .sortBy { case (v, _, _, u) => (-u, v) }
      .take(5)
    assert(fused.toSeq === expected, s"fusion must be the exact picounit formula: ${fused.toSeq}")
  }
}
