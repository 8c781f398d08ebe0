package graft.operators

import graft.{SparkEntry, TestSpark}
import org.scalatest.funsuite.AnyFunSuite

/** Recall property of multi-probe IVF: searching 2 clusters can only add
  * candidates, so the top-5 similarities at every rank dominate (>=) the
  * single-probe top-5.
  */
class IvfSimilaritySpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def top5(name: String): Seq[Double] =
    SparkEntry
      .queries(name)(spark, TestSpark.sfDir)
      .collect()
      .map(_.getDouble(1))
      .toSeq

  test("nprobe=2 similarities dominate nprobe=1 at every rank") {
    val one = top5("q_sim_ivf_probe")
    val two = top5("q_sim_ivf_probe2")
    assert(one.length === 5 && two.length === 5)
    one.zip(two).zipWithIndex.foreach { case ((p1, p2), i) =>
      assert(p2 >= p1, s"rank $i: nprobe=2 ($p2) must be >= nprobe=1 ($p1)")
    }
  }
}
