package graft.functions

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class VectorFunctionsSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def cos(a: Seq[Float], b: Seq[Float]): Double = {
    VectorFunctions.register(spark)
    Seq((a, b))
      .toDF("a", "b")
      .select(expr("cosine_sim(a, b)"))
      .collect()(0)
      .getDouble(0)
  }

  test("self-similarity is 1.0") {
    assert(math.abs(cos(Seq(1f, 2f, 3f), Seq(1f, 2f, 3f)) - 1.0) < 1e-12)
  }

  test("orthogonal vectors -> 0") {
    assert(math.abs(cos(Seq(1f, 0f), Seq(0f, 1f))) < 1e-12)
  }

  test("opposite vectors -> -1") {
    assert(math.abs(cos(Seq(1f, 1f), Seq(-1f, -1f)) + 1.0) < 1e-12)
  }

  test("matches reference computation on random vectors") {
    val rnd = new scala.util.Random(7)
    (1 to 20).foreach { _ =>
      val a = Seq.fill(64)(rnd.nextFloat() - 0.5f)
      val b = Seq.fill(64)(rnd.nextFloat() - 0.5f)
      val expected = {
        var dot = 0.0; var na = 0.0; var nb = 0.0
        a.zip(b).foreach { case (x, y) =>
          dot += x.toDouble * y.toDouble; na += x.toDouble * x.toDouble; nb += y.toDouble * y.toDouble
        }
        dot / (math.sqrt(na) * math.sqrt(nb))
      }
      assert(math.abs(cos(a, b) - expected) < 1e-12)
    }
  }

  test("null array -> null") {
    VectorFunctions.register(spark)
    val out = Seq((Some(Seq(1f, 2f)), Option.empty[Seq[Float]]))
      .toDF("a", "b")
      .select(expr("cosine_sim(a, b)"))
      .collect()
    assert(out(0).isNullAt(0))
  }

  test("works under whole-stage codegen over a real column") {
    VectorFunctions.register(spark)
    val emb = graft.Tables.embeddings(spark, TestSpark.sfDir)
    val q   = emb.filter(col("vec_id") === 0).select(col("embedding").as("q"))
    val n = emb
      .crossJoin(broadcast(q))
      .select(expr("cosine_sim(embedding, q)").as("c"))
      .filter(col("c").between(-1.0000001, 1.0000001))
      .count()
    assert(n === emb.count())
  }
}
