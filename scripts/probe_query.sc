// Per-query stage-level profile: run ONE query N times under a
// SparkListener and print per-stage wall / shuffle bytes / task counts,
// so optimization targets the stage that actually costs (guide §1/§7).
//
// Usage:
//   echo 'probe("q_embed_dbscan", 3)' | cat scripts/probe_query.sc - | \
//     /opt/spark/bin/spark-shell --master local[32] \
//       --driver-class-path target/scala-2.13/classes \
//       --conf spark.ui.enabled=false \
//       --conf spark.sql.session.timeZone=UTC 2>/dev/null
import graft._
import org.apache.spark.scheduler._
import scala.collection.mutable

val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
val sp  = Tables.localSession("probe", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))

case class St(name: String, var wall: Long = 0, var tasks: Int = 0,
              var shufRead: Long = 0, var shufWrite: Long = 0, var input: Long = 0)
val stages = mutable.LinkedHashMap[Int, St]()
val listener = new SparkListener {
  override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
    val si = sc.stageInfo
    val st = stages.getOrElseUpdate(si.stageId, St(si.name.takeWhile(_ != '\n').take(80)))
    st.wall += si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L)
    st.tasks += si.numTasks
    st.shufRead += si.taskMetrics.shuffleReadMetrics.totalBytesRead
    st.shufWrite += si.taskMetrics.shuffleWriteMetrics.bytesWritten
    st.input += si.taskMetrics.inputMetrics.bytesRead
  }
}

def probe(name: String, reps: Int = 3): Unit = {
  // warm pass builds artifacts + JIT outside the profiled region
  SparkEntry.queries(name)(sp, dir).write.format("noop").mode("overwrite").save()
  sp.sparkContext.addSparkListener(listener)
  stages.clear()
  val times = (1 to reps).map { _ =>
    val t0 = System.nanoTime()
    SparkEntry.queries(name)(sp, dir).write.format("noop").mode("overwrite").save()
    (System.nanoTime() - t0) / 1e9
  }
  Thread.sleep(2000) // let the listener bus drain
  sp.sparkContext.removeSparkListener(listener)
  println(f"=== $name%s: ${times.map(t => f"$t%.3f").mkString(" ")} s (min ${times.min}%.3f)")
  println(f"${"stageId"}%7s ${"wall_ms"}%8s ${"tasks"}%5s ${"shufR_kb"}%9s ${"shufW_kb"}%9s ${"in_kb"}%8s  name")
  stages.toSeq.sortBy(-_._2.wall).take(40).foreach { case (id, s) =>
    println(f"$id%7d ${s.wall}%8d ${s.tasks}%5d ${s.shufRead / 1024}%9d ${s.shufWrite / 1024}%9d ${s.input / 1024}%8d  ${s.name}")
  }
  println(s"n_stages=${stages.size} total_stage_wall_ms=${stages.values.map(_.wall).sum}")
}
