package graft

import java.nio.file.{Files, Paths}
import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Optimization-round measurement harness (guide §1: measure first).
  *
  * For each named registered query (default: all), runs one UNTIMED
  * warm pass (session caches + codegen, the Bench warm-up convention),
  * then one timed `count()` pass with a listener attached, and writes
  * `<outDir>/<name>.txt` containing the formatted physical plan plus
  * the run's job/stage/task counts, summed task time, and shuffle
  * bytes — the plan-shape evidence OPTIMIZATION_r16.md cites. A
  * compact `name secs jobs stages tasks taskSecs shuffleMB` line per
  * query goes to stdout for quick ranking.
  *
  * Usage: runMain graft.Profile <sfDir> <outDir> [name[,name...]]
  */
object Profile {

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val names: Seq[String] =
      if (args.length > 2) args.drop(2).flatMap(_.split(',')).map(_.trim).filter(_.nonEmpty).toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    val unknown = names.filterNot(SparkEntry.queries.contains)
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(", ")}")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Files.createDirectories(Paths.get(outDir))

    val jobs = new AtomicInteger(0)
    val stages = new AtomicInteger(0)
    val tasks = new AtomicInteger(0)
    val taskMs = new AtomicLong(0L)
    val shufR = new AtomicLong(0L)
    val shufW = new AtomicLong(0L)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit =
        stages.incrementAndGet()
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet()
        val m = e.taskMetrics
        if (m != null) {
          taskMs.addAndGet(m.executorRunTime)
          shufR.addAndGet(m.shuffleReadMetrics.totalBytesRead)
          shufW.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        }
      }
    })

    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      // warm pass: session caches + codegen paths heat exactly once
      try fn(spark, sfDir).count() catch { case _: Throwable => () }
      val df = fn(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      jobs.set(0); stages.set(0); tasks.set(0)
      taskMs.set(0L); shufR.set(0L); shufW.set(0L)
      val t0 = System.nanoTime()
      val n = try Right(df.count()) catch { case e: Throwable => Left(e.getMessage) }
      val secs = (System.nanoTime() - t0) / 1e9
      // listener bus is async; give it a beat to drain before snapshotting
      Thread.sleep(300)
      val summary = f"$name%-42s ${secs}%7.3f s  jobs=${jobs.get}%-3d " +
        f"stages=${stages.get}%-4d tasks=${tasks.get}%-5d " +
        f"taskTime=${taskMs.get / 1000.0}%8.2f s  " +
        f"shufR=${shufR.get / 1048576.0}%8.2f MB shufW=${shufW.get / 1048576.0}%8.2f MB  " +
        s"rows=${n.fold(e => s"ERR($e)", _.toString)}"
      println(summary)
      Files.writeString(Paths.get(s"$outDir/$name.txt"),
        s"== $name ==\n$summary\n\n$plan\n")
    }
    spark.stop()
  }
}
