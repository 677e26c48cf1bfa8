package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Diagnostic main (guide §1): run ONE registered query with a job
  * listener and print where the wall-clock goes — job count, per-job
  * duration, and the job descriptions/callsites — so optimization
  * targets the measured cost, not a guess. Not part of any query path.
  *
  * Usage: runMain graft.tools.JobProfile <queryName> [sfDir]
  */
object JobProfile {

  private case class JobRec(id: Int, desc: String, start: Long, var end: Long = 0L)

  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
    // diagnostic conf overrides: SPARK_GRAFT_PROFILE_CONF="k=v;k=v"
    sys.env.get("SPARK_GRAFT_PROFILE_CONF").foreach(_.split(";")
      .map(_.trim).filter(_.contains("=")).foreach { kv =>
        val Array(k, v) = kv.split("=", 2)
        builder.config(k, v)
      })
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val q = graft.Queries.all.find(_.name == name)
      .getOrElse(sys.error(s"no query named $name"))

    def run(): Unit =
      q.fn(spark, sfDir).write.format("noop").mode("overwrite").save()

    run() // warmup (JIT/codegen), untimed and unprofiled
    spark.catalog.clearCache()

    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, JobRec]()
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val desc = Option(js.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .filter(_.nonEmpty)
          .orElse(js.stageInfos.headOption.map(_.name))
          .getOrElse("")
        jobs.put(js.jobId, JobRec(js.jobId, desc, js.time))
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        val r = jobs.get(je.jobId)
        if (r != null) r.end = je.time
      }
    }
    spark.sparkContext.addSparkListener(listener)

    // Driver stack sampler: every 10 ms, bucket RUNNABLE non-executor
    // threads by their most informative frame — attributes the
    // between-jobs driver gaps (planning? fs? stream bookkeeping?).
    val buckets = new java.util.concurrent.ConcurrentHashMap[String, java.util.concurrent.atomic.AtomicLong]()
    val sampleOn = sys.env.get("SPARK_GRAFT_PROFILE_SAMPLER").contains("1")
    @volatile var sampling = sampleOn
    val sampler = new Thread(() => {
      while (sampling) {
        val traces = Thread.getAllStackTraces
        traces.forEach { (t, frames) =>
          val n = t.getName
          if (t.getState == Thread.State.RUNNABLE && frames.nonEmpty &&
              !n.startsWith("Executor task launch") &&
              !n.contains("sampler") && !n.startsWith("shuffle-") &&
              !n.startsWith("netty") && !n.startsWith("dispatcher")) {
            val fs = frames.map(f => f.getClassName + "." + f.getMethodName)
            def pick: String = {
              fs.find(_.startsWith("graft.")).getOrElse {
                val interesting = Seq("org.apache.spark.sql.catalyst.analysis",
                  "org.apache.spark.sql.catalyst.optimizer",
                  "org.apache.spark.sql.execution.adaptive",
                  "org.apache.spark.sql.execution.datasources.parquet",
                  "org.apache.spark.sql.execution.streaming",
                  "org.apache.hadoop.fs", "org.apache.parquet",
                  "org.apache.spark.sql.execution.exchange",
                  "org.apache.spark.sql.catalyst.rules",
                  "org.apache.spark.sql.execution.QueryExecution",
                  "org.apache.spark.scheduler", "org.codehaus.janino")
                fs.find(f => interesting.exists(f.startsWith))
                  .getOrElse(fs.head)
              }
            }
            // bucket by (thread kind, frame)
            val kind = if (n == "main") "main"
              else if (n.contains("stream execution")) "stream"
              else "other:" + n.takeWhile(_ != '-')
            val key = kind + " | " + pick
            buckets.computeIfAbsent(key, _ => new java.util.concurrent.atomic.AtomicLong).incrementAndGet()
          }
        }
        Thread.sleep(10)
      }
    }, "jobprofile-sampler")
    sampler.setDaemon(true)
    if (sampleOn) sampler.start()

    val t0 = System.nanoTime()
    run()
    val wallSec = (System.nanoTime() - t0) / 1e9
    sampling = false
    Thread.sleep(500) // let listener events drain

    import scala.jdk.CollectionConverters._
    val recs = jobs.values.asScala.toSeq.sortBy(_.id)
    val done = recs.filter(_.end > 0)
    val jobSec = done.map(r => (r.end - r.start) / 1e3).sum
    println(f"PROFILE $name wall=${wallSec}%.2fs jobs=${recs.size} jobTimeSum=${jobSec}%.2fs (overlap possible)")
    // group identical descriptions
    val byDesc = done.groupBy(_.desc).map { case (d, rs) =>
      (d, rs.size, rs.map(r => (r.end - r.start) / 1e3).sum)
    }.toSeq.sortBy(-_._3)
    byDesc.take(30).foreach { case (d, n, s) =>
      println(f"  JOBGRP n=$n%3d sum=${s}%7.3fs  ${d.take(140)}")
    }
    println("  --- slowest 25 individual jobs ---")
    done.sortBy(r => -(r.end - r.start)).take(25).foreach { r =>
      println(f"  JOB ${r.id}%4d ${(r.end - r.start) / 1e3}%7.3fs  ${r.desc.take(140)}")
    }
    // driver-side gaps: wall time when NO job was running (planning,
    // fs ops, commit protocol, stream bookkeeping)
    val sorted = done.sortBy(_.start)
    if (sorted.nonEmpty) {
      var covered = 0L; var cursor = sorted.head.start
      sorted.foreach { r =>
        val s = r.start max cursor
        if (r.end > s) { covered += r.end - s; cursor = r.end max cursor }
      }
      val span = sorted.map(_.end).max - sorted.head.start
      println(f"  SPAN ${span / 1e3}%.2fs coveredByJobs ${covered / 1e3}%.2fs driverGaps ${(span - covered) / 1e3}%.2fs")
    }
    println("  --- driver stack samples (10ms) ---")
    import scala.jdk.CollectionConverters._
    buckets.asScala.toSeq.sortBy(-_._2.get).take(30).foreach { case (k, v) =>
      println(f"  SAMP ${v.get * 10 / 1e3}%7.2fs  ${k.take(150)}")
    }
    spark.stop()
  }
}
