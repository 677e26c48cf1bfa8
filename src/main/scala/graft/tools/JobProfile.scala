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
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .getOrCreate()
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
          .orElse(Option(js.properties)
            .flatMap(p => Option(p.getProperty("callSite.short"))))
          .getOrElse("")
        jobs.put(js.jobId, JobRec(js.jobId, desc, js.time))
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        val r = jobs.get(je.jobId)
        if (r != null) r.end = je.time
      }
    }
    spark.sparkContext.addSparkListener(listener)
    val t0 = System.nanoTime()
    run()
    val wallSec = (System.nanoTime() - t0) / 1e9
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
    spark.stop()
  }
}
