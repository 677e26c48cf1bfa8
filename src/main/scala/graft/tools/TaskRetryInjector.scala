package graft.tools

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.SparkContext
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskStart}

/** Deterministic task-retry fault injector for the correctness
  * stress harness (`tools/gate_stress.sh`): registered with
  * `--conf spark.extraListeners=graft.tools.TaskRetryInjector`, it
  * kills the FIRST attempt of every task whose
  * `(stageId * 31 + taskIndex) % mod == 0` via
  * [[SparkContext.killTaskAttempt]], forcing the scheduler down the
  * resubmit path (killed attempts reschedule without counting toward
  * `spark.task.maxFailures`). Every query in the gate then executes
  * with a mix of attempt-0 and attempt-1 tasks — an operator whose
  * result depends on which attempt produced a partition
  * (non-deterministic shuffles, attempt-sensitive side effects, torn
  * commit protocols) diverges from its oracle under the harness
  * instead of in production.
  *
  * Injection is best-effort by construction — the kill races the
  * task's own completion, so short tasks sometimes finish first —
  * which is exactly the production shape of speculative/preempted
  * retries. The harness greps the driver log for the kill reason
  * marker and requires a non-zero count, so a silently-disabled
  * injector can't pass as a clean stress run.
  * `spark.graft.inject.taskFailureMod` (default 17) tunes density.
  *
  * NOTE: an executor-plugin `onTaskStart` throw is NOT a usable
  * injector — [[org.apache.spark.internal.plugin.PluginContainer]]
  * catches and logs plugin exceptions without failing the task.
  */
final class TaskRetryInjector extends SparkListener {

  // SparkContext.getActive is private[spark]; SparkSession's active
  // accessor is public and carries the same context
  private def active: Option[SparkContext] =
    org.apache.spark.sql.SparkSession.getActiveSession
      .orElse(org.apache.spark.sql.SparkSession.getDefaultSession)
      .map(_.sparkContext)

  private def mod: Int = active
    .map(_.getConf.getInt("spark.graft.inject.taskFailureMod",
      TaskRetryInjector.DefaultMod))
    .getOrElse(TaskRetryInjector.DefaultMod)

  override def onTaskStart(event: SparkListenerTaskStart): Unit = {
    val info = event.taskInfo
    val m = mod
    if (m > 0 && info.attemptNumber == 0 &&
        math.floorMod(event.stageId * 31 + info.index, m) == 0) {
      active.foreach { sc =>
        // racing the task's natural completion is fine: a miss means
        // the task was too fast to observe a mid-flight kill anyway
        try {
          if (sc.killTaskAttempt(info.taskId, interruptThread = true,
              reason = TaskRetryInjector.Marker))
            TaskRetryInjector.injected.incrementAndGet()
        } catch { case _: Exception => () }
      }
    }
  }
}

object TaskRetryInjector {
  val DefaultMod = 17
  /** Kill-reason marker: greppable in driver logs as evidence the
    * injection really fired during a harness run.
    */
  val Marker = "graft-inject: forced attempt-0 kill, retry path exercised"
  /** Count of injected kills in this JVM. */
  val injected = new AtomicLong(0)
}
