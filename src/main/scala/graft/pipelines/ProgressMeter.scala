package graft.pipelines

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}

/** X3 progress metering: one log line per `every` input rows with the
  * elapsed time since the previous line — the reference counts lines on
  * its single reader thread (`import_fantoir.py:193-200`); the
  * distributed analog sums each finished task's input-records on the
  * driver's listener bus, which costs the jobs nothing.
  *
  * Granularity note: totals advance a whole task at a time, so a line is
  * emitted as the count CROSSES each 500k boundary, not at the exact
  * row — same contract the reference's `% 500_000` check has for its
  * buffered reader.
  */
final class ProgressMeter(every: Long = 500000L,
                          log: String => Unit = ProgressMeter.stderrLog,
                          clock: () => Long = () => System.nanoTime())
    extends SparkListener {

  private val rows = new AtomicLong(0L)
  private val marks = new AtomicLong(0L)
  private val lastT = new AtomicLong(clock())

  /** Core accounting, listener-independent (unit-testable): add `n`
    * read rows; returns the log line if a boundary was crossed.
    */
  private[graft] def record(n: Long): Option[String] = {
    if (n <= 0) return None
    val total = rows.addAndGet(n)
    val mark = total / every
    val prev = marks.getAndUpdate(m => math.max(m, mark))
    if (mark > prev) {
      val now = clock()
      val dt = (now - lastT.getAndSet(now)) / 1e9
      Some(f"${mark * every}%,d rows read (+${(mark - prev) * every}%,d" +
        f" in $dt%.1f s, total $total%,d)")
    } else None
  }

  def totalRows: Long = rows.get()

  override def onTaskEnd(taskEnd: SparkListenerTaskEnd): Unit = {
    val read = Option(taskEnd.taskMetrics)
      .map(_.inputMetrics.recordsRead).getOrElse(0L)
    record(read).foreach(log)
  }
}

object ProgressMeter {
  val stderrLog: String => Unit = s => System.err.println(s"[progress] $s")
}
