package graft

import graft.pipelines.ProgressMeter

/** X3 progress metering: unit contract of the boundary accounting plus a
  * live listener-bus run over a real parquet read.
  */
class ProgressMeterSpec extends SparkSpec {

  test("emits one line per crossed boundary with elapsed time") {
    var t = 0L
    val m = new ProgressMeter(every = 1000L, log = _ => (),
      clock = () => { t += 500000000L; t }) // +0.5 s per observation
    assert(m.record(400) == None)
    assert(m.record(599) == None) // 999 — below the boundary
    val first = m.record(2) // 1001 — crosses 1000
    assert(first.exists(_.startsWith("1,000 rows read (+1,000 in")), first)
    // jumping several boundaries in one task reports the span at once
    val jump = m.record(3500) // 4501 — crosses 2000/3000/4000
    assert(jump.exists(_.startsWith("4,000 rows read (+3,000 in")), jump)
    assert(m.record(0) == None)
    assert(m.record(-5) == None)
    assert(m.totalRows == 4501)
  }

  test("listener counts real input rows from a parquet scan") {
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val meter = new ProgressMeter(every = 1000L, log = seen.add(_))
    spark.sparkContext.addSparkListener(meter)
    try {
      val n = Tables.load(spark, "/root/testdata/sf0.001", "lineitem")
        .count()
      assert(n > 1000, s"need >1000 rows for a boundary, got $n")
      // the listener bus is async — poll until the task-end events drain
      val deadline = System.nanoTime() + 30e9.toLong
      while (meter.totalRows < n && System.nanoTime() < deadline)
        Thread.sleep(50)
      assert(meter.totalRows >= n,
        s"listener saw ${meter.totalRows} of $n rows")
      assert(!seen.isEmpty, "expected at least one progress line")
      val line = seen.peek()
      assert(line.contains("rows read (+"), line)
    } finally spark.sparkContext.removeSparkListener(meter)
  }
}
