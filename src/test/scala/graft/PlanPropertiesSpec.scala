package graft

import graft.sources.NdjsonSink
import java.nio.file.Files

/** Guards on the physical-plan properties the scale story depends on:
  * filters/columns reach the parquet scan, small dims broadcast, and
  * the concurrent ingest path stays consistent. */
class PlanPropertiesSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  test("q_scan_filter pushes predicates and prunes columns at the scan") {
    val df = SparkEntry.queries("q_scan_filter")(spark, dir)
    val scan = df.queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters:"), "no pushed filters in plan")
    assert(scan.contains("LessThan(l_shipdate") || scan.contains("l_shipdate"),
      s"shipdate filter not pushed:\n$scan")
    val readSchema = scan.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!readSchema.contains("l_comment") && !readSchema.contains("l_tax"),
      s"column pruning failed: $readSchema")
  }

  test("q_join_multiway broadcasts the nation dim") {
    val df = SparkEntry.queries("q_join_multiway")(spark, dir)
    df.collect() // force AQE final plan
    // AQE wraps exchanges in query stages, so match on the rendered plan
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast joins:\n$plan")
  }

  test("ndjson sink is safe under concurrent writers") {
    val tmp = Files.createTempDirectory("graft-conc").toString
    val sink = new NdjsonSink(tmp, maxRows = 100000)
    val threads = (1 to 8).map { t =>
      new Thread(() => (1 to 500).foreach { i =>
        sink.writeData("db", s"t${t % 2}", s"""{"t": $t, "i": $i}""")
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    val closed = sink.flushAll()
    assert(closed.map(_.rows).sum == 4000)
    // every line is intact JSON (no interleaved writes)
    closed.foreach { cf =>
      Files.readAllLines(cf.path).forEach { line =>
        assert(graft.functions.JValue.isValid(line), s"corrupt line: $line")
      }
    }
  }
}
