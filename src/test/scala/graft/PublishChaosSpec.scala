package graft

import graft.control.{InMemoryJobQueue, JobMessage}
import graft.sources.{GraftCatalog, Loader}
import org.apache.hadoop.fs.{Path => HPath}
import java.nio.file.{Files, Paths}

/** Chaos probe for the exactly-once publish boundary (VERDICT r13 #5):
  * the jobKey rename-publish exists for the window where a WORKER dies
  * AFTER the Spark load completes and BEFORE the queue ack — the queue
  * then redelivers (at-least-once) and the retry must CONVERGE (no
  * duplicate rows, no lost rows) instead of appending a second copy.
  * The kill is injected at the exact state the crash leaves behind:
  * the worker loop's steps are dequeue → process → ack, so "killed
  * before ack" IS "processed, never acked, redelivered" — driven here
  * deterministically at each crash point inside process/publish. */
class PublishChaosSpec extends SparkTestBase {

  private def fixture() = {
    val tmp = Files.createTempDirectory("chaos").toString
    val catalog = new GraftCatalog(spark, s"$tmp/warehouse")
    val loader = new Loader(catalog)
    val file = Paths.get(tmp, "batch.ndjson")
    Files.writeString(file,
      (1 to 50).map(i => s"""{"k": $i, "v": "row$i"}""").mkString("\n"))
    (catalog, loader, file, tmp)
  }

  private def rows(cat: GraftCatalog) = cat.read("db", "t").count()

  test("worker killed between load completion and ack: redelivery converges, no dups") {
    val (catalog, loader, file, _) = fixture()
    val queue = new InMemoryJobQueue
    val id = queue.enqueue(JobMessage.InsertFile("db", "t", file.toString))

    // attempt 1: the worker claims and fully processes the job — the
    // table publish is COMPLETE — then dies before queue.ack(id)
    val Some((jid, JobMessage.InsertFile(db, tbl, path))) = queue.dequeue(1000)
    loader.loadFile(db, tbl, Paths.get(path), Some(s"q$jid"))
    assert(rows(catalog) == 50, "attempt 1 published the batch")
    assert(!queue.isEmpty, "unacked job must remain visible to the queue")
    queue.nack(jid) // the redelivery a crashed claim gets

    // attempt 2: another worker claims the SAME job id and reruns the
    // SAME code path — the keyed republish replaces attempt 1's files
    val Some((jid2, JobMessage.InsertFile(db2, tbl2, path2))) = queue.dequeue(1000)
    assert(jid2 == jid, "queue ids are stable across redelivery")
    loader.loadFile(db2, tbl2, Paths.get(path2), Some(s"q$jid2"))
    queue.ack(jid2)

    assert(rows(catalog) == 50, "redelivered job must not duplicate rows")
    assert(queue.isEmpty)
    // and a DIFFERENT job with the same content is a genuine second
    // batch — keying is per job, not per content
    val id3 = queue.enqueue(JobMessage.InsertFile("db", "t", file.toString))
    val Some((jid3, JobMessage.InsertFile(_, _, p3))) = queue.dequeue(1000)
    loader.loadFile("db", "t", Paths.get(p3), Some(s"q$jid3"))
    queue.ack(jid3)
    assert(rows(catalog) == 100, "distinct job ids append distinct batches")
  }

  test("worker killed MID-publish (files moved, marker never written): retry completes the batch") {
    val (catalog, loader, file, tmp) = fixture()
    loader.loadFile("db", "t", file, Some("q7"))
    assert(rows(catalog) == 50)
    val fs = new HPath(tmp).getFileSystem(spark.sessionState.newHadoopConf())

    // crash point A: every file renamed in, marker PUT never happened —
    // reconstructed by deleting the marker of the completed publish
    val commits = new HPath(s"$tmp/warehouse/db/t/commits")
    val markers = fs.listStatus(commits).map(_.getPath)
    assert(markers.length == 1)
    fs.delete(markers.head, false)
    assert(catalog.committedKeys("db", "t").isEmpty)
    spark.conf.set("graft.warehouse.strictCommits", "true")
    try assert(rows(catalog) == 0,
      "strict readers never see a batch whose marker is missing")
    finally spark.conf.unset("graft.warehouse.strictCommits")

    // crash point B (earlier still): also lose one published file —
    // the partial-batch state a mid-publish kill leaves
    val data = new HPath(s"$tmp/warehouse/db/t/data")
    val part = fs.listStatus(data).map(_.getPath)
      .filter(_.getName.endsWith(".parquet")).head
    fs.delete(part, false)
    assert(rows(catalog) < 50, "the crash left a partial batch")

    // redelivery: same jobKey reruns the load — old partial files are
    // swept, the full batch republishes, the marker commits it
    loader.loadFile("db", "t", file, Some("q7"))
    assert(rows(catalog) == 50, "retry converges to exactly one copy")
    assert(catalog.committedKeys("db", "t").size == 1)
    spark.conf.set("graft.warehouse.strictCommits", "true")
    try assert(rows(catalog) == 50, "the completed publish is marker-committed")
    finally spark.conf.unset("graft.warehouse.strictCommits")
  }

  test("redelivery storm: N sequential redeliveries of one job stay exactly-once") {
    val (catalog, loader, file, _) = fixture()
    (1 to 5).foreach { _ =>
      loader.loadFile("db", "t", file, Some("q-storm"))
      assert(rows(catalog) == 50, "every replay must land on the same 50 rows")
    }
    assert(catalog.committedKeys("db", "t").size == 1)
  }
}
