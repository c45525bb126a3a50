package graft.tools

import org.apache.spark.sql.SparkSession

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.util.concurrent.atomic.LongAdder

/** Sustained end-to-end ingest throughput record: concurrent HTTP
  * clients POST JSON batches at the gateway for a fixed window, then
  * the probe waits for the rotation → blob → job-queue → bulk-load
  * pipeline to drain and the rows to become QUERYABLE, reporting both
  * the gateway accept rate and the true insert-to-queryable rate.
  *
  * args: [durationSec=30] [clients=8] [batchRows=500]
  *
  * What is measured (one JSON line on stdout):
  *   accept_rows_per_s — rows acknowledged by POST /api/data/insert
  *                       during the fire window (gateway + flatten +
  *                       snowflake + NDJSON sink write path)
  *   e2e_rows_per_s    — total rows / (fire window + drain), where
  *                       drain ends when SELECT count(*) over the
  *                       target table reports every accepted row
  *   drain_sec         — rotation/queue lag after the last POST: how
  *                       far "queryable" trails "accepted" under load
  *                       (bounded by sink maxAgeSeconds + load jobs)
  */
object IngestProbe {
  def main(args: Array[String]): Unit = {
    val durationSec = args.headOption.map(_.toInt).getOrElse(30)
    val clients = args.lift(1).map(_.toInt).getOrElse(8)
    val batchRows = args.lift(2).map(_.toInt).getOrElse(500)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val root = java.nio.file.Files.createTempDirectory("graft-ingest-probe").toString
    // 1s sink age: the probe measures pipeline drain, not the timer;
    // production default (10s) just shifts drain_sec by the age bound.
    val srv = new graft.api.GraftServer(spark, root, workerCount = 4,
      sinkMaxAgeSeconds = 1)
    srv.addApiKey("probekey", "default")
    val port = srv.start()
    val base = s"http://localhost:$port"
    val http = HttpClient.newHttpClient()

    // one pre-built batch body per client (distinct literals so the
    // type lattice sees consistent types; nested object exercises the
    // horizontal flatten path every row)
    def batchBody(client: Int): String = {
      val rows = (0 until batchRows).map { i =>
        s"""{"user":"u${client}_$i","event":"click","amount":${i % 97}.25,
           |"ok":true,"meta":{"src":"probe","shard":$client},
           |"tags":["a","b"]}""".stripMargin.replace("\n", "")
      }
      rows.mkString("[", ",", "]")
    }

    val accepted = new LongAdder
    val posts = new LongAdder
    val errors = new LongAdder
    val deadline = System.nanoTime() + durationSec * 1000000000L
    val threads = (0 until clients).map { c =>
      val body = batchBody(c)
      val req = HttpRequest.newBuilder(URI.create(
          s"$base/api/data/insert/ingest_bench?api_key=probekey&flatten=horizontal"))
        .POST(HttpRequest.BodyPublishers.ofString(body)).build()
      new Thread(() => {
        while (System.nanoTime() < deadline) {
          val r = http.send(req, HttpResponse.BodyHandlers.ofString())
          posts.increment()
          if (r.statusCode() == 200) accepted.add(batchRows.toLong)
          else errors.increment()
        }
      }, s"ingest-client-$c")
    }
    val t0 = System.nanoTime()
    threads.foreach(_.start())
    threads.foreach(_.join())
    val fireSec = (System.nanoTime() - t0) / 1e9
    val sent = accepted.sum()
    System.err.println(f"[probe] fire window done: $sent rows accepted in " +
      f"$fireSec%.1f s (${posts.sum()} posts, ${errors.sum()} errors)")

    // drain: poll queryable count until it reaches `sent`
    def queryable(): Long =
      try {
        val q = java.net.URLEncoder.encode(
          "select count(*) as n from ingest_bench", "UTF-8")
        val r = http.send(HttpRequest.newBuilder(URI.create(
            s"$base/api/data/query?api_key=probekey&format=ndjson&query=$q")).GET().build(),
          HttpResponse.BodyHandlers.ofString())
        if (r.statusCode() != 200) -1L
        else "\"n\"\\s*:\\s*(\\d+)".r.findFirstMatchIn(r.body())
          .map(_.group(1).toLong).getOrElse(-1L)
      } catch { case _: Exception => -1L }
    val tDrain0 = System.nanoTime()
    var visible = queryable()
    while (visible < sent &&
           (System.nanoTime() - tDrain0) < 300L * 1000000000L) {
      Thread.sleep(500)
      visible = queryable()
    }
    val drainSec = (System.nanoTime() - tDrain0) / 1e9
    require(visible == sent,
      s"drain timeout: $visible of $sent rows queryable after ${drainSec}s")
    val e2eSec = fireSec + drainSec
    println(f"""{"metric":"ingest_e2e","accepted_rows":$sent,"fire_sec":$fireSec%.1f,"drain_sec":$drainSec%.1f,"accept_rows_per_s":${sent / fireSec}%.0f,"e2e_rows_per_s":${sent / e2eSec}%.0f,"clients":$clients,"batch_rows":$batchRows}""")
    srv.stop()
    spark.stop()
  }
}
