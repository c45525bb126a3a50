package graft.control

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.{DoubleAdder, LongAdder}

/** Prometheus-style request metrics (the reference wires promhttp and
  * wraps its query/insert handlers in duration histograms —
  * /root/reference/pkg/api/router.go:37, pkg/api/data.go:20-30).
  * Counters per (route, code) plus a cumulative-bucket duration
  * histogram per route, rendered in the text exposition format. Route
  * labels are normalized path classes, so cardinality stays bounded no
  * matter what paths clients probe. */
final class Metrics {
  private val buckets =
    Array(0.005, 0.01, 0.025, 0.05, 0.1, 0.25, 0.5, 1.0, 2.5, 5.0, 10.0, 30.0)

  private final class Histo {
    val bucketCounts = Array.fill(buckets.length)(new LongAdder)
    val sum = new DoubleAdder
    val count = new LongAdder
    def observe(seconds: Double): Unit = {
      var i = 0
      while (i < buckets.length) {
        if (seconds <= buckets(i)) bucketCounts(i).increment()
        i += 1
      }
      sum.add(seconds); count.increment()
    }
  }

  private val requests = new ConcurrentHashMap[(String, Int), LongAdder]()
  private val durations = new ConcurrentHashMap[String, Histo]()

  def record(route: String, code: Int, seconds: Double): Unit = {
    requests.computeIfAbsent((route, code), _ => new LongAdder).increment()
    durations.computeIfAbsent(route, _ => new Histo).observe(seconds)
  }

  /** Prometheus text exposition format (version 0.0.4). */
  def render(): String = {
    val sb = new StringBuilder
    sb.append("# HELP graft_requests_total HTTP requests by route and status code\n")
    sb.append("# TYPE graft_requests_total counter\n")
    requests.entrySet().stream().sorted((a, b) => a.getKey.toString.compareTo(b.getKey.toString))
      .forEach { e =>
        val (route, code) = e.getKey
        sb.append(s"""graft_requests_total{route="$route",code="$code"} ${e.getValue.sum()}""")
        sb.append('\n')
      }
    sb.append("# HELP graft_request_duration_seconds HTTP request latency by route\n")
    sb.append("# TYPE graft_request_duration_seconds histogram\n")
    durations.entrySet().stream().sorted((a, b) => a.getKey.compareTo(b.getKey))
      .forEach { e =>
        val route = e.getKey
        val h = e.getValue
        buckets.indices.foreach { i =>
          sb.append(s"""graft_request_duration_seconds_bucket{route="$route",le="${buckets(i)}"} ${h.bucketCounts(i).sum()}""")
          sb.append('\n')
        }
        sb.append(s"""graft_request_duration_seconds_bucket{route="$route",le="+Inf"} ${h.count.sum()}""")
        sb.append('\n')
        sb.append(s"""graft_request_duration_seconds_sum{route="$route"} ${h.sum.sum()}""")
        sb.append('\n')
        sb.append(s"""graft_request_duration_seconds_count{route="$route"} ${h.count.sum()}""")
        sb.append('\n')
      }
    sb.toString
  }
}

object Metrics {
  /** Bounded-cardinality route class for a request path. */
  def routeOf(path: String): String =
    if (path == "/healthcheck") "health"
    else if (path == "/metrics") "metrics"
    else if (path == "/dashboard") "dashboard"
    else if (path == "/login" || path == "/logout" ||
      path.startsWith("/oauth/")) "auth"
    else if (path.startsWith("/share/")) "share_data"
    else if (path.startsWith("/api/data/insert/")) "insert"
    else if (path == "/api/data/query") "query"
    else if (path == "/api/data/copy") "copy"
    else if (path == "/api/data/query/share") "share_create"
    else if (path.startsWith("/api/tables")) "tables"
    else if (path.startsWith("/api/destinations")) "destinations"
    else if (path.startsWith("/api/connections")) "connections"
    else "other"
}
