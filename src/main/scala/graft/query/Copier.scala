package graft.query

import graft.functions.TypeLattice
import graft.sources.{GraftCatalog, JdbcDestination}
import org.apache.spark.sql.types._

/** Cross-destination copy/ETL (SURVEY §2A A12,
  * /root/reference/pkg/workers/copier.go:14-79): run a query on the
  * source, create table + columns on the destination, load the result.
  * The reference streams NDJSON through ≤50 MB chunks because its
  * backends load files; one distributed `df.write` replaces the whole
  * chunk pipeline — no intermediate files at any scale.
  */
/** @param catalogFor per-source-database catalog resolver (the server's
  * session pool): copies for different source dbs run in different
  * SparkSessions, so their same-named temp views can never collide when
  * multiple copy jobs run concurrently on the worker pool.
  * @param destInfo (dest_type, url) resolver from the destination
  * registry; either side of a copy may be a federated `jdbc`
  * destination — the reference's Copier moves data between arbitrary
  * backend engines the same way (pkg/workers/copier.go). */
final class Copier(catalogFor: String => GraftCatalog,
                   destInfo: String => (String, String) = _ => ("spark", "")) {

  /** @param jobKey idempotency key for the Spark-side destination
    * publish — worker-driven copies pass their queue job id so a
    * retried copy republishes its result instead of duplicating it
    * (see [[GraftCatalog.append]]; jdbc destinations keep the
    * at-least-once baseline, same as the reference's backends). */
  def copy(sourceDb: String, query: String, destDb: String, destTable: String,
           jobKey: Option[String] = None): Long = {
    val cat = catalogFor(sourceDb)
    val df = destInfo(sourceDb) match {
      case ("jdbc", url) => new JdbcDestination(cat.spark, url).query(query)
      case _ =>
        cat.registerViews(sourceDb)
        QueryService.query(cat.spark, query)
    }
    destInfo(destDb) match {
      case ("jdbc", url) =>
        val jd = new JdbcDestination(cat.spark, url)
        jd.append(destTable, df)
        jd.count(destTable)
      case _ =>
        val types = df.schema.fields
          .map(f => f.name -> TypeLattice.fromSparkType(f.dataType)).toMap
        cat.ensureTable(destDb, destTable)
        cat.addColumns(destDb, destTable, types)
        cat.append(destDb, destTable, df, jobKey)
        cat.read(destDb, destTable).count()
    }
  }
}
