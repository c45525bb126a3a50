package graft.query

import graft.functions.TypeLattice
import graft.sources.GraftCatalog
import org.apache.spark.sql.types._

/** Cross-destination copy/ETL (SURVEY §2A A12,
  * /root/reference/pkg/workers/copier.go:14-79): run a query on the
  * source, create table + columns on the destination, load the result.
  * The reference streams NDJSON through ≤50 MB chunks because its
  * backends load files; one distributed `df.write` replaces the whole
  * chunk pipeline — no intermediate files at any scale.
  */
final class Copier(catalog: GraftCatalog) {

  def copy(sourceDb: String, query: String, destDb: String, destTable: String): Long = {
    catalog.registerViews(sourceDb)
    val df = QueryService.query(catalog.spark, query)
    val types = df.schema.fields
      .map(f => f.name -> TypeLattice.fromSparkType(f.dataType)).toMap
    catalog.ensureTable(destDb, destTable)
    catalog.addColumns(destDb, destTable, types)
    catalog.append(destDb, destTable, df)
    catalog.read(destDb, destTable).count()
  }
}
