package graft.sources

import graft.functions.{JValue, Snowflake}
import graft.functions.JValue._
import graft.operators.Flatten

/** Insert-request handling (SURVEY §2A A13,
  * /root/reference/pkg/api/data.go:111-192): validate JSON, accept one
  * object or an array of objects, flatten per the chosen mode, inject
  * a snowflake __row_id when absent, and append each resulting line to
  * the data sink. Per-item error accounting mirrors the reference's
  * partial-failure semantics (207-ish: some inserted, some failed).
  */
final class Ingest(sink: NdjsonSink, snowflake: Snowflake = Snowflake.default) {

  import Ingest._

  def insert(database: String, table: String, body: String,
             mode: FlattenMode = FlattenMode.Horizontal): InsertResult = {
    val parsed =
      try JValue.parse(body)
      catch { case e: Exception => return InsertResult(0, 1, Seq(s"invalid JSON: ${e.getMessage}")) }

    val items: Seq[JValue] = parsed match {
      case JArr(items) => items
      case o: JObj     => Seq(o)
      case _           => return InsertResult(0, 1, Seq("body must be a JSON object or array of objects"))
    }

    var ok = 0
    val errors = Seq.newBuilder[String]
    items.foreach { item =>
      try {
        val json = JValue.render(item)
        val rows = mode match {
          case FlattenMode.Horizontal => Flatten.horizontal(table, json)
          case FlattenMode.Vertical   => Flatten.vertical(table, json)
          case FlattenMode.MultiTable => Flatten.multiTable(table, json)
        }
        rows.foreach { r =>
          val withId = r.row.get("__row_id") match {
            case Some(_) => r.row
            case None    => r.row.prepended("__row_id", JNum(snowflake.next().toString))
          }
          sink.writeData(database, r.table, JValue.render(withId))
        }
        ok += 1
      } catch { case e: Exception => errors += e.getMessage }
    }
    val errs = errors.result()
    InsertResult(ok, errs.size, errs)
  }
}

object Ingest {
  sealed trait FlattenMode
  object FlattenMode {
    case object Horizontal extends FlattenMode
    case object Vertical extends FlattenMode
    case object MultiTable extends FlattenMode
    /** ?flatten= query-param dispatch (data.go:119-124). */
    def fromParam(p: String): FlattenMode = p match {
      case "vertical"   => Vertical
      case "multitable" => MultiTable
      case _            => Horizontal
    }
  }
  final case class InsertResult(inserted: Int, failed: Int, errors: Seq[String]) {
    /** Reference returns 200 on success, error status on any failure. */
    def fullySucceeded: Boolean = failed == 0
  }
}
