package graft.functions

import com.fasterxml.jackson.core.{JsonFactory, JsonParser, JsonToken}
import java.io.StringWriter

/** Minimal JSON AST for the flatteners / type lattice.
  *
  * Preserves object field order and the *raw* text of numbers — the
  * reference decides int-vs-float by attempting a 64-bit integer parse
  * of the raw token (/root/reference/pkg/util/types.go:45-50), which is
  * lossy to replicate from a parsed double.
  */
sealed trait JValue
object JValue {
  case object JNull extends JValue
  final case class JBool(value: Boolean) extends JValue
  /** raw is the literal number token, e.g. "1", "2.5", "1e3". */
  final case class JNum(raw: String) extends JValue
  final case class JStr(value: String) extends JValue
  final case class JArr(items: Vector[JValue]) extends JValue
  final case class JObj(fields: Vector[(String, JValue)]) extends JValue {
    def get(key: String): Option[JValue] = fields.find(_._1 == key).map(_._2)
    def prepended(key: String, v: JValue): JObj = JObj((key -> v) +: fields)
  }

  private val factory = new JsonFactory()

  def parse(s: String): JValue = {
    val p = factory.createParser(s)
    try { p.nextToken(); readValue(p) } finally p.close()
  }

  def parseObject(s: String): JObj = parse(s) match {
    case o: JObj => o
    case other   => throw new IllegalArgumentException(
      s"expected JSON object, got ${other.getClass.getSimpleName}")
  }

  private def readValue(p: JsonParser): JValue = p.currentToken() match {
    case JsonToken.START_OBJECT =>
      val b = Vector.newBuilder[(String, JValue)]
      while (p.nextToken() != JsonToken.END_OBJECT) {
        val name = p.currentName()
        p.nextToken()
        b += name -> readValue(p)
      }
      JObj(b.result())
    case JsonToken.START_ARRAY =>
      val b = Vector.newBuilder[JValue]
      while (p.nextToken() != JsonToken.END_ARRAY) b += readValue(p)
      JArr(b.result())
    case JsonToken.VALUE_STRING => JStr(p.getText)
    case JsonToken.VALUE_NUMBER_INT | JsonToken.VALUE_NUMBER_FLOAT => JNum(p.getText)
    case JsonToken.VALUE_TRUE  => JBool(true)
    case JsonToken.VALUE_FALSE => JBool(false)
    case JsonToken.VALUE_NULL  => JNull
    case t => throw new IllegalArgumentException(s"unexpected token $t")
  }

  /** Compact serialization (stable field order as stored). */
  def render(v: JValue): String = {
    val sw = new StringWriter()
    val g = factory.createGenerator(sw)
    def go(v: JValue): Unit = v match {
      case JNull        => g.writeNull()
      case JBool(b)     => g.writeBoolean(b)
      case JNum(raw)    => g.writeRawValue(raw)
      case JStr(s)      => g.writeString(s)
      case JArr(items)  => g.writeStartArray(); items.foreach(go); g.writeEndArray()
      case JObj(fields) =>
        g.writeStartObject()
        fields.foreach { case (k, fv) => g.writeFieldName(k); go(fv) }
        g.writeEndObject()
    }
    go(v)
    g.close()
    sw.toString
  }

  def isValid(s: String): Boolean =
    try { parse(s); true } catch { case _: Exception => false }
}
