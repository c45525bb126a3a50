package graft.functions

import java.security.SecureRandom
import java.util.concurrent.atomic.AtomicLong

/** Snowflake ids (time-ordered, unique across restarts) matching the
  * reference's generator semantics (/root/reference/pkg/util/util.go:9-29,
  * bwmarrin/snowflake layout): 41-bit ms timestamp since the twepoch,
  * 10-bit node id (reference seeds it from the hashed hostname), 12-bit
  * per-ms sequence. monotonically_increasing_id() is NOT a substitute —
  * it changes across runs (SURVEY §1.3).
  */
final class Snowflake(nodeId: Long) {
  require(nodeId >= 0 && nodeId < 1024, "node id must fit 10 bits")
  private val epoch = 1288834974657L // bwmarrin/snowflake default twepoch
  private val state = new AtomicLong(0L) // (ms << 12) | seq

  def next(): Long = {
    while (true) {
      val now = System.currentTimeMillis()
      val prev = state.get()
      val prevMs = prev >>> 12
      val cand =
        if (now > prevMs) now << 12
        else if ((prev & 0xfffL) < 0xfffL) prev + 1
        else (prevMs + 1) << 12 // sequence exhausted: spin into next ms
      if (state.compareAndSet(prev, cand))
        return (((cand >>> 12) - epoch) << 22) | (nodeId << 12) | (cand & 0xfffL)
    }
    0L // unreachable
  }
}

object Snowflake {
  /** Node id from hashed hostname, as the reference does. */
  lazy val defaultNodeId: Int = {
    val host = try java.net.InetAddress.getLocalHost.getHostName
    catch { case _: Exception => "localhost" }
    (math.abs(host.hashCode.toLong) % 1024).toInt
  }
  lazy val default: Snowflake = new Snowflake(defaultNodeId)
}

/** ULIDs (Crockford base32, 26 chars: 48-bit ms time + 80-bit random),
  * as used for the vertical flattener's ___document_id
  * (/root/reference/pkg/api/flattener.go:123).
  */
object Ulid {
  private val alphabet = "0123456789ABCDEFGHJKMNPQRSTVWXYZ"
  private val rng = new SecureRandom()

  def make(): String = make(System.currentTimeMillis(), null)

  /** Deterministic variant for tests: fixed time + caller randomness. */
  def make(timeMs: Long, randomness: Array[Byte]): String = {
    val rand = if (randomness != null) randomness else {
      val b = new Array[Byte](10); rng.nextBytes(b); b
    }
    require(rand.length == 10, "ulid randomness must be 10 bytes")
    val sb = new StringBuilder(26)
    // 48-bit time, 10 chars of 5 bits (MSB first, 2 leading zero bits)
    var i = 9
    while (i >= 0) { sb.append(alphabet(((timeMs >>> (i * 5)) & 0x1f).toInt)); i -= 1 }
    // 80-bit randomness, 16 chars
    var acc = 0L; var bits = 0
    rand.foreach { b =>
      acc = (acc << 8) | (b & 0xff); bits += 8
      while (bits >= 5) { sb.append(alphabet(((acc >>> (bits - 5)) & 0x1f).toInt)); bits -= 5 }
    }
    sb.toString
  }
}
