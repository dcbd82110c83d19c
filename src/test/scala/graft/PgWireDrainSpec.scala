package graft.sources.pgwire

import java.nio.ByteBuffer

import org.scalatest.funsuite.AnyFunSuite

/** The send-failure drain (round-15 ADVICE fix): when a write fails, the
  * server's parting bytes may LEAD with NoticeResponses before the
  * buffered FATAL — the drain must skip chatter and find the 'E', and
  * must give up cleanly (null → generic 08006 path) when the buffer
  * holds no error. Pure-function coverage; the live 57P01 surfacing is
  * PgLiveSpec's backend-kill test. */
class PgWireDrainSpec extends AnyFunSuite {

  private val fatal =
    new PgWire.PgServerException("FATAL", "57P01",
      "terminating connection due to administrator command")

  private def parse(b: ByteBuffer): PgWire.PgServerException = fatal

  private def feed(msgs: (Char, String)*): () => (Byte, ByteBuffer) = {
    val it = msgs.iterator
    () =>
      if (it.hasNext) {
        val (t, body) = it.next()
        (t.toByte, ByteBuffer.wrap(body.getBytes("UTF-8")))
      } else throw new java.io.EOFException("drained past the buffer")
  }

  test("a NoticeResponse ahead of the FATAL does not mask it") {
    val got = PgWire.drainPendingError(
      feed('N' -> "WARNING: shutting down", 'E' -> "fatal"), parse)
    assert(got eq fatal)
  }

  test("several non-error messages ahead of the FATAL are skipped") {
    val got = PgWire.drainPendingError(
      feed('N' -> "a", 'S' -> "b", 'N' -> "c", 'E' -> "fatal"), parse)
    assert(got eq fatal)
  }

  test("an immediate ErrorResponse is found (the pre-fix fast path)") {
    assert(PgWire.drainPendingError(feed('E' -> "fatal"), parse) eq fatal)
  }

  test("a dead buffer (immediate read failure) yields null, not a throw") {
    assert(PgWire.drainPendingError(feed(), parse) == null)
  }

  test("chatter with no error behind it yields null within the hop bound") {
    val endless = () => ('N'.toByte, ByteBuffer.wrap(Array[Byte]()))
    assert(PgWire.drainPendingError(endless, parse) == null,
      "an all-notice buffer must terminate at maxHops and fall back to 08006")
  }

  test("a read failure mid-chatter yields null") {
    assert(PgWire.drainPendingError(feed('N' -> "a"), parse) == null)
  }
}
