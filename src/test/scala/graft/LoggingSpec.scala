package graft

import java.io.{ByteArrayOutputStream, PrintStream}
import java.time.Instant

import org.json4s._
import org.json4s.jackson.JsonMethods
import org.scalatest.funsuite.AnyFunSuite

import graft.logging.JsonLogger

/** JsonLogger parity with the reference shape (logging.py:41-49) and
  * decorate metrics (logging.py:67-105, tests/test_logging.py). */
class LoggingSpec extends AnyFunSuite {

  private def capture(f: JsonLogger => Unit): Seq[JValue] = {
    val buf = new ByteArrayOutputStream()
    val logger = new JsonLogger(Some("my-app"), Some("prod"),
      new PrintStream(buf, true, "UTF-8"),
      clock = () => Instant.parse("2026-01-02T03:04:05.123456Z"))
    f(logger)
    buf.toString("UTF-8").linesIterator.map(JsonMethods.parse(_)).toSeq
  }

  test("info log matches the reference JSON shape") {
    val Seq(j) = capture(_.info("hello"))
    assert(j \ "logger" \ "application" === JString("my-app"))
    assert(j \ "logger" \ "environment" === JString("prod"))
    assert(j \ "level" === JString("info"))
    assert(j \ "message" === JString("hello"))
    assert(j \ "timestamp" === JString("2026-01-02 03:04:05.123456"))
    // extra omitted when empty (logging.py:47-48)
    assert(j \ "extra" === JNothing)
  }

  test("extra fields are nested under extra; error level") {
    val Seq(j) = capture(_.error("boom", "code" -> 500, "detail" -> "bad"))
    assert(j \ "level" === JString("error"))
    assert(j \ "extra" \ "code" === JInt(500))
    assert(j \ "extra" \ "detail" === JString("bad"))
  }

  test("null application/environment render as JSON null") {
    val buf = new ByteArrayOutputStream()
    new JsonLogger(out = new PrintStream(buf, true, "UTF-8")).info("x")
    val j = JsonMethods.parse(buf.toString("UTF-8"))
    assert(j \ "logger" \ "application" === JNull)
    assert(j \ "logger" \ "environment" === JNull)
  }

  test("timed logs function, duration, memory, and derived extras") {
    var out = 0
    val Seq(j) = capture { lg =>
      out = lg.timed("done", function = "work",
        extra = Seq(
          "rows" -> JsonLogger.Derived(r => r.asInstanceOf[Int] * 10),
          "bare_fn" -> ((r: Any) => r.asInstanceOf[Int] + 1),
          "tags" -> Seq("a", "b"), // collections extend Function1: stay values
          "partial" -> ({ case 1 => "one" }: PartialFunction[Any, String]),
          "attrs" -> Map("k" -> 1),
          "static" -> "tag")) { 42 }
    }
    assert(out === 42) // result passes through
    assert(j \ "extra" \ "function" === JString("work"))
    assert((j \ "extra" \ "duration").isInstanceOf[JDouble])
    assert((j \ "extra" \ "memory" \ "peak").isInstanceOf[JInt])
    assert(j \ "extra" \ "rows" === JInt(420)) // derived from result
    // unmarked functions (and PartialFunction) are VALUES, never applied
    // — only the explicit Derived wrapper derives from the result
    assert((j \ "extra" \ "bare_fn").isInstanceOf[JString])
    assert((j \ "extra" \ "partial").isInstanceOf[JString])
    assert(j \ "extra" \ "tags" === JArray(List(JString("a"), JString("b"))))
    assert(j \ "extra" \ "attrs" \ "k" === JInt(1))
    assert(j \ "extra" \ "static" === JString("tag"))
  }

  test("timed memory peak is a high-water mark, not post-GC used-heap") {
    // hold 256 MB live inside the block: at some instant used-heap is
    // >= 256 MB, so a true pool-peak must report at least that even if
    // the block returns nothing and GC reclaims the array afterwards
    val Seq(j) = capture { lg =>
      lg.timed("alloc", function = "alloc") {
        val a = new Array[Byte](256 * 1024 * 1024)
        a(a.length - 1) = 1
        a(0) // keep `a` live to the end of the block
      }
    }
    val peak = (j \ "extra" \ "memory" \ "peak") match {
      case JInt(v) => v.toLong
      case JLong(v) => v
      case other => fail(s"no numeric peak: $other")
    }
    assert(peak >= 256L * 1024 * 1024)
  }

  test("timed can disable duration and memory") {
    val Seq(j) = capture(_.timed("done", duration = false, memory = false)(1))
    assert(j \ "extra" \ "duration" === JNothing)
    assert(j \ "extra" \ "memory" === JNothing)
    assert(j \ "extra" \ "function" === JString("block"))
  }

  test("control characters and quotes are escaped") {
    val Seq(j) = capture(_.info("line\nbreak \"quoted\"\ttab"))
    assert(j \ "message" === JString("line\nbreak \"quoted\"\ttab"))
  }
}
