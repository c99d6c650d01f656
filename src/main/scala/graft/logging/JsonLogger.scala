package graft.logging

import java.io.PrintStream
import java.time.format.DateTimeFormatter
import java.time.{Instant, ZoneOffset}

/** JSON-structured logger — Spark-side twin of the reference
  * `datatoolz.logging.JsonLogger` (logging.py:16-105).
  *
  * Emits one JSON object per line:
  * `{"logger": {"application": ..., "environment": ...}, "level": ...,
  *   "timestamp": "YYYY-MM-DD HH:MM:SS.ffffff", "message": ...,
  *   "extra": {...}}`
  * with `extra` omitted when empty — byte-shape-compatible with the
  * reference emitter (logging.py:41-49).
  *
  * `timed` is the `decorate` twin (logging.py:67-105): wraps a block,
  * logging function name, duration, memory (used-heap delta plus the
  * pool-level heap high-water mark during the block — the tracemalloc
  * current/peak analogue on a JVM), plus static or result-derived
  * extras.
  *
  * Intended for DRIVER-side pipeline orchestration logging. Executors
  * should not construct per-row loggers (that would serialize a
  * PrintStream into tasks); per-row observability belongs in metrics
  * columns, not logs.
  */
class JsonLogger(
    name: Option[String] = None,
    env: Option[String] = None,
    out: PrintStream = System.out,
    clock: () => Instant = () => Instant.now()) {

  import JsonLogger._

  private def emit(level: String, msg: String, extra: Seq[(String, Any)]): Unit = {
    val ts = TsFormat.format(clock().atOffset(ZoneOffset.UTC))
    val base = Seq(
      "logger" -> Map("application" -> name.orNull, "environment" -> env.orNull),
      "level" -> level,
      "timestamp" -> ts,
      "message" -> msg)
    val fields = if (extra.nonEmpty) base :+ ("extra" -> extra) else base
    out.println(render(fields))
  }

  def info(msg: String, extra: (String, Any)*): Unit = emit("info", msg, extra)
  def debug(msg: String, extra: (String, Any)*): Unit = emit("debug", msg, extra)
  def warning(msg: String, extra: (String, Any)*): Unit = emit("warning", msg, extra)
  def error(msg: String, extra: (String, Any)*): Unit = emit("error", msg, extra)

  /** Run `body`, then log `msg` with execution metrics and extras.
    * Derived extras are applied to the result — the callable-extra
    * behavior of the reference decorator (logging.py:95-99). They MUST
    * be marked explicitly with [[JsonLogger.Derived]]: matching on bare
    * `Function1` is a trap (Scala Map/Seq/Set and PartialFunction all
    * extend it), so unmarked values — functions included — are always
    * logged as plain values. */
  def timed[T](
      msg: String,
      function: String = "block",
      duration: Boolean = true,
      memory: Boolean = true,
      extra: Seq[(String, Any)] = Nil)(body: => T): T = {
    val rt = Runtime.getRuntime
    // heap high-water mark via the per-pool peak counters: reset
    // before the block, sum after — a genuine peak like tracemalloc's,
    // not the post-GC used-heap (a block that transiently allocates
    // gigabytes and returns small would otherwise log a tiny "peak").
    // APPROXIMATE by construction: the counters are JVM-global, so
    // concurrent timed() blocks see a shared peak, and summing
    // per-pool peaks taken at different instants can overstate the
    // true instantaneous heap (an Eden peak before a collection plus
    // an Old-gen peak after promotion counts some bytes twice) —
    // errs toward over-reporting, the safe direction for a
    // find-the-hungry-block metric. NESTED blocks reset only at the
    // outermost level (thread-local depth): an inner reset would wipe
    // the outer block's high-water and silently under-report it.
    val heapPools =
      if (memory)
        scala.jdk.CollectionConverters.ListHasAsScala(
          java.lang.management.ManagementFactory.getMemoryPoolMXBeans).asScala
          .filter(_.getType == java.lang.management.MemoryType.HEAP)
      else Nil
    val depth = JsonLogger.timedDepth.get()
    JsonLogger.timedDepth.set(depth + 1)
    if (depth == 0) heapPools.foreach(_.resetPeakUsage())
    val memBefore = if (memory) rt.totalMemory() - rt.freeMemory() else 0L
    val t0 = System.nanoTime()
    val result =
      try body
      finally JsonLogger.timedDepth.set(depth)
    val elapsed = (System.nanoTime() - t0) / 1e9
    val fields = Seq.newBuilder[(String, Any)]
    fields += ("function" -> function)
    if (memory) {
      val memAfter = rt.totalMemory() - rt.freeMemory()
      val peak = heapPools.map(_.getPeakUsage.getUsed).sum
      fields += ("memory" -> Map("current" -> (memAfter - memBefore), "peak" -> peak))
    }
    if (duration) fields += ("duration" -> elapsed)
    extra.foreach {
      case (k, JsonLogger.Derived(f)) =>
        fields += (k -> f(result))
      case kv => fields += kv
    }
    info(msg, fields.result(): _*)
    result
  }
}

object JsonLogger {

  /** Explicit marker for a result-derived extra in [[JsonLogger.timed]]
    * — the ONLY way an extra is applied to the block result. A bare
    * function value would collide with collection types (Map/Seq/Set
    * and PartialFunction all extend Function1), so it is never invoked. */
  final case class Derived(f: Any => Any)

  /** Nesting depth of [[JsonLogger.timed]] on this thread — the peak
    * counters reset only at depth 0 (see the comment at the reset). */
  private[logging] val timedDepth: ThreadLocal[Int] =
    ThreadLocal.withInitial(() => 0)

  private val TsFormat = DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss.SSSSSS")

  /** Minimal deterministic JSON rendering (insertion-ordered objects;
    * strings, numbers, booleans, null, Map/Seq recursion). */
  private[logging] def render(value: Any): String = value match {
    case null => "null"
    case None => "null"
    case Some(v) => render(v)
    case s: String => quote(s)
    case b: Boolean => b.toString
    case d: Double => if (d.isNaN || d.isInfinite) quote(d.toString) else d.toString
    case f: Float => render(f.toDouble)
    case n: Number => n.toString
    case m: Map[_, _] =>
      m.map { case (k, v) => s"${quote(k.toString)}: ${render(v)}" }.mkString("{", ", ", "}")
    case kvs: Seq[_] if kvs.forall(_.isInstanceOf[(_, _)]) && kvs.nonEmpty =>
      kvs.map { case (k, v) => s"${quote(k.toString)}: ${render(v)}" }.mkString("{", ", ", "}")
    case xs: Seq[_] => xs.map(render).mkString("[", ", ", "]")
    case xs: Array[_] => render(xs.toSeq)
    case other => quote(other.toString)
  }

  /** The ONE JSON string escaper — Verify and Bench reuse it so the
    * escape coverage can't drift between the three emitters. */
  def quote(s: String): String = "\"" + s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""
}
