package graft.observability

import org.slf4j.LoggerFactory

/** Structured logging + metrics surface (O1, mirrors
  * `src/iceberg_loader/services/logging.py:61-159`): TEXT or JSON line
  * formatting, a `metrics(name, extra)` info channel, and a
  * `suppressAndWarn` guard for best-effort maintenance paths
  * (`services/logging.py:67-74` — failures logged, never raised).
  *
  * Driver-side only by design: engine orchestration (commits, flushes,
  * maintenance) happens on the driver; executor-side work is plain
  * Spark and uses Spark's own logging.
  */
object Log {

  sealed trait Format
  case object Text extends Format
  case object Json extends Format

  @volatile var format: Format = Text

  private val logger = LoggerFactory.getLogger("graft")

  private def esc(s: String): String = s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }

  /** Render a message + fields in the active format. Exposed for tests. */
  private[graft] def render(level: String, msg: String, fields: Seq[(String, Any)]): String =
    format match {
      case Text =>
        val kv = fields.map { case (k, v) => s"$k=$v" }.mkString(" ")
        if (kv.isEmpty) msg else s"$msg $kv"
      case Json =>
        val kv = (Seq("level" -> level, "message" -> msg) ++ fields.map {
          case (k, v) => k -> String.valueOf(v)
        }).map { case (k, v) => s""""${esc(k)}":"${esc(v)}"""" }
        kv.mkString("{", ",", "}")
    }

  def info(msg: String, fields: (String, Any)*): Unit =
    logger.info(render("INFO", msg, fields))

  def warn(msg: String, fields: (String, Any)*): Unit =
    logger.warn(render("WARNING", msg, fields))

  /** Metrics channel (`services/logging.py:61-64`): an info-level record
    * named `metric:<name>` carrying the measurement fields.
    */
  def metrics(name: String, extra: (String, Any)*): Unit =
    logger.info(render("INFO", s"metric:$name", extra))

  /** Run `body`, converting any exception into a warning — the
    * reference's `suppress_and_warn` context manager. Returns None on
    * failure.
    */
  def suppressAndWarn[T](context: String)(body: => T): Option[T] =
    try Some(body)
    catch {
      case e: Exception =>
        warn(s"$context failed", "error" -> e.toString)
        None
    }
}
