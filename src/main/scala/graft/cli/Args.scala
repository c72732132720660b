package graft.cli

/**
 * `--key value` argument parser with the reference's validation behavior
 * (SURVEY.md D1, `CopyRow.java:45-98` / `CorruptRowsMR.java:187-225`):
 * even arity, unknown flag → usage + exit 1, mandatory-parameter checks
 * with specific messages. One deliberate deviation, documented in §7.4:
 * failures exit non-zero instead of being swallowed.
 */
object Args {

  final case class Parsed(values: Map[String, String]) {
    def get(key: String): Option[String] = values.get(key)
    def required(key: String, usage: String): String =
      values.getOrElse(key, die(s"mandatory parameter missing: --$key", usage))
    def bool(key: String, default: Boolean): Boolean =
      values.get(key).map(_.toBoolean).getOrElse(default)
    def long(key: String, default: Long): Long =
      values.get(key).map(_.toLong).getOrElse(default)
  }

  def die(message: String, usage: String): Nothing = {
    System.err.println(s"error: $message")
    System.err.println(usage)
    throw new CliExit(1)
  }

  /** Raised instead of calling sys.exit so tests can observe the code. */
  final class CliExit(val code: Int) extends RuntimeException(s"exit $code")

  def parse(args: Array[String], known: Set[String], usage: String): Parsed = {
    if (args.length % 2 != 0)
      die("flags must come in --key value pairs", usage)
    val pairs = args.grouped(2).map {
      case Array(k, v) =>
        if (!k.startsWith("--")) die(s"expected a --flag, got '$k'", usage)
        val key = k.drop(2)
        if (!known.contains(key)) die(s"unknown parameter: --$key", usage)
        key -> v
    }.toMap
    Parsed(pairs)
  }

  /** main() wrapper: map CliExit to a process exit code. */
  def runMain(body: => Unit): Unit =
    try body
    catch { case e: CliExit => sys.exit(e.code) }
}
