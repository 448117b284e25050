package graft.util

import org.slf4j.LoggerFactory

/** GitHub-Actions-style observability (actions.py): `::group::`
  * fencing with a no-nesting guard, and `::warning::`-formatted
  * warnings with a typed category — kept as log events so tests can
  * assert on categories (SURVEY.md §2.14).
  */
object Actions {

  private val log = LoggerFactory.getLogger("graft.actions")
  private val current = new ThreadLocal[String]

  /** Warning taxonomy mirrored from the reference. */
  sealed trait Category { def name: String = getClass.getSimpleName.stripSuffix("$") }
  case object StatusCodeWarning extends Category
  case object SlowQueryWarning extends Category
  case object LimitWarning extends Category

  final case class Emitted(category: String, message: String)
  // last warnings ring for test assertions (bounded)
  private val recent = new java.util.concurrent.ConcurrentLinkedDeque[Emitted]()

  /** actions.py:14-27 — groups cannot nest (GHA renders them flat). */
  def logGroup[T](name: String)(body: => T): T = {
    val existing = current.get()
    if (existing != null)
      throw new IllegalStateException(s"Can't nest '$name' log group inside '$existing'")
    current.set(name)
    log.info(s"::group::$name")
    try body
    finally {
      log.info("::endgroup::")
      current.remove()
    }
  }

  /** actions.py:30-44 — `::warning::` with category title. */
  def warn(message: String, category: Category): Unit = {
    log.warn(s"::warning title=${category.name}::$message")
    recent.addLast(Emitted(category.name, message))
    while (recent.size() > 100) recent.pollFirst()
  }

  def recentWarnings(): Seq[Emitted] = {
    val it = recent.iterator()
    val b = Seq.newBuilder[Emitted]
    while (it.hasNext) b += it.next()
    b.result()
  }
}
