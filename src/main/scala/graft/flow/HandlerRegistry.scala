package graft.flow

import scala.collection.concurrent.TrieMap

/** Versioned handler registry (SURVEY.md §2.1 O20-O21, O26).
  *
  * In the reference, deploying a worker *is* registration: subscribing
  * creates a versioned queue whose name is later discovered over the
  * broker's management API and semver-matched
  * (`lib/distribot/phase_started_handler.rb:45-67`,
  * `lib/distribot/worker.rb:32-40`). Here registration is explicit and
  * resolution is the same highest-matching-version rule as a pure
  * in-process lookup — no network discovery on the hot path.
  */
final class HandlerRegistry {
  private val handlers = TrieMap.empty[String, Map[SemVer, Handler]]

  def register(h: Handler): Unit =
    handlers.updateWith(h.name) {
      case Some(m) => Some(m + (h.version -> h))
      case None => Some(Map(h.version -> h))
    }

  /** O26: queue-existence probe analogue. */
  def contains(name: String): Boolean = handlers.contains(name)

  /** All registered handler names (fleet-announcement enumeration). */
  def names: Seq[String] = handlers.keys.toSeq.sorted

  def versions(name: String): Seq[SemVer] =
    handlers.get(name).map(_.keys.toSeq.sorted).getOrElse(Nil)

  /** O20: best (highest) version satisfying the constraint. */
  def resolve(ref: HandlerRef): Option[Handler] =
    handlers.get(ref.name).flatMap { m =>
      SemVer.bestMatch(ref.version.getOrElse(""), m.keys.toSeq).map(m)
    }
}
