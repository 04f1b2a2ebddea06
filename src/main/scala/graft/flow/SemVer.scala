package graft.flow

/** Semantic version + gem-style constraint matching (SURVEY.md §2.1
  * O20). The reference resolves a phase handler's `version` spec (for
  * example `"~> 1.0"`) against deployed handler versions and picks the
  * highest match (`/root/reference/lib/distribot/phase_started_handler.rb:45-67`).
  * This is that selection logic as a pure, property-testable function —
  * registry lookup instead of network queue discovery.
  */
final case class SemVer(major: Int, minor: Int, patch: Int)
    extends Ordered[SemVer] {
  override def compare(that: SemVer): Int = {
    val c1 = major.compareTo(that.major)
    if (c1 != 0) return c1
    val c2 = minor.compareTo(that.minor)
    if (c2 != 0) c2 else patch.compareTo(that.patch)
  }
  override def toString = s"$major.$minor.$patch"
}

object SemVer {
  private val Re = """^(\d+)(?:\.(\d+))?(?:\.(\d+))?$""".r

  def parse(s: String): Option[SemVer] = s.trim match {
    case Re(ma, mi, pa) =>
      Some(SemVer(ma.toInt,
        Option(mi).map(_.toInt).getOrElse(0),
        Option(pa).map(_.toInt).getOrElse(0)))
    case _ => None
  }

  /** A gem-dependency-style constraint: `~> 1.0`, `>= 1.2.3`, `> 1`,
    * `<= 2.0`, `< 2`, `= 1.0.0`, or a bare version (exact match).
    */
  sealed trait Constraint { def matches(v: SemVer): Boolean }

  final case class Exact(v: SemVer) extends Constraint {
    def matches(x: SemVer): Boolean = x == v
  }
  final case class AtLeast(v: SemVer, strict: Boolean) extends Constraint {
    def matches(x: SemVer): Boolean = if (strict) x > v else x >= v
  }
  final case class AtMost(v: SemVer, strict: Boolean) extends Constraint {
    def matches(x: SemVer): Boolean = if (strict) x < v else x <= v
  }

  /** Pessimistic operator: `~> 1.2` allows >=1.2.0 <2.0.0;
    * `~> 1.2.3` allows >=1.2.3 <1.3.0 (release-segment semantics). */
  final case class Pessimistic(v: SemVer, twoSegments: Boolean)
      extends Constraint {
    private val upper =
      if (twoSegments) SemVer(v.major + 1, 0, 0)
      else SemVer(v.major, v.minor + 1, 0)
    def matches(x: SemVer): Boolean = x >= v && x < upper
  }

  /** Anything matches (missing / null version spec). */
  case object Any extends Constraint {
    def matches(x: SemVer): Boolean = true
  }

  private val ConstraintRe = """^(~>|>=|<=|>|<|=)?\s*([\d.]+)$""".r

  def parseConstraint(spec: String): Option[Constraint] = {
    if (spec == null || spec.trim.isEmpty) return Some(Any)
    spec.trim match {
      case ConstraintRe(op, ver) =>
        val segs = ver.split('.').length
        parse(ver).map { v =>
          op match {
            case "~>" => Pessimistic(v, twoSegments = segs <= 2)
            case ">=" => AtLeast(v, strict = false)
            case ">" => AtLeast(v, strict = true)
            case "<=" => AtMost(v, strict = false)
            case "<" => AtMost(v, strict = true)
            case "=" | null => Exact(v)
          }
        }
      case _ => None
    }
  }

  /** The reference's selection rule: highest deployed version that
    * satisfies the constraint (None when nothing matches). */
  def bestMatch(spec: String, available: Seq[SemVer]): Option[SemVer] =
    parseConstraint(spec).flatMap(c => available.filter(c.matches).sorted.lastOption)
}
