package graft.flow

import org.json4s._
import org.json4s.jackson.JsonMethods

/** Flow definition model + JSON codec (SURVEY.md §1.1, §2.1 O1).
  *
  * Accepts exactly the reference's flow-document shape
  * (`/root/reference/spec/fixtures/simple_flow.json`): an ordered list
  * of phases forming a linear chain via `transitions_to`
  * (`lib/distribot/flow.rb:145-148`), each phase holding handlers given
  * either as a bare string or as a `{name, version}` object
  * (`lib/distribot/phase.rb:36-44`), plus an opaque `data` payload that
  * must round-trip untouched (`lib/distribot/flow.rb:17`).
  *
  * Validation is an upgrade over the reference (which validates nothing
  * at submit time): exactly one initial phase, every `transitions_to` /
  * `on_error_transition_to` target must exist, and the chain from the
  * initial phase must reach a final phase.
  */
final case class HandlerRef(name: String, version: Option[String])

final case class PhaseSpec(
    name: String,
    isInitial: Boolean,
    isFinal: Boolean,
    transitionsTo: Option[String],
    onErrorTransitionTo: Option[String],
    handlers: Seq[HandlerRef])

final case class FlowSpec(
    name: Option[String],
    phases: Seq[PhaseSpec],
    data: Option[JValue]) {

  def phase(name: String): Option[PhaseSpec] = phases.find(_.name == name)
  def initialPhase: PhaseSpec = phases.find(_.isInitial).get
  def nextPhase(p: PhaseSpec): Option[PhaseSpec] =
    p.transitionsTo.flatMap(phase)
}

object FlowSpec {
  final case class InvalidFlow(msg: String)
      extends IllegalArgumentException(msg)

  def parse(json: String): FlowSpec = {
    val root = JsonMethods.parse(json)
    val phases = (root \ "phases") match {
      case JArray(arr) => arr.map(parsePhase)
      case _ => throw InvalidFlow("flow needs a phases array")
    }
    val spec = FlowSpec(
      name = (root \ "name").toOption.collect { case JString(s) => s },
      phases = phases,
      data = (root \ "data").toOption)
    validate(spec)
    spec
  }

  private def parsePhase(j: JValue): PhaseSpec = {
    def str(field: String): Option[String] =
      (j \ field).toOption.collect { case JString(s) => s }
    def bool(field: String): Boolean =
      (j \ field).toOption.collect { case JBool(b) => b }.getOrElse(false)
    val handlers = (j \ "handlers") match {
      case JArray(hs) => hs.map {
        case JString(name) => HandlerRef(name, None)
        case o: JObject =>
          val name = (o \ "name") match {
            case JString(s) => s
            case _ => throw InvalidFlow("handler object needs a name")
          }
          HandlerRef(name,
            (o \ "version").toOption.collect { case JString(s) => s })
        case other => throw InvalidFlow(s"bad handler entry: $other")
      }
      case _ => Nil
    }
    PhaseSpec(
      name = str("name").getOrElse(throw InvalidFlow("phase needs a name")),
      isInitial = bool("is_initial"),
      isFinal = bool("is_final"),
      transitionsTo = str("transitions_to"),
      onErrorTransitionTo = str("on_error_transition_to"),
      handlers = handlers)
  }

  private def validate(spec: FlowSpec): Unit = {
    val names = spec.phases.map(_.name)
    if (names.distinct.size != names.size)
      throw InvalidFlow(s"duplicate phase names: $names")
    val initials = spec.phases.filter(_.isInitial)
    if (initials.size != 1)
      throw InvalidFlow(s"need exactly one is_initial phase, got ${initials.size}")
    for (p <- spec.phases; t <- p.transitionsTo ++ p.onErrorTransitionTo)
      if (!names.contains(t))
        throw InvalidFlow(s"phase ${p.name} transitions to unknown phase $t")
    // the chain from the initial phase must terminate in a final
    // phase — and so must the chain from every error target, or a
    // failing phase would route the flow onto a path that cycles or
    // dead-ends at runtime (ADVICE r1: Engine.runLoop would otherwise
    // loop forever / hit nextPhase(...).get)
    def chainTerminates(start: PhaseSpec, what: String): Unit = {
      var seen = Set.empty[String]
      var cur: Option[PhaseSpec] = Some(start)
      while (cur.isDefined) {
        val p = cur.get
        if (seen(p.name)) throw InvalidFlow(s"$what: phase cycle at ${p.name}")
        seen += p.name
        if (p.isFinal) return
        cur = spec.nextPhase(p)
        if (cur.isEmpty)
          throw InvalidFlow(s"$what: chain dead-ends at non-final phase ${p.name}")
      }
    }
    chainTerminates(initials.head, "main chain")
    for (p <- spec.phases; t <- p.onErrorTransitionTo)
      chainTerminates(spec.phase(t).get, s"error chain of ${p.name}")
  }

  /** Serialize back to the reference JSON shape (round-trip support). */
  def render(spec: FlowSpec): String = {
    val phases = JArray(spec.phases.map { p =>
      JObject(List(
        "name" -> JString(p.name)) ++
        (if (p.isInitial) List("is_initial" -> JBool(true)) else Nil) ++
        (if (p.isFinal) List("is_final" -> JBool(true)) else Nil) ++
        p.transitionsTo.map(t => "transitions_to" -> JString(t)).toList ++
        p.onErrorTransitionTo
          .map(t => "on_error_transition_to" -> JString(t)).toList ++
        (if (p.handlers.nonEmpty)
          List("handlers" -> JArray(p.handlers.map {
            case HandlerRef(n, None) => JString(n)
            case HandlerRef(n, Some(v)) =>
              JObject(List("name" -> JString(n), "version" -> JString(v)))
          }.toList))
        else Nil))
    }.toList)
    val root = JObject(
      spec.name.map(n => "name" -> JString(n)).toList ++
        List("phases" -> phases) ++
        spec.data.map(d => "data" -> d).toList)
    JsonMethods.compact(JsonMethods.render(root))
  }
}
