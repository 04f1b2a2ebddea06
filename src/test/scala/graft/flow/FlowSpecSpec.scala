package graft.flow

import org.scalatest.funsuite.AnyFunSuite
import org.json4s.jackson.JsonMethods

/** Flow-JSON parsing contract (SURVEY.md §1.1-§1.2; behavioral cases
  * mirror `/root/reference/spec/distribot/flow_spec.rb:7-17,155-162`:
  * string-or-object handlers, default flags, opaque data round-trip).
  */
class FlowSpecSpec extends AnyFunSuite {

  private val fixture = scala.io.Source.fromFile(
    "fixtures/simple_flow.json").mkString

  test("parses the reference-shaped fixture") {
    val spec = FlowSpec.parse(fixture)
    assert(spec.name.contains("crawl"))
    assert(spec.phases.map(_.name) ==
      Seq("pending", "scanning", "writing", "error", "finished"))
    assert(spec.initialPhase.name == "pending")
    assert(spec.phases.count(_.isFinal) == 2)
  }

  test("handlers parse from both bare strings and {name, version}") {
    val spec = FlowSpec.parse(fixture)
    val scanning = spec.phase("scanning").get
    assert(scanning.handlers == Seq(HandlerRef("TableScanner", Some("~> 1.0"))))
    val writing = spec.phase("writing").get
    assert(writing.handlers == Seq(HandlerRef("ResultWriter", None)))
  }

  test("is_initial / is_final default to false") {
    val spec = FlowSpec.parse(fixture)
    val scanning = spec.phase("scanning").get
    assert(!scanning.isInitial && !scanning.isFinal)
  }

  test("opaque data survives a parse/render round-trip intact") {
    val spec = FlowSpec.parse(fixture)
    val rendered = FlowSpec.render(spec)
    val reparsed = FlowSpec.parse(rendered)
    assert(reparsed.data == spec.data)
    assert(JsonMethods.compact(JsonMethods.render(spec.data.get))
      .contains(""""nested":{"ok":true}"""))
    assert(reparsed == spec)
  }

  test("next-phase chain follows transitions_to") {
    val spec = FlowSpec.parse(fixture)
    val chain = Iterator.iterate(Option(spec.initialPhase))(
      _.flatMap(spec.nextPhase)).takeWhile(_.isDefined).flatten
      .map(_.name).toSeq
    assert(chain == Seq("pending", "scanning", "writing", "finished"))
  }

  test("rejects zero or multiple initial phases") {
    val noInitial =
      """{"phases":[{"name":"a","is_final":true}]}"""
    assertThrows[FlowSpec.InvalidFlow](FlowSpec.parse(noInitial))
    val twoInitial =
      """{"phases":[{"name":"a","is_initial":true,"is_final":true},
        |{"name":"b","is_initial":true,"is_final":true}]}""".stripMargin
    assertThrows[FlowSpec.InvalidFlow](FlowSpec.parse(twoInitial))
  }

  test("rejects dangling transitions_to and cycles") {
    val dangling =
      """{"phases":[{"name":"a","is_initial":true,"transitions_to":"ghost"}]}"""
    assertThrows[FlowSpec.InvalidFlow](FlowSpec.parse(dangling))
    val cycle =
      """{"phases":[
        |{"name":"a","is_initial":true,"transitions_to":"b"},
        |{"name":"b","transitions_to":"a"},
        |{"name":"z","is_final":true}]}""".stripMargin
    assertThrows[FlowSpec.InvalidFlow](FlowSpec.parse(cycle))
  }

  test("rejects a chain that dead-ends before a final phase") {
    val deadEnd =
      """{"phases":[
        |{"name":"a","is_initial":true,"transitions_to":"b"},
        |{"name":"b"},
        |{"name":"z","is_final":true}]}""".stripMargin
    assertThrows[FlowSpec.InvalidFlow](FlowSpec.parse(deadEnd))
  }

  test("rejects error chains that dead-end or cycle (ADVICE r1)") {
    // error target is a non-final phase with no transitions_to
    val errDeadEnd =
      """{"phases":[
        |{"name":"a","is_initial":true,"transitions_to":"z",
        | "on_error_transition_to":"e"},
        |{"name":"e"},
        |{"name":"z","is_final":true}]}""".stripMargin
    assertThrows[FlowSpec.InvalidFlow](FlowSpec.parse(errDeadEnd))
    // error target's transitions_to chain cycles without a final phase
    val errCycle =
      """{"phases":[
        |{"name":"a","is_initial":true,"transitions_to":"z",
        | "on_error_transition_to":"e1"},
        |{"name":"e1","transitions_to":"e2"},
        |{"name":"e2","transitions_to":"e1"},
        |{"name":"z","is_final":true}]}""".stripMargin
    assertThrows[FlowSpec.InvalidFlow](FlowSpec.parse(errCycle))
    // a terminating error chain is accepted
    val ok =
      """{"phases":[
        |{"name":"a","is_initial":true,"transitions_to":"z",
        | "on_error_transition_to":"e"},
        |{"name":"e","transitions_to":"z"},
        |{"name":"z","is_final":true}]}""".stripMargin
    assert(FlowSpec.parse(ok).phases.size == 3)
  }
}
