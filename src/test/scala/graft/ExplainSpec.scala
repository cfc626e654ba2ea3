package graft

import org.scalatest.funsuite.AnyFunSuite

/** Unit fixtures for [[Explain.exchangeCounts]] — the counter behind
  * GlobalPlanSpec's pinned shuffle budgets. The ReusedExchange cases
  * matter because no current plan at sf0.001 contains one: without a
  * fixture the reuse-stripping path is exercised by nothing, and a
  * regression would surface only as a phantom budget breach the first
  * time a plan gains exchange reuse. Fixture lines mirror Spark 4.1's
  * actual rendering, where the reuse node carries the reused
  * exchange's own description on the SAME line. */
class ExplainSpec extends AnyFunSuite {

  test("plain shuffle and broadcast exchanges are counted") {
    val plan =
      """*(2) HashAggregate(keys=[k#1L], functions=[sum(v#2L)])
        |+- Exchange hashpartitioning(k#1L, 4), ENSURE_REQUIREMENTS
        |   +- *(1) BroadcastHashJoin [k#1L], [k#3L], Inner
        |      :- BroadcastExchange HashedRelationBroadcastMode(...)
        |      +- *(1) ColumnarToRow""".stripMargin
    assert(Explain.exchangeCounts(plan) === (1, 1))
  }

  test("a reused shuffle exchange counts as neither") {
    val plan =
      """Union
        |:- Exchange hashpartitioning(k#1L, 4), ENSURE_REQUIREMENTS
        |+- ReusedExchange [k#8L, sum#14L], Exchange hashpartitioning(k#1L, 4), ENSURE_REQUIREMENTS""".stripMargin
    assert(Explain.exchangeCounts(plan) === (1, 0),
      "the reused exchange's embedded description must not be counted")
  }

  test("a reused broadcast exchange counts as neither") {
    val plan =
      """*(3) BroadcastHashJoin [a#1L], [b#2L], Inner
        |:- BroadcastExchange HashedRelationBroadcastMode(List(a#1L))
        |+- ReusedExchange [b#9L], BroadcastExchange HashedRelationBroadcastMode(List(a#1L))""".stripMargin
    assert(Explain.exchangeCounts(plan) === (0, 1),
      "a reused broadcast must not double-count")
  }

  test("word boundaries: BroadcastExchange is not also a shuffle") {
    assert(Explain.exchangeCounts(
      "BroadcastExchange HashedRelationBroadcastMode") === (0, 1))
    assert(Explain.exchangeCounts("ShuffleExchange-like noise") === (0, 0))
  }
}
