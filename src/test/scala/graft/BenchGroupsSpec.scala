package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench's fixed group order must name exactly the registered
  * portfolio: a typo'd name silently drops out of its group (the
  * runtime filter hides it) and a new query left ungrouped falls into
  * the unordered extras tail — both make cross-round timings
  * incomparable. */
class BenchGroupsSpec extends AnyFunSuite {
  test("bench groups name exactly the registered queries, once each") {
    val grouped = Bench.groups.flatten
    val dups = grouped.groupBy(identity).filter(_._2.size > 1).keys
    assert(dups.isEmpty, s"duplicated in groups: ${dups.mkString(", ")}")
    val registered = SparkEntry.queries.keySet
    val dead = grouped.toSet -- registered
    val ungrouped = registered -- grouped.toSet
    assert(dead.isEmpty, s"group names not registered: ${dead.mkString(", ")}")
    assert(ungrouped.isEmpty,
      s"registered but not in any bench group: ${ungrouped.mkString(", ")}")
  }
}
