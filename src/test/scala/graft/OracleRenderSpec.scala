package graft

import org.scalatest.funsuite.AnyFunSuite

/** Guards the RENDERED oracle SQL against Scala val-initialization-order
  * bugs: a constant declared below the defs map reads as 0 inside the
  * map's interpolated strings (vals initialize in declaration order),
  * which silently weakens the oracle while the engine — whose defs
  * evaluate at call time — stays correct. The r13 sf1 leg caught
  * exactly this: d18/d22's bottom-k channel rendered "[1:0]" (empty)
  * and the DuckDB twin under-counted 17 true containment pairs that
  * only the bottom-k channel finds. */
class OracleRenderSpec extends AnyFunSuite {

  test("d18/d22 oracles render the REAL bottom-k bound, not 0") {
    val k = graft.dedup.DedupQueries.ContainBottomK
    assert(k === 16)
    for (q <- Seq("d18_containment", "d22_containment_recall")) {
      val sql = SparkEntry.oracleSql(q)
      assert(sql.contains(s"[1:$k]"), s"$q lost the bottom-k slice bound")
      assert(!sql.contains("[1:0]"), q)
    }
  }

  test("no oracle carries a zero-rendered interpolation artifact") {
    val smells = Seq("[1:0]", "range(0, 0)", "range(1, 1)",
      "LIMIT 0", "% 0\n", "// 0\n")
    for ((name, sql) <- SparkEntry.oracleSql; smell <- smells)
      assert(!sql.contains(smell),
        s"$name renders '$smell' — likely an uninitialized constant " +
          "(declare the val final and/or above the defs map)")
  }
}
