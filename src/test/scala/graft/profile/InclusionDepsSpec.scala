package graft.profile

import graft.SparkSpec
import org.apache.spark.sql.functions.col

/** p8's sketch estimator pinned against p7's exact answer on the same
  * data: the approximate pass must agree with the exact pass wherever
  * the estimator's documented contract says it is reliable. sf0.01 is
  * used (not the 0.001 smoke set) so the fact-side key columns are
  * comfortably above the K=128 sketch size, exercising the regime the
  * sketch exists for. */
class InclusionDepsSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.01"

  private lazy val exact =
    ProfileQueries.defs("p7_inclusion_deps").fn(spark, sf)
      .select(col("col_a"), col("col_b"),
        col("containment").as("exact_c"))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2))
      .toMap

  private lazy val approx =
    ProfileQueries.defs("p8_inclusion_deps_approx").fn(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(3), r.getDouble(4), r.getLong(5)))
      .toMap

  test("p8 emits every ordered key-column pair with a bounded estimate") {
    val n = ProfileQueries.InclusionKeyCols.size
    assert(approx.size === n * (n - 1))
    approx.values.foreach { case (estN, c, flag) =>
      assert(estN >= 1L)
      assert(c >= 0.0 && c <= 1.0, s"containment estimate $c out of [0,1]")
      assert(flag === (if (c >= ProfileQueries.InclApproxThreshold) 1L
        else 0L))
    }
  }

  // the estimator contract (see p8's doc comment): for a true inclusion
  // A ⊆ B the sketch sees match_k ~ K/(|B|/|A|), so containment is
  // resolvable when both sides are sketch-sized (>~ K/2) AND the size
  // ratio is <~ K/20 (~6 at K=128). Outside that, p7's exact pass is
  // the tool — and is cheap there by definition (small |A|).
  private def wellConditioned(na: Long, nb: Long): Boolean =
    na >= ProfileQueries.InclApproxK / 2 &&
      nb >= ProfileQueries.InclApproxK / 2 &&
      na <= 5 * nb && nb <= 5 * na

  test("p8 flags every exact inclusion in the reliable regime") {
    val sizes = approx.map { case ((a, _), (n, _, _)) => a -> n }
    val missed = exact.collect {
      case ((a, b), c) if c == 1.0 &&
        wellConditioned(approx(a -> b)._1, sizes(b)) &&
        approx(a -> b)._2 < ProfileQueries.InclApproxThreshold => (a, b)
    }
    assert(missed.isEmpty, s"exact inclusions not flagged by p8: $missed")
    // the regime is non-trivially populated: the canonical FK edges
    // o_custkey->c_custkey and l_orderkey->o_orderkey are inside it
    assert(wellConditioned(approx(
      "orders.o_custkey" -> "customer.c_custkey")._1,
      sizes("customer.c_custkey")))
    assert(wellConditioned(approx(
      "lineitem.l_orderkey" -> "orders.o_orderkey")._1,
      sizes("orders.o_orderkey")))
  }

  test("p8 estimate tracks exact containment on well-conditioned pairs") {
    val sizes = approx.map { case ((a, _), (n, _, _)) => a -> n }
    var checked = 0
    for (((a, b), c) <- exact) {
      val (na, est, _) = approx(a -> b)
      if (wellConditioned(na, sizes(b))) {
        checked += 1
        assert(math.abs(est - c) <= 0.15,
          s"($a subset-of $b): est $est vs exact $c")
      }
    }
    assert(checked >= 5, s"only $checked well-conditioned pairs checked")
  }

  test("p9 pins FD polarity: key FDs hold, non-key candidates fail") {
    val out = ProfileQueries.defs("p9_functional_deps").fn(spark, sf)
      .collect()
    assert(out.length === ProfileQueries.FdCandidates.length)
    val holds = out.map(r => r.getAs[String]("det_col") ->
      r.getAs[Long]("fd_holds")).toMap
    // key (and unique-name) determinants hold; the reversed / non-key
    // directions fail — both polarities, so the operator discriminates
    val expectHold = Set("customer.c_custkey", "nation.n_nationkey",
      "nation.n_name", "orders.o_orderkey", "part.p_partkey")
    holds.foreach { case (det, h) =>
      assert((h == 1L) === expectHold.contains(det),
        s"$det: fd_holds=$h, expected ${expectHold.contains(det)}")
    }
    // internal consistency: holds <=> zero violating lhs <=> fan-out 1
    out.foreach { r =>
      val holds1 = r.getAs[Long]("fd_holds") == 1L
      assert(holds1 === (r.getAs[Long]("n_violating") == 0L))
      assert(holds1 === (r.getAs[Long]("max_rhs") == 1L))
      assert(r.getAs[Long]("n_lhs") >= r.getAs[Long]("n_violating"))
    }
  }
}
