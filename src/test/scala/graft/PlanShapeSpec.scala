package graft

/** Physical-plan regression pins for the headline queries — the
  * scale-critical properties (broadcasts chosen, shuffles counted,
  * filters pushed, scans pruned) that decide whether these plans
  * survive a 100 TB input. Each has been hand-audited; these specs keep
  * a refactor from silently trading one away.
  */
class PlanShapeSpec extends SparkSpec {

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf001).queryExecution.executedPlan.toString

  private def hashExchanges(p: String): Int =
    "Exchange hashpartitioning".r.findAllIn(p).size

  test("q1: exactly one hash shuffle; date filter pushed; scan pruned to used columns") {
    val p = plan("q1_pricing_summary")
    assert(hashExchanges(p) == 1, s"q1 must shuffle once (partial->final agg):\n$p")
    assert(p.contains("LessThanOrEqual(l_shipdate"), s"shipdate filter not pushed:\n$p")
    assert(!p.contains("l_orderkey"),
      "q1 scan reads join keys the query never touches — column pruning lost")
  }

  test("q3: dims broadcast, one hash shuffle, top-k via TakeOrderedAndProject") {
    val p = plan("q3_top_orders")
    assert("BroadcastExchange".r.findAllIn(p).size == 2,
      s"customer and orders must BROADCAST into the lineitem probe:\n$p")
    assert(hashExchanges(p) == 1,
      s"q3 must shuffle once (the orderkey agg) — a second hash exchange means " +
        s"a broadcast degraded to shuffle join:\n$p")
    assert(p.contains("TakeOrderedAndProject"),
      s"top-10 must not globally sort:\n$p")
    // probe-side scan pruned to the 4 columns q3 touches
    assert(p.contains("struct<l_orderkey:bigint,l_extendedprice:double," +
      "l_discount:double,l_shipdate"), s"lineitem scan not pruned:\n$p")
  }

  test("cosine_topk: zero shuffles — broadcast query vector + TakeOrderedAndProject") {
    val p = plan("cosine_topk")
    assert(hashExchanges(p) == 0, s"brute-force top-k must not shuffle:\n$p")
    assert(p.contains("BroadcastExchange") && p.contains("TakeOrderedAndProject"),
      s"query vector must broadcast and top-k must stay partial:\n$p")
  }
}
