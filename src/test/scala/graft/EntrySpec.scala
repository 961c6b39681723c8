package graft

import org.scalatest.funsuite.AnyFunSuite

/** The driver's smoke contract: SparkEntry.entry returns rows. */
class EntrySpec extends AnyFunSuite {
  lazy val spark = TestSessions.spark

  test("flagship entry: top-20 PageRank of the sf0.001 link graph") {
    val rows = SparkEntry.entry(spark).collect()
    assert(rows.length == 20)
    val ranks = rows.map(_.getDouble(1))
    assert(ranks.sameElements(ranks.sorted.reverse), "must be rank-descending")
    assert(ranks.head > 0.15)
  }

  test("every query has either an oracle or a documented rows-only check") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert(o.subsetOf(q), s"orphan oracles: ${o -- q}")
    assert(q.size >= 38)
  }
}
