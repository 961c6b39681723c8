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

  test("every query is oracle-checked — no rows-only cells") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert(o == q,
      s"orphan oracles: ${o -- q}; oracle-less queries: ${q -- o}")
    assert(q.size == 104, s"query count drifted: ${q.size}")
  }
}
