package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark.{spark, sf}

/** Driver-contract smoke: every registered op runs and returns rows at
  * sf0.001, every oracle key exists in queries, entry is non-empty.
  */
class RegistrySpec extends AnyFunSuite {

  test("no duplicate op keys") {
    val keys = SparkEntry.allOps.map(_.key)
    assert(keys.distinct.size === keys.size)
  }

  test("oracleSql keys are a subset of queries keys") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  SparkEntry.allOps.foreach { op =>
    test(s"op ${op.key} runs and returns rows at sf0.001") {
      val n = op.run(spark, sf).count()
      assert(n > 0, s"${op.key} returned no rows")
    }
  }

  test("entry returns rows (driver t1 smoke)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("unknown table name fails fast with a clear message") {
    val e = intercept[IllegalArgumentException] {
      graft.sources.Tables.load(spark, sf, "no_such_table")
    }
    assert(e.getMessage.contains("unknown table"))
  }
}
