package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.{GraftLakeScan, ManifestFileIndex}
import org.apache.spark.sql.catalyst.expressions.{AttributeReference, GreaterThan, LessThanOrEqual, Literal}
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.execution.datasources.FilePartition
import org.apache.spark.sql.types.LongType

import graft.SharedSpark.{spark, sf}
import graft.syntax._

/** File-level min/max skipping from manifest column metrics: a pushed
  * long-column predicate eliminates whole files at PLANNING time.
  */
class LakeStatsSpec extends AnyFunSuite {

  private lazy val path = LakeIO.ensureLake(spark, sf)

  test("commit records INT64 stats per file in the manifest") {
    val (_, entries) = ManifestFileIndex.read(path).get
    assert(entries.nonEmpty)
    assert(entries.forall(_.stats.contains("event_id")),
      "every committed file must carry event_id bounds")
    entries.foreach { e =>
      val (mn, mx) = e.stats("event_id")
      assert(mn <= mx)
    }
  }

  test("requiredBounds extracts conjunct ranges on long columns only") {
    val id = AttributeReference("event_id", LongType)()
    val b = ManifestFileIndex.requiredBounds(Seq(
      GreaterThan(id, Literal(10L)), LessThanOrEqual(id, Literal(99L))))
    assert(b === Map("event_id" -> (11L, 99L)))
    val s = AttributeReference("name", org.apache.spark.sql.types.StringType)()
    assert(ManifestFileIndex.requiredBounds(
      Seq(GreaterThan(s, Literal("x")))).isEmpty)
  }

  private def plannedFiles(df: org.apache.spark.sql.DataFrame): Int = {
    val scan = df.queryExecution.executedPlan.collectFirst {
      case b: BatchScanExec => b.scan
    }.get.asInstanceOf[GraftLakeScan]
    scan.toBatch.planInputPartitions().map {
      case fp: FilePartition => fp.files.length
      case _ => 0
    }.sum
  }

  test("a pushed event_id range plans fewer files than the full scan") {
    def lake = spark.read.format("graft-lake").load(path)
    val all = plannedFiles(lake.select($"event_id", $"value"))
    // event_ids are time-ordered, so a small-id range lives in few hours
    val narrow = plannedFiles(
      lake.where($"event_id" <= 50L).select($"event_id", $"value"))
    assert(all > 0 && narrow > 0)
    assert(narrow < all, s"expected file skipping: $narrow < $all")
    // correctness unchanged
    val n = lake.where($"event_id" <= 50L).count()
    assert(n === Tables.events(spark, sf).where($"event_id" <= 50L).count())
  }
}
