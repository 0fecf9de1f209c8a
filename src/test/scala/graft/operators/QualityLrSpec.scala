package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SharedSpark.spark

/** The in-engine logistic-regression quality classifier: training must be
  * bit-deterministic (DECIMAL-exact gradients), actually learn (accuracy
  * far above the majority-class floor), and keep its plan scale-true
  * (single aggregate per iteration, 1-row broadcast for the moments).
  */
class QualityLrSpec extends AnyFunSuite {
  import spark.implicits._

  private val d = "/root/testdata/sf0.001"

  test("training is bit-deterministic across runs") {
    val (w1, f1) = CurationOps.trainQualityLr(spark, d)
    val (w2, f2) = CurationOps.trainQualityLr(spark, d)
    assert(w1.toSeq == w2.toSeq) // DECIMAL-exact gradients ⇒ identical trajectory
    f1.unpersist(); f2.unpersist()
  }

  test("the model learns: accuracy beats the majority-class floor and 0.95") {
    val (w, feats) = CurationOps.trainQualityLr(spark, d)
    val Seq(acc, base) = feats
      .agg(avg(($"y" === CurationOps.lrPrediction(w)).cast("double")),
        greatest(avg($"y"), lit(1.0) - avg($"y")))
      .head().toSeq.map(_.asInstanceOf[Double]).toSeq
    assert(acc >= 0.95, s"accuracy $acc below bound")
    assert(acc > base - 1e-9,
      s"accuracy $acc does not beat majority floor $base — model learned nothing")
    // weights moved off the origin: training actually ran
    assert(w.exists(math.abs(_) > 0.1))
    feats.unpersist()
  }

  test("plan shape: no cartesian product, no window, no shuffle of raw text") {
    val (w, feats) = CurationOps.trainQualityLr(spark, d, iters = 1)
    val plan = feats.agg(avg(($"y" === CurationOps.lrPrediction(w)).cast("double")))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("Window"))
    feats.unpersist()
  }
}
