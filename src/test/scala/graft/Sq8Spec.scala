package graft

import graft.backends.DetRng
import graft.operators.SimilaritySearch
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** SQ8 scalar quantization (p58): code-range/clamp invariants,
  * reconstruction-error bound, approx-vs-exact cosine fidelity, and
  * the row-local plan shape. The cross-engine gate (DuckDB retrains
  * the quantizer and replays the ordered folds) runs in the driver's
  * correctness pass. */
class Sq8Spec extends AnyFunSuite {
  import TestSpark._

  private val dim = 16

  private lazy val vecs: Seq[(Long, Seq[Float])] = {
    val rng = DetRng(4242L)
    (0L until 100L).map { i =>
      (i, Seq.fill(dim)((rng.nextDouble() * 2 - 1).toFloat))
    }
  }

  private lazy val df = {
    import spark.implicits._
    vecs.toDF("vec_id", "embedding")
  }

  test("codes stay in [0,255], degenerate dims code to 0, reconstruction error <= scale") {
    val params = SimilaritySearch.sq8Params(df, "embedding")
    assert(params.mins.length === dim && params.scales.length === dim)
    val codes = df.select(col("vec_id"),
        graft.functions.Sq8Quantize(col("embedding"), params.mins, params.scales).as("c"),
        col("embedding"))
      .collect()
    codes.foreach { r =>
      val cs = r.getSeq[Int](1)
      val xs = r.getSeq[Float](2)
      assert(cs.forall(c => c >= 0 && c <= 255))
      cs.indices.foreach { d =>
        val xhat = params.mins(d) + cs(d) * params.scales(d)
        // floor quantization reconstructs within one cell width
        assert(math.abs(xhat - xs(d)) <= params.scales(d) + 1e-12,
          s"dim $d: xhat=$xhat x=${xs(d)} scale=${params.scales(d)}")
      }
    }
    // a constant dimension has scale 0 and must code to 0, not NaN/crash
    import spark.implicits._
    val const = Seq((1L, Seq.fill(4)(2.5f)), (2L, Seq.fill(4)(2.5f)))
      .toDF("vec_id", "embedding")
    val p2 = SimilaritySearch.sq8Params(const, "embedding")
    assert(p2.scales.forall(_ == 0.0))
    val c2 = const.select(graft.functions.Sq8Quantize(col("embedding"),
      p2.mins, p2.scales)).head().getSeq[Int](0)
    assert(c2.forall(_ === 0))
  }

  test("approx cosine tracks exact cosine and preserves the top-1 neighbor") {
    val params = SimilaritySearch.sq8Params(df, "embedding")
    val q = vecs.head._2.map(_.toDouble)
    val top = SimilaritySearch.sq8TopK(df, "embedding", "vec_id", q, 10, params)
      .collect()
    assert(top.length === 10)
    // self-match first: quantization noise cannot displace cosine ~1.0
    assert(top.head.getLong(0) === 0L)
    top.foreach { r =>
      assert(math.abs(r.getDouble(1) - r.getDouble(2)) < 0.02,
        s"approx ${r.getDouble(1)} vs exact ${r.getDouble(2)}")
    }
    // descending approx order with id tie-break
    val approx = top.map(_.getDouble(1)).toSeq
    assert(approx === approx.sorted.reverse)
  }

  test("misfit vectors are NULL, not wrong answers") {
    import spark.implicits._
    val params = SimilaritySearch.sq8Params(df, "embedding")
    val bad = Seq((1L, Seq.fill(dim + 3)(0.5f))).toDF("vec_id", "embedding")
    val out = bad.select(graft.functions.Sq8Quantize(col("embedding"),
      params.mins, params.scales).as("c")).head()
    assert(out.isNullAt(0))
    // NaN is a misfit too — coding it silently to 0 would rank a
    // malformed vector instead of surfacing it
    val nan = Seq((2L, Seq.fill(dim)(Float.NaN))).toDF("vec_id", "embedding")
    val out2 = nan.select(graft.functions.Sq8Quantize(col("embedding"),
      params.mins, params.scales).as("c")).head()
    assert(out2.isNullAt(0))
  }

  test("scoring scans codes row-locally: no UDF, no shuffle before the top-k") {
    val params = SimilaritySearch.sq8Params(df, "embedding")
    val q = vecs.head._2.map(_.toDouble)
    val plan = SimilaritySearch.sq8TopK(df, "embedding", "vec_id", q, 10, params)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-k must be per-partition heaps, not a global sort:\n$plan")
    assert(!plan.toLowerCase.contains("scalaudf"),
      s"quantize/score must stay native:\n$plan")
    assert(!plan.contains("Exchange") || plan.contains("TakeOrderedAndProject"),
      s"no shuffle before the top-k:\n$plan")
  }

  test("one NaN element cannot poison the quantizer ranges for clean vectors") {
    import spark.implicits._
    val poisoned = df.union(
      Seq((999L, Seq.tabulate(dim)(d => if (d == 3) Float.NaN else 0.1f)))
        .toDF("vec_id", "embedding"))
    val clean = SimilaritySearch.sq8Params(df, "embedding")
    val p = SimilaritySearch.sq8Params(poisoned, "embedding")
    assert(!p.scales.exists(_.isNaN) && !p.mins.exists(_.isNaN))
    // dim 3's range only sees the poisoned vector's finite siblings
    assert(p.mins(3) <= clean.mins(3) && p.scales(3) > 0)
    // and the poisoned vector itself quantizes to NULL, staying out of
    // any ranking, while clean vectors still code normally
    val codes = poisoned.select(col("vec_id"),
      graft.functions.Sq8Quantize(col("embedding"), p.mins, p.scales).as("c"))
    assert(codes.filter(col("vec_id") === 999L).head().isNullAt(1))
    assert(codes.filter(col("vec_id") =!= 999L).filter(col("c").isNull).count() === 0)
  }
}
