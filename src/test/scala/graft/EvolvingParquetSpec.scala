package graft

import graft.sources.EvolvingParquet
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Contract battery for the schema-evolution snapshot union (p94):
  * by-name alignment under column reorder, NULL fill in both
  * directions, snapshot lineage, and the type-conflict named error. */
class EvolvingParquetSpec extends AnyFunSuite {
  import TestSpark._

  private def scratch(tag: String): String = {
    val d = java.nio.file.Files
      .createTempDirectory(s"graft_evolve_$tag").toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  test("union by NAME survives a reordered writer; NULL fill both directions") {
    import spark.implicits._
    val dir = scratch("basic")
    // gen1: (id, tag, val) — gen2 writer reordered columns AND evolved
    // the schema: tag dropped, depth added
    Seq((1L, "a", 10L), (2L, "b", 20L)).toDF("id", "tag", "v")
      .write.mode("overwrite").parquet(s"$dir/gen1")
    Seq((7L, 3L, 100L), (8L, 4L, 200L)).toDF("depth", "id", "v")
      .write.mode("overwrite").parquet(s"$dir/gen2")
    val got = EvolvingParquet.readUnion(spark,
        Seq("gen1" -> s"$dir/gen1", "gen2" -> s"$dir/gen2"))
      .orderBy("id")
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[String]("snapshot"),
        Option(r.getAs[Any]("tag")), Option(r.getAs[Any]("depth")),
        r.getAs[Long]("v")))
    assert(got.toSeq === Seq(
      (1L, "gen1", Some("a"), None, 10L),
      (2L, "gen1", Some("b"), None, 20L),
      (3L, "gen2", None, Some(7L), 100L),
      (4L, "gen2", None, Some(8L), 200L)))
  }

  test("cross-snapshot type conflict is a NAMED error, not a coercion") {
    import spark.implicits._
    val dir = scratch("conflict")
    Seq((1L, 5L)).toDF("id", "score")
      .write.mode("overwrite").parquet(s"$dir/gen1")
    Seq((2L, "high")).toDF("id", "score")
      .write.mode("overwrite").parquet(s"$dir/gen2")
    val e = intercept[IllegalArgumentException] {
      EvolvingParquet.readUnion(spark,
        Seq("gen1" -> s"$dir/gen1", "gen2" -> s"$dir/gen2"))
    }
    assert(e.getMessage.contains("score"))
    assert(e.getMessage.contains("gen1") && e.getMessage.contains("gen2"))
    assert(e.getMessage.contains("refusing to coerce"))
  }

  test("a pre-existing 'snapshot' column is a named error, not a silent overwrite") {
    import spark.implicits._
    val dir = scratch("shadow")
    Seq((1L, "v1")).toDF("id", "snapshot")
      .write.mode("overwrite").parquet(s"$dir/gen1")
    val e = intercept[IllegalArgumentException] {
      EvolvingParquet.readUnion(spark, Seq("gen1" -> s"$dir/gen1"))
    }
    assert(e.getMessage.contains("'snapshot' column"))
  }

  test("three generations chain; filters push through the union branches") {
    import spark.implicits._
    val dir = scratch("three")
    Seq((1L, "x")).toDF("id", "a").write.mode("overwrite").parquet(s"$dir/g1")
    Seq((2L, 9L)).toDF("id", "b").write.mode("overwrite").parquet(s"$dir/g2")
    Seq((3L, "y", 8L)).toDF("id", "a", "b")
      .write.mode("overwrite").parquet(s"$dir/g3")
    val u = EvolvingParquet.readUnion(spark,
      Seq("g1" -> s"$dir/g1", "g2" -> s"$dir/g2", "g3" -> s"$dir/g3"))
    val rows = u.orderBy("id").collect()
    assert(rows.length === 3)
    assert(rows.map(_.getAs[String]("snapshot")).toSeq === Seq("g1", "g2", "g3"))
    // column pruning + filter pushdown reach each branch's scan
    val plan = u.filter(col("id") === 3L).select("id", "snapshot")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(id), EqualTo(id,3)]"),
      s"filter must push to the parquet scans:\n$plan")
    assert(!plan.contains("Exchange"), s"union must not shuffle:\n$plan")
  }
}
