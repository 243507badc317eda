package graft

import org.apache.spark.sql.SparkSession

/** Dev micro-profiler: times sub-stages of the heavy pipeline keys so
  * regressions can be attributed to a stage, not a key. Not part of the
  * driver contract. */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $label%-40s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    import org.apache.spark.sql.functions._
    import operators._

    val docs = Tables.load(spark, sfDir, "documents")
    time("docs count")(docs.count())

    // p02 sub-stages
    time("spread only")(docs.repartition(32).count())
    time("shingles native only") {
      docs.repartition(32)
        .select(size(Dedup.shingles(col("text"), 3)).as("n")).agg(sum("n")).collect()
    }
    time("shingles collect driver") {
      val rows = docs.repartition(32).select(Dedup.shingles(col("text"), 3)).collect()
      println(s"  total shingles ${rows.map(_.getSeq[String](0).size).sum}")
    }
    val signed = time("p02 signatures (cache+count)") {
      val s = Dedup.minHashSignedForProfile(docs, "text", "doc_id")
      s.count(); s
    }
    time("p02 signatures second count")(signed.count())
    time("p02 full candidates count") {
      Dedup.minHashCandidates(docs, "text", "doc_id", minEstJaccard = 0.1).count()
    }

    // p10 — attribution: tokenization vs language scores vs Catalyst
    // compile (second run reuses the compiled codegen, so run1 - run2
    // ≈ driver-side analysis/codegen cost)
    time("p10 tokenize only") {
      docs.withColumn("__tk", split(trim(lower(col("text"))), "\\s+"))
        .select(size(col("__tk")).as("n")).agg(sum("n")).collect()
    }
    time("p10 lang-id run 1") {
      docs.withColumn("pred_lang", TextAnalysis.languageId(col("text")))
        .groupBy("lang", "pred_lang").agg(count(lit(1)).as("n")).collect()
    }
    time("p10 lang-id run 2") {
      docs.withColumn("pred_lang", TextAnalysis.languageId(col("text")))
        .groupBy("lang", "pred_lang").agg(count(lit(1)).as("n")).collect()
    }

    // p03
    time("p03 simhash pairs") {
      Dedup.simHashPairs(docs, "text", "doc_id", maxHamming = 6).count()
    }

    // p05
    val emb = Tables.load(spark, sfDir, "embeddings")
    time("emb count")(emb.count())
    time("p05 cosine near-dup") {
      SimilaritySearch.cosineNearDupPairs(emb, "embedding", "vec_id", minCosine = 0.55).count()
    }

    // p07
    time("p07 ivf fit") {
      SimilaritySearch.ivfIndex(emb, "embedding", "vec_id")
    }

    // p10 AFTER the embedding-heavy keys: reproduces the bench ordering
    // where p10's wall time inflates (heap pressure / GC attribution)
    time("p10 lang-id after p05/p07") {
      docs.withColumn("pred_lang", TextAnalysis.languageId(col("text")))
        .groupBy("lang", "pred_lang").agg(count(lit(1)).as("n")).collect()
    }

    signed.unpersist()
    spark.stop()
  }
}
