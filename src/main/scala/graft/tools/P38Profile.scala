package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{Dedup, PipelineQueries, TextAnalysis}

/** Dev tool: stage-level wall attribution for the p38 crawl-curation
  * composition — times each stage's materialization separately (cold,
  * caches reset first) so a composition-level slowdown can be pinned
  * to the stage that owns it.
  *
  *   sbt "runMain graft.tools.P38Profile /root/testdata/sf0.1"
  */
object P38Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(label: String)(df: => DataFrame): DataFrame = {
      val t0 = System.nanoTime()
      val out = df
      val n = out.count()
      println(f"[p38profile] $label%-22s ${(System.nanoTime() - t0) / 1e9}%7.2f s  rows=$n")
      out
    }

    // warm the session on a throwaway action so stage 1 isn't charged
    // for JVM/codegen warmup
    Tables.load(spark, sfDir, "documents").count()

    for (pass <- 1 to 2) {
      println(s"[p38profile] ---- pass $pass ----")
      PipelineQueries.resetOperatorCaches()
      val docs = Tables.load(spark, sfDir, "documents")
      val ex = time("extract") {
        docs.select(col("doc_id"),
          TextAnalysis.htmlToText(PipelineQueries.p35FixtureHtmlForProfile)
            .as("extracted")).cache()
      }
      val gate = time("length-gate") {
        TextAnalysis.lengthQuantileFilter(ex, "extracted", "doc_id", 10, 90)
      }
      val surv = time("survivors-join") {
        ex.join(gate.filter(col("kept")).select(col("doc_id"), col("n_tokens")),
          Seq("doc_id")).cache()
      }
      // force with an aggregate over the score column: a bare count()
      // ELIMINATES the left join + the whole LM subtree (the right side
      // aggregates on the join key, so the join is provably
      // cardinality-preserving) and times the id scan instead
      locally {
        val t0 = System.nanoTime()
        val tkc = split(trim(lower(col("extracted"))), "\\s+")
        val n = surv.filter(pmod(col("doc_id"), lit(5)) === 0)
          .select(explode(tkc).as("w1")).groupBy("w1")
          .agg(count(lit(1))).count()
        println(f"[p38profile]   lm/uni-agg        ${(System.nanoTime() - t0) / 1e9}%7.2f s  rows=$n")
        val t1 = System.nanoTime()
        val prs = graft.functions.BindOnce.bindArray(tkc, tks =>
          transform(sequence(lit(0), size(tks) - 2),
            i => struct(element_at(tks, i + 1).as("w1"), element_at(tks, i + 2).as("w2"))))
        val nb = surv.filter(size(tkc) >= 2)
          .select(col("doc_id"), explode(prs).as("pr"))
          .select(col("pr.w1").as("w1"), col("pr.w2").as("w2"))
          .groupBy("w1", "w2").agg(count(lit(1))).count()
        println(f"[p38profile]   lm/stream-agg     ${(System.nanoTime() - t1) / 1e9}%7.2f s  rows=$nb")
      }
      val lm = time("lm-score(forced)") {
        val scored = TextAnalysis.bigramLmScore(surv, "extracted", "doc_id",
            refCond = pmod(col("doc_id"), lit(5)) === 0, k = 1.0)
          .withColumn("bucket",
            when(col("lm_logprob").isNull, lit("na"))
              .when(col("lm_logprob") >= -3.55, lit("head"))
              .when(col("lm_logprob") >= -3.85, lit("middle"))
              .otherwise(lit("tail")))
        scored.agg(sum(col("lm_logprob"))).collect()
        scored
      }
      val fin = time("lm-filter-join") {
        surv.join(
          lm.filter(col("bucket").isin("head", "middle"))
            .select(col("doc_id"), col("lm_logprob"), col("bucket")),
          Seq("doc_id")).cache()
      }
      val span = time("span-stats") {
        Dedup.spanDupStats(fin, "extracted", "doc_id", width = 8)
      }
      time("final-join") {
        fin.select(col("doc_id"), col("n_tokens"), col("lm_logprob"), col("bucket"))
          .join(span, Seq("doc_id"))
          .orderBy("doc_id")
      }
      Seq(ex, surv, fin).foreach(_.unpersist(blocking = false))
    }
    spark.stop()
  }
}
