package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** SQL-function surface: every native expression registered as a Spark
  * SQL function must produce bit-identical results to its Column-API
  * form, through both registration paths (running session + the
  * spark.sql.extensions injection point). */
class GraftExtensionsSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private lazy val registered: SparkSession = { GraftFunctions.register(spark); spark }

  private lazy val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog again and again"),
    (2L, "der schnelle braune fuchs springt und ist mit allem nicht fertig"),
    (3L, "le renard brun rapide est avec la chose que une fois"),
    (4L, "completely unmatched tokens only qwerty zxcvb asdfgh"),
    (5L, "the quick brown fox jumps over the lazy dog again and again today"))
    .toDF("doc_id", "text")

  test("SQL text functions match the Column API bit-for-bit") {
    registered.catalog // force registration
    docs.createOrReplaceTempView("ext_docs")
    val viaSql = registered.sql(
      """SELECT doc_id,
        |       graft_language_id(text) AS lang,
        |       graft_simhash(text) AS sim,
        |       graft_simhash(text, 7) AS sim7,
        |       graft_minhash(text) AS mh,
        |       graft_minhash(text, 64, 2, 7) AS mh2,
        |       graft_winnow_fingerprint(text) AS fp,
        |       graft_ngram_hashes(text, 2) AS ng
        |FROM ext_docs""".stripMargin)
    val viaCols = docs.select(col("doc_id"),
      operators.TextAnalysis.languageId(col("text")).as("lang"),
      functions.SimHash64(col("text"), 42L).as("sim"),
      functions.SimHash64(col("text"), 7L).as("sim7"),
      functions.MinHashSignature(col("text"), 128, 3, 42L).as("mh"),
      functions.MinHashSignature(col("text"), 64, 2, 7L).as("mh2"),
      functions.WinnowFingerprint(col("text"), 8, 16).as("fp"),
      functions.NgramHashSet(col("text"), 2).as("ng"))
    assert(viaSql.exceptAll(viaCols).isEmpty && viaCols.exceptAll(viaSql).isEmpty)
  }

  test("SQL vector functions match the Column API") {
    registered.catalog
    // cosine runs on double vectors, the hyperplane signature on float
    // embeddings (the embeddings-table layout)
    val vecs = Seq(
      (1L, Array(1.0f, 0.0f, 2.0f), Array(1.0f, 0.0f, 2.0f)),
      (2L, Array(1.0f, 2.0f, 3.0f), Array(-1.0f, 0.5f, 0.25f)))
      .toDF("id", "a", "b")
      .withColumn("ad", col("a").cast("array<double>"))
      .withColumn("bd", col("b").cast("array<double>"))
    vecs.createOrReplaceTempView("ext_vecs")
    val viaSql = registered.sql(
      """SELECT id, graft_cosine(ad, bd) AS cos,
        |       graft_hyperplane_sig(a) AS hp,
        |       graft_hyperplane_sig(b, 9) AS hp9,
        |       graft_hyperplane_sigs(a, 42, 128) AS hps,
        |       graft_mix64(id) AS mx
        |FROM ext_vecs""".stripMargin).collect().sortBy(_.getLong(0))
    val viaCols = vecs.select(col("id"),
      functions.CosineSimilarity(col("ad"), col("bd")).as("cos"),
      functions.HyperplaneSignature64(col("a"), 42L).as("hp"),
      functions.HyperplaneSignature64(col("b"), 9L).as("hp9"),
      functions.HyperplaneSignatures(col("a"), 42L, 128).as("hps"),
      functions.Mix64(col("id")).as("mx"))
      .collect().sortBy(_.getLong(0))
    assert(viaSql.toSeq == viaCols.toSeq)
  }

  test("SQL winnow print set matches the Column API and feeds containment") {
    registered.catalog
    docs.createOrReplaceTempView("ext_docs3")
    val viaSql = registered.sql(
      "SELECT doc_id, graft_winnow_prints(text) AS p FROM ext_docs3")
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val viaCols = docs.select(col("doc_id"),
      functions.WinnowPrintSet(col("text"), 8, 16).as("p"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(viaSql == viaCols)
  }

  test("signature agreement and band bucket hash compose in SQL") {
    registered.catalog
    docs.createOrReplaceTempView("ext_docs2")
    val rows = registered.sql(
      """SELECT graft_signature_agreement(graft_minhash(a.text), graft_minhash(b.text)) AS agree,
        |       graft_band_bucket_hash(1, slice(graft_minhash(a.text), 1, 4)) AS bb
        |FROM ext_docs2 a JOIN ext_docs2 b ON a.doc_id = 1 AND b.doc_id = 5""".stripMargin)
      .collect()
    assert(rows.length == 1)
    // near-identical docs agree on most of the 128 signature positions
    assert(rows.head.getInt(0) > 64, s"agreement=${rows.head.getInt(0)}")
  }

  test("PII scan and repetition stats are SQL-reachable and match the Column API") {
    registered.catalog
    Seq((1L, "mail a@b.co or dial 415-555-0134 from 10.0.0.7"),
        (2L, "spam spam spam spam spam"))
      .toDF("doc_id", "text").createOrReplaceTempView("ext_pii")
    val viaSql = registered.sql(
      """SELECT doc_id, graft_pii_scan(text) AS pii,
        |       graft_repetition_stats(text) AS rep
        |FROM ext_pii""".stripMargin).collect()
      .map(r => (r.getLong(0), r.getStruct(1).toSeq, r.getSeq[Double](2))).toSet
    val viaCols = registered.table("ext_pii").select(col("doc_id"),
        functions.PiiScan(col("text")).as("pii"),
        functions.RepetitionStats(col("text")).as("rep")).collect()
      .map(r => (r.getLong(0), r.getStruct(1).toSeq, r.getSeq[Double](2))).toSet
    assert(viaSql === viaCols)
    assert(viaSql.find(_._1 == 1L).get._2 === Seq(1L, 1L, 1L,
      "mail [EMAIL] or dial [PHONE] from [IP]"))
  }

  test("graft_url_domain matches the Column API: first-URL host, NULL when no URL") {
    registered.catalog
    Seq((1L, "see https://a.example.com/x then https://b.example.com"),
        (2L, "no urls at all"),
        (3L, "near-miss htp://x.com then real http://ok.example.net"))
      .toDF("doc_id", "text").createOrReplaceTempView("ext_url")
    val viaSql = registered.sql(
      "SELECT doc_id, graft_url_domain(text) AS d FROM ext_url").collect()
      .map(r => (r.getLong(0), Option(r.getString(1)))).toSet
    val viaCols = registered.table("ext_url").select(col("doc_id"),
        graft.operators.TextAnalysis.urlDomain(col("text")).as("d")).collect()
      .map(r => (r.getLong(0), Option(r.getString(1)))).toSet
    assert(viaSql === viaCols)
    assert(viaSql === Set((1L, Some("a.example.com")), (2L, None),
      (3L, Some("ok.example.net"))))
  }

  test("graft_canonical_url matches the Column API over the adversarial battery") {
    registered.catalog
    val urls = Seq(
      (1L, "HTTPS://ExAmple.COM/Path/Q?utm_source=a&id=3&ref=z#frag"),
      (2L, "http://a.com/x?refresh=1&ref=tw"),
      (3L, "https://a.com/x?b=2&a=1"),
      (4L, "https://a.com/x?utm_campaign=z"),
      (5L, "https://a.com"),
      (6L, "https://a.com/x?ref&a=1"),
      (7L, "HTTP://U.COM:8080/A?z=1&utm_x=9"),
      (8L, "https://a.com/x?a=1&&b=2"),
      (9L, "not a url at all"))
      .toDF("id", "u")
    urls.createOrReplaceTempView("ext_canon")
    val viaSql = registered.sql(
        "SELECT id, graft_canonical_url(u) AS c FROM ext_canon").collect()
      .map(r => (r.getLong(0), Option(r.getString(1)))).toMap
    val viaCols = urls.select(col("id"),
        graft.operators.TextAnalysis.canonicalUrl(col("u")).as("c")).collect()
      .map(r => (r.getLong(0), Option(r.getString(1)))).toMap
    assert(viaSql === viaCols)
    assert(viaSql(1L) === Some("https://example.com/Path/Q?id=3"))
    assert(viaSql(2L) === Some("http://a.com/x?refresh=1"))
    assert(viaSql(3L) === Some("https://a.com/x?a=1&b=2"))
    assert(viaSql(7L) === Some("http://u.com:8080/A?z=1"))
    assert(viaSql(9L) === None, "malformed input must canonicalize to NULL")
  }

  test("the decontamination recipe is pure SQL — and keeps the broadcast plan shape") {
    // r13 verdict stretch: the p20 JOIN shape reachable from the REPL.
    // This IS the documented recipe (TextAnalysis.contamination scaladoc):
    // benchmark prints reduce to a distinct set, the corpus streams
    // through one scan + semi-join, counts are per-doc — and the SQL
    // spelling must produce the identical result AND the same
    // broadcast-semi-join physical shape as the Scala operator.
    registered.catalog
    val corpus = (0L until 40L).map(i =>
      (i, s"document number $i with some shared boilerplate text to fingerprint here"))
      .toDF("doc_id", "text")
    corpus.filter(col("doc_id") % 10 === 0).createOrReplaceTempView("benchmark")
    corpus.filter(col("doc_id") % 10 =!= 0).createOrReplaceTempView("corpus")
    val viaSql = registered.sql(
      """WITH refp AS (
        |  SELECT DISTINCT explode(graft_winnow_prints(text)) AS print FROM benchmark),
        |docp AS (
        |  SELECT doc_id, size(prints) AS n_prints, explode(prints) AS print
        |  FROM (SELECT doc_id, graft_winnow_prints(text) AS prints FROM corpus)
        |  WHERE prints IS NOT NULL)
        |SELECT doc_id AS id, count(1) AS n_matched,
        |       CAST(n_prints AS BIGINT) AS n_prints,
        |       CAST(count(1) AS DOUBLE) / n_prints AS contamination
        |FROM docp WHERE print IN (SELECT print FROM refp)
        |GROUP BY doc_id, n_prints""".stripMargin)
    val viaScala = graft.operators.TextAnalysis.contamination(
      registered.table("corpus"), registered.table("benchmark"), "text", "doc_id")
    val a = viaSql.orderBy("id").collect().map(_.toSeq)
    val b = viaScala.orderBy("id").collect().map(_.toSeq)
    assert(a.nonEmpty && (a sameElements b))
    viaSql.count()
    val plan = viaSql.queryExecution.executedPlan.toString
    assert(plan.contains("LeftSemi"), s"IN (subquery) must plan as a semi-join:\n$plan")
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      s"benchmark print set must broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"corpus must not shuffle:\n$plan")
  }

  test("arity and literal-argument errors are named") {
    registered.catalog
    val e1 = intercept[Exception] {
      registered.sql("SELECT graft_simhash('a', 'notanint')").collect()
    }
    assert(e1.getMessage.contains("seed must be an integer literal"))
    val e2 = intercept[Exception] {
      registered.sql("SELECT graft_cosine(array(1.0F))").collect()
    }
    assert(e2.getMessage.contains("takes 2 argument"))
  }

  test("graft_fold / graft_split match the Sampling layer bit-for-bit") {
    registered.catalog
    val keys = spark.range(0, 2000).toDF("k")
    keys.createOrReplaceTempView("ext_keys")
    val viaSql = registered.sql(
      """SELECT k,
        |       graft_fold(k, 42, 10) AS f,
        |       graft_split(k, 7, 8, 1, 1) AS s3,
        |       graft_split(k, 7, 0.5, 0.5) AS s2,
        |       graft_split(k, 7, 5) AS s1
        |FROM ext_keys""".stripMargin)
    val viaCols = keys.select(col("k"),
      operators.Sampling.fold(col("k"), 42L, 10).as("f"),
      operators.Sampling.splitByWeights(col("k"), 7L, Seq(8, 1, 1)).as("s3"),
      operators.Sampling.splitByWeights(col("k"), 7L, Seq(0.5, 0.5)).as("s2"),
      operators.Sampling.splitByWeights(col("k"), 7L, Seq(5)).as("s1"))
    assert(viaSql.exceptAll(viaCols).isEmpty && viaCols.exceptAll(viaSql).isEmpty)
    // the realized 8/1/1 split must be near-proportional (seeded hash,
    // not accidental constants) and a single weight must be all-zero
    val counts = viaCols.groupBy("s3").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(counts(0) > 1500 && counts(1) > 120 && counts(2) > 120, s"got $counts")
    assert(viaCols.filter(col("s1") =!= 0).isEmpty)
    // bad arguments fail loudly at registration-time analysis
    val e = intercept[Exception](registered.sql(
      "SELECT graft_split(k, 7, 1, -2) FROM ext_keys").collect())
    assert(e.getMessage.contains("positive"), e.getMessage)
    val e2 = intercept[Exception](registered.sql(
      "SELECT graft_fold(k, 42, 0) FROM ext_keys").collect())
    assert(e2.getMessage.contains("positive"), e2.getMessage)
  }

  test("graft_html_to_text matches the Column API bit-for-bit") {
    registered.catalog
    val pages = Seq(
      (1L, """<html><head><style>p{/*<b>x</b>*/}</style><script>if(a<2){s="<i>no</i>"}</script></head>""" +
        """<body><!-- <div>hidden</div> --><h1>T &amp; &lt;s&gt;</h1><p>body&nbsp;text &amp;lt;esc&amp;gt;</p>""" +
        """<![CDATA[raw <x>]]><br>tail</body></html>"""),
      (2L, "no markup at all"),
      (3L, "a<script>unterminated b"),
      (4L, null.asInstanceOf[String]))
      .toDF("id", "h")
    pages.createOrReplaceTempView("ext_pages")
    val viaSql = registered.sql(
      "SELECT id, graft_html_to_text(h) AS t FROM ext_pages")
    val viaCols = pages.select(col("id"),
      operators.TextAnalysis.htmlToText(col("h")).as("t"))
    assert(viaSql.exceptAll(viaCols).isEmpty && viaCols.exceptAll(viaSql).isEmpty)
    val got = viaSql.orderBy("id").collect()
    assert(got(0).getString(1) === """T & <s> body text &lt;esc&gt; tail""")
    assert(got(3).isNullAt(1))
  }

  test("spark.sql.extensions injection registers on a fresh session") {
    // builder extensions apply only at session CREATION: park the default
    // session, build a sibling session over the same SparkContext with
    // the injection point, then restore
    val prev = SparkSession.getDefaultSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .master("local[2]")
        .withExtensions(new GraftExtensions())
        .getOrCreate()
      val got = s2.sql("SELECT graft_language_id('der und ist mit') AS l")
        .collect().head.getString(0)
      assert(got == "de")
    } finally {
      prev.foreach { p =>
        SparkSession.setDefaultSession(p)
        SparkSession.setActiveSession(p)
      }
    }
  }

  test("SimHash matches the plain ±1-vote reference at every size class, " +
      "including across the 65536-token lane boundary") {
    import graft.functions.SimHash64
    import graft.operators.DetRngHash
    // independent reimplementation: one Int ones-counter per bit, no
    // lane packing — correct at any document size by construction
    def reference(text: String, seed: Long): java.lang.Long = {
      val tokens = text.trim.toLowerCase.split("\\s+").filter(_.nonEmpty)
      if (tokens.isEmpty) return null
      val ones = new Array[Int](64)
      tokens.foreach { t =>
        val h = DetRngHash.mix(DetRngHash.xx(t.getBytes("UTF-8")) ^ seed)
        var b = 0
        while (b < 64) { if (((h >>> b) & 1L) == 1L) ones(b) += 1; b += 1 }
      }
      var out = 0L
      var b = 0
      while (b < 64) { if (2L * ones(b) > tokens.length) out |= (1L << b); b += 1 }
      java.lang.Long.valueOf(out)
    }
    def doc(n: Int): String =
      Array.tabulate(n)(i => "w" + (i % 997)).mkString(" ")
    // small (packed path), the largest packed-safe size (65535 — a lane
    // can hold exactly its ones-count), and past the boundary where the
    // packed adds would carry into the neighbor lane (wide path)
    for (n <- Seq(1, 17, 4096, 65535, 65536, 70000); seed <- Seq(42L, 7L)) {
      assert(SimHash64.kernel(doc(n), seed) == reference(doc(n), seed),
        s"n=$n seed=$seed")
    }
  }

  test("SQL counting kernels match their Column-API forms bit-for-bit") {
    registered.catalog // force registration
    val tricky = Seq((1L, "- b\nthe AND of...\n#x 12!"), (2L, ""), (3L, " "),
      (4L, "a\tb\u000Bc"), (5L, "word " * 30)).toDF("doc_id", "text")
    tricky.createOrReplaceTempView("ext_cnt")
    val viaSql = registered.sql(
      """SELECT doc_id, graft_quality_stats(text) AS q,
        |       graft_gopher_stats(text) AS g,
        |       graft_subword_count(text) AS sw
        |FROM ext_cnt ORDER BY doc_id""".stripMargin).collect()
    val viaCol = tricky.select(col("doc_id"),
        graft.functions.QualityStats(col("text")).as("q"),
        graft.functions.GopherStats(col("text")).as("g"),
        graft.functions.SubwordCountExpr(col("text")).as("sw"))
      .orderBy("doc_id").collect()
    assert(viaSql.map(_.toString).toSeq === viaCol.map(_.toString).toSeq)
  }

  test("graft_hll_reg_rho / graft_ac_count match their Column-API forms bit-for-bit") {
    registered.catalog // force registration
    val rows = Seq((1L, "free money now aaaa"), (2L, ""), (3L, "casino x casino"))
      .toDF("doc_id", "text")
    rows.createOrReplaceTempView("ext_sketch")
    val viaSql = registered.sql(
      """SELECT doc_id, graft_hll_reg_rho(text, 8) AS h,
        |       graft_ac_count(text, 'free money', 'casino', 'aa') AS ac
        |FROM ext_sketch ORDER BY doc_id""".stripMargin).collect()
    val viaCol = rows.select(col("doc_id"),
        graft.functions.HllRegRho(col("text"), 8).as("h"),
        graft.functions.AcScan(col("text"),
          Seq("free money", "casino", "aa")).as("ac"))
      .orderBy("doc_id").collect()
    assert(viaSql.map(_.toString).toSeq === viaCol.map(_.toString).toSeq)
    // NB Spark's chr() wraps at 256 (unlike DuckDB's) \u2014 spell the
    // combining mark as a \u literal instead
    assert(registered.sql(
      "SELECT graft_nfc_normalize('cafe\\u0301') AS n").head().getString(0)
      === "caf\u00e9")
    // non-literal pattern is a named error
    val e = intercept[Exception] {
      registered.sql("SELECT graft_ac_count(text, text) FROM ext_sketch").collect()
    }
    assert(e.getMessage.contains("must be a string literal"))
  }
}
