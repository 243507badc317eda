package graft

import graft.operators.TextAnalysis
import graft.operators.TextAnalysis.BpeMerge
import org.scalatest.funsuite.AnyFunSuite

/** BPE vocabulary training (p54): hand-computed merge tables, greedy
  * left-to-right application semantics, deterministic tie-breaks, and
  * the named-error contracts. The cross-engine gate (DuckDB retrains
  * the whole vocabulary via the unrolled-CTE oracle) runs in the
  * driver's correctness pass; these pin the kernel itself. */
class BpeSpec extends AnyFunSuite {
  import TestSpark._

  private def corpus(texts: String*) = {
    import spark.implicits._
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
  }

  test("classic Sennrich corpus learns the hand-computed merge sequence") {
    // low×5, lower×2, newest×6, widest×3 — the worked example from the
    // original paper (reference point only; computed by hand here).
    val docs = corpus(Seq.fill(5)("low").mkString(" "),
      "lower lower",
      Seq.fill(6)("newest").mkString(" "),
      "widest widest widest")
    val (merges, segs) = TextAnalysis.bpeTrain(docs, "text", merges = 4)
    // pair counts at step 1: es=9 (newest 6 + widest 3), st=9, we=8,
    // ne=6, ew=6, lo=7, ow=7, ... argmax ties es/st at 9 → lexicographic
    // picks ("e","s"); then ("es","t") at 9; then ("l","o") (7) ties
    // ("o","w") (7) → ("l","o"); then ("lo","w") at 7.
    assert(merges === Seq(
      BpeMerge(1, "e", "s", 9), BpeMerge(2, "es", "t", 9),
      BpeMerge(3, "l", "o", 7), BpeMerge(4, "lo", "w", 7)))
    val bySeg = segs.map { case (w, c, sy) => w -> ((c, sy)) }.toMap
    assert(bySeg("low") === ((5L, Seq("low"))))
    assert(bySeg("lower") === ((2L, Seq("low", "e", "r"))))
    assert(bySeg("newest") === ((6L, Seq("n", "e", "w", "est"))))
    assert(bySeg("widest") === ((3L, Seq("w", "i", "d", "est"))))
  }

  test("merge application is greedy left-to-right: odd identical-symbol runs pair from the left") {
    // "aaaaa" with merge (a,a): greedy gives [aa, aa, a], never [a, aa, aa]
    val docs = corpus("aaaaa aaaaa b")
    val (merges, segs) = TextAnalysis.bpeTrain(docs, "text", merges = 1)
    assert(merges.head.left === "a" && merges.head.right === "a")
    assert(merges.head.pair_count === 8) // 4 adjacent pairs × 2 occurrences
    assert(segs.find(_._1 == "aaaaa").get._3 === Seq("aa", "aa", "a"))
  }

  test("a pair fused this step does not cascade within the step") {
    // "abab": merge (a,b) → [ab, ab]; the fresh "ab" must not merge with
    // the following raw a/b inside the same pass.
    val docs = corpus("abab abab abab")
    val (_, segs) = TextAnalysis.bpeTrain(docs, "text", merges = 1)
    assert(segs.find(_._1 == "abab").get._3 === Seq("ab", "ab"))
  }

  test("count ties break on lexicographically smallest (left, right)") {
    // zy and yx both occur exactly twice ("zyx zyx"); (y,x) < (z,y).
    val docs = corpus("zyx zyx")
    val (merges, _) = TextAnalysis.bpeTrain(docs, "text", merges = 1)
    assert((merges.head.left, merges.head.right) === (("y", "x")))
  }

  test("weighting is by word frequency, not distinct-word presence") {
    // distinct vocab {ab (×9), cd (×1)}: pair ab outweighs cd 9:1.
    val docs = corpus(Seq.fill(9)("ab").mkString(" ") + " cd")
    val (merges, _) = TextAnalysis.bpeTrain(docs, "text", merges = 2)
    assert(merges.map(m => (m.left, m.right, m.pair_count)) ===
      Seq(("a", "b", 9L), ("c", "d", 1L)))
  }

  test("exhausting mergeable pairs is a named error, not silent truncation") {
    val docs = corpus("ab ab cd") // only 2 possible merges
    val e = intercept[IllegalArgumentException] {
      TextAnalysis.bpeTrain(docs, "text", merges = 3)
    }
    assert(e.getMessage.contains("ran out of mergeable pairs at step 3"))
  }

  test("vocabulary over the driver budget is a named error") {
    val docs = corpus("a ab abc abcd abcde")
    val e = intercept[IllegalArgumentException] {
      TextAnalysis.bpeTrain(docs, "text", merges = 1, maxVocab = 3)
    }
    assert(e.getMessage.contains("driver budget"))
  }

  test("NULL text ≡ blank and tokenization matches the corpus contract") {
    import org.apache.spark.sql.functions._
    val docs = corpus("  ab   ab  ", "AB")
      .union(corpus("ignored").withColumn("text", lit(null).cast("string")))
    val (merges, segs) = TextAnalysis.bpeTrain(docs, "text", merges = 1)
    // lowercasing folds AB into ab; NULL row contributes nothing.
    assert(segs.map(_._1) === Seq("ab"))
    assert(segs.head._2 === 3L)
    assert(merges.head === BpeMerge(1, "a", "b", 3))
  }

  test("DataFrame surfaces carry the gate schemas and orders") {
    val docs = corpus("low low lower")
    val m = TextAnalysis.bpeMergesDf(docs, "text", 2)
    assert(m.columns.toSeq === Seq("step", "left", "right", "pair_count"))
    val s = TextAnalysis.bpeSegmentsDf(docs, "text", 2)
    assert(s.columns.toSeq === Seq("word", "word_count", "n_pieces", "pieces"))
    val rows = s.orderBy("word").collect()
    assert(rows.map(_.getString(0)).toSeq === Seq("low", "lower"))
    assert(rows.map(_.getLong(2)).toSeq.forall(_ >= 1))
  }

  test("corpus tokenization under the learned vocab: counts, compression, empty-doc row") {
    import org.apache.spark.sql.functions.lit
    val docs = corpus("ab ab cd", "ab")
      .union(corpus("ignored").select(lit(2L).as("doc_id"),
        lit(null).cast("string").as("text")))
    // merges=1 learns (a,b): ab -> [ab] (1 piece), cd -> [c,d] (2)
    val out = TextAnalysis.bpeTokenizeCorpus(docs, "text", "doc_id", merges = 1)
      .orderBy("doc_id").collect()
    assert(out.length === 3)
    assert((out(0).getLong(1), out(0).getLong(2), out(0).getDouble(3)) ===
      ((3L, 4L, 1.5))) // 6 chars / 4 pieces
    assert((out(1).getLong(1), out(1).getLong(2), out(1).getDouble(3)) ===
      ((1L, 1L, 2.0)))
    assert((out(2).getLong(1), out(2).getLong(2)) === ((0L, 0L)))
    assert(out(2).isNullAt(3), "empty doc has NULL compression, not a fake 0")
  }

  test("corpus tokenization plans as a broadcast vocab join — the corpus never shuffles for it") {
    import org.apache.spark.sql.functions.lit
    val docs = corpus((0 until 50).map(i => s"w$i common").mkString(" "))
    val out = TextAnalysis.bpeTokenizeCorpus(docs, "text", "doc_id", merges = 2)
    out.count()
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"vocab must broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"the corpus must not shuffle against the vocabulary:\n$plan")
  }

  test("merge table is a pure function of the corpus: invariant to partition layout, 2k-word vocab") {
    import org.apache.spark.sql.functions.col
    // a richer synthetic vocabulary than the fixture's 31 words: 2,000
    // distinct pseudo-words with Zipf-ish weights via repetition
    val rng = graft.backends.DetRng(77L)
    def word(): String = {
      val len = 3 + rng.nextInt(8)
      (0 until len).map(_ => ('a' + rng.nextInt(26)).toChar).mkString
    }
    val vocab = Seq.fill(2000)(word()).distinct
    val texts = (0 until 400).map { i =>
      (0 until 50).map(_ => vocab(rng.nextInt(1 + (vocab.size - 1) * (1 + rng.nextInt(3)) / 3 % vocab.size))).mkString(" ")
    }
    val docs = corpus(texts: _*)
    val one = TextAnalysis.bpeTrain(docs.repartition(1), "text", merges = 48)
    val many = TextAnalysis.bpeTrain(docs.repartition(32, col("doc_id")), "text", merges = 48)
    assert(one._1 === many._1, "merge tables must be layout-invariant")
    assert(one._2 === many._2, "segmentations must be layout-invariant")
  }

  test("astral characters seed ONE symbol, never unpaired surrogate halves") {
    val smile = new String(Character.toChars(0x1F600))
    val docs = corpus(s"${smile}x ${smile}x ${smile}y")
    val (merges, segs) = TextAnalysis.bpeTrain(docs, "text", merges = 1)
    // seg0 of "<smile>x" must be [<smile>, x]: the (smile, x) pair wins 2:1
    assert((merges.head.left, merges.head.right) === ((smile, "x")))
    val sy = segs.find(_._1 == s"${smile}y").get._3
    assert(sy === Seq(smile, "y"))
    assert(sy.forall(sym => !sym.exists(Character.isSurrogate) ||
      sym.codePointCount(0, sym.length) * 2 == sym.length),
      s"no unpaired surrogate symbols: $sy")
  }
}
