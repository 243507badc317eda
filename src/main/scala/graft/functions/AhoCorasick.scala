package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Aho–Corasick multi-pattern automaton (Aho & Corasick 1975) — the
  * banned-phrase blocklist scan of a C4/RefinedWeb-class curation
  * pipeline, where the pattern set is a bounded dictionary (word/phrase
  * blocklists run to ~10^6 entries) and the corpus is 100 TB: ONE
  * automaton walk per document finds every occurrence of every pattern,
  * instead of |patterns| regex/LIKE passes.
  *
  * The trie + BFS failure links are standard; two precomputed per-node
  * tables keep the scan linear: `cntAll(v)` = patterns ending at v or
  * any of its fail-suffixes (so the TOTAL match count — overlapping and
  * nested matches included — is one array read per character), and
  * `outLink(v)` = nearest fail-suffix with a pattern end (so DISTINCT
  * pattern marking walks only real match chains, O(total matches), the
  * dictionary-suffix-link construction). Matching is case-folded
  * (Locale.ROOT, the HashedLogOdds convention).
  *
  * Build is driver-side under explicit budgets with named errors (the
  * bpeTrain discipline): the automaton is a pure function of the
  * pattern list, built once and shipped to executors as a plan
  * reference object — broadcast-class state, zero per-row setup.
  */
final class AcAutomaton private (
    private val next: Array[java.util.HashMap[Character, Integer]],
    private val fail: Array[Int],
    private val cntAll: Array[Int],
    private val outLink: Array[Int],
    private val endsHere: Array[Array[Int]],
    val nPatterns: Int) extends Serializable {

  /** Generation-stamped distinct-pattern marks: `stamp(pid) == gen`
    * means "seen in the CURRENT scan", so a scan costs one counter
    * bump instead of zeroing an nPatterns-sized array per row (~1 MB
    * per document at the 2^20-pattern budget, which dominated the
    * linear walk). One scratch per thread — the automaton is a shared
    * plan reference object scanned by many tasks concurrently. */
  private final class Scratch(n: Int) {
    val stamp = new Array[Int](n)
    var gen = 0
  }
  @transient private lazy val scratch = new ThreadLocal[Scratch] {
    override def initialValue(): Scratch = new Scratch(nPatterns)
  }

  /** Scan `text` (case-folded) and return {total matches, distinct
    * patterns matched}. Total counts every (pattern, end position)
    * pair — overlapping occurrences and patterns nested inside longer
    * matches included, the AC reporting contract. */
  def scan(text: String): Array[Long] = {
    val s = text.toLowerCase(java.util.Locale.ROOT)
    val sc = scratch.get()
    // wrap-safe: on Int exhaustion (2^31 scans on one thread) re-zero
    // once — a stale stamp must never alias a fresh generation
    if (sc.gen == Int.MaxValue) {
      java.util.Arrays.fill(sc.stamp, 0); sc.gen = 0
    }
    sc.gen += 1
    val gen = sc.gen
    val seen = sc.stamp
    var distinct = 0L
    var total = 0L
    var st = 0
    var i = 0
    while (i < s.length) {
      val ch = s.charAt(i)
      var v = st
      var nx = next(v).get(ch)
      while (nx == null && v != 0) { v = fail(v); nx = next(v).get(ch) }
      st = if (nx == null) 0 else nx.intValue()
      total += cntAll(st)
      if (distinct < nPatterns) {
        var o = if (endsHere(st).length > 0) st else outLink(st)
        while (o != -1) {
          val ends = endsHere(o)
          var j = 0
          while (j < ends.length) {
            if (seen(ends(j)) != gen) { seen(ends(j)) = gen; distinct += 1L }
            j += 1
          }
          o = outLink(o)
        }
      }
      i += 1
    }
    Array(total, distinct)
  }
}

object AcAutomaton {

  /** Build from a pattern list. Patterns are case-folded; empty or
    * duplicate (post-fold) patterns and budget overruns are named
    * errors — a silent dedup or truncation would make the gate's
    * verdict unauditable. */
  def build(patterns: Seq[String], maxPatterns: Int = 1 << 20,
      maxNodes: Int = 1 << 23): AcAutomaton = {
    require(patterns.nonEmpty, "blocklist is empty — a no-op gate is a config error")
    require(patterns.size <= maxPatterns,
      s"blocklist has ${patterns.size} patterns, over the $maxPatterns budget")
    val folded = patterns.map(_.toLowerCase(java.util.Locale.ROOT))
    require(folded.forall(_.nonEmpty), "blocklist contains an empty pattern")
    require(folded.distinct.size == folded.size,
      "blocklist contains duplicate patterns after case folding")

    val next = scala.collection.mutable.ArrayBuffer(
      new java.util.HashMap[Character, Integer]())
    val ends = scala.collection.mutable.ArrayBuffer(Array.empty[Int])
    folded.zipWithIndex.foreach { case (p, pid) =>
      var v = 0
      p.foreach { ch =>
        val nx = next(v).get(ch)
        v = if (nx != null) nx.intValue() else {
          next += new java.util.HashMap[Character, Integer]()
          ends += Array.empty[Int]
          require(next.size <= maxNodes,
            s"blocklist trie exceeds the $maxNodes node budget")
          next(v).put(ch, next.size - 1)
          next.size - 1
        }
      }
      ends(v) = ends(v) :+ pid
    }
    val n = next.size
    val fail = new Array[Int](n)
    val cntAll = new Array[Int](n)
    val outLink = Array.fill(n)(-1)
    val queue = new java.util.ArrayDeque[Int]()
    next(0).forEach { (_, c) => fail(c) = 0; queue.add(c) }
    cntAll(0) = ends(0).length // always 0: empty patterns are rejected
    val order = scala.collection.mutable.ArrayBuffer.empty[Int]
    while (!queue.isEmpty) {
      val v = queue.poll()
      order += v
      next(v).forEach { (ch, c) =>
        var f = fail(v)
        var nx = next(f).get(ch)
        while (nx == null && f != 0) { f = fail(f); nx = next(f).get(ch) }
        fail(c) = if (nx == null || nx.intValue() == c.intValue()) 0 else nx.intValue()
        queue.add(c)
      }
    }
    order.foreach { v =>
      cntAll(v) = ends(v).length + cntAll(fail(v))
      outLink(v) = if (ends(fail(v)).length > 0) fail(v) else outLink(fail(v))
    }
    new AcAutomaton(next.toArray, fail, cntAll, outLink, ends.toArray,
      folded.size)
  }
}

/** Blocklist scan as a native codegen'd expression: returns
  * `[total_matches, distinct_patterns]` (ArrayType(Long)). The
  * automaton is embedded as a plan reference object, so the
  * corpus-wide gate carries ZERO exchanges — the p75 Bloom-probe
  * shape, with multi-pattern counting instead of membership. NULL for
  * NULL text (callers coalesce when NULL ≡ blank is wanted). */
case class AcScan(child: Expression, patterns: Seq[String])
    extends UnaryExpression {

  @transient private lazy val auto: AcAutomaton = AcAutomaton.build(patterns)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if patterns.nonEmpty => TypeCheckResult.TypeCheckSuccess
    case StringType => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs a non-empty pattern list")
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs a string input, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_ac_scan"

  override protected def nullSafeEval(v: Any): Any =
    UnsafeArrayData.fromPrimitiveArray(
      auto.scan(v.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val acRef = ctx.addReferenceObj("acAutomaton", auto,
      classOf[AcAutomaton].getName)
    nullSafeCodeGen(ctx, ev, v =>
      s"""${ev.value} =
         |  org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(
         |    $acRef.scan($v.toString()));""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object AcScan {
  def apply(text: Column, patterns: Seq[String]): Column =
    ColumnBridge.column(AcScan(ColumnBridge.expression(text), patterns))
}
