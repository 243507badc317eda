package graft.functions

/** Kernel-semantics-critical helpers shared by the fused counting
  * expressions ([[QualityStats]], [[GopherStats]]) — ONE definition of
  * the Java-regex \\s class, the split("\\s+", -1) token count, and
  * the stopword set, so the kernels cannot silently desynchronize. */
private[functions] object TextKernelUtil {

  /** Java regex \\s, exactly: space, tab, LF, vertical tab, FF, CR. */
  def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  val stopwords: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    graft.operators.TextAnalysis.Stopwords.foreach(s.add)
    s
  }

  /** split("\\s+", -1).length on a non-empty string = 1 + number of
    * maximal whitespace runs (a leading run yields the leading empty
    * token, a trailing run the trailing one — both kept by limit -1). */
  def splitCount(s: String): Long = {
    var runs = 0L
    var inRun = false
    var i = 0
    while (i < s.length) {
      if (isWs(s.charAt(i))) { if (!inRun) { runs += 1; inRun = true } }
      else inRun = false
      i += 1
    }
    1L + runs
  }
}
