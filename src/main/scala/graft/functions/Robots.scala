package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** robots.txt parsing + path matching (RFC 9309 core) — the fetch-gate
  * a crawl pipeline evaluates BEFORE p70's WARC ingest ever sees a
  * page. Two kernels so the parse is paid once per DOMAIN and the
  * match once per URL:
  *
  *  - [[RobotsParse]](rulesText, agent): the rule group for `agent` —
  *    consecutive `User-agent:` lines stack onto one group; groups
  *    naming the agent's product token EXACTLY (case-insensitive)
  *    take precedence over `*` groups, and all matching groups'
  *    rules combine (RFC 9309 §2.2.1 — exact product-token matching;
  *    the LONGEST-match rule in the RFC is for path rules, not agent
  *    selection); `Allow:`/`Disallow:` values are kept verbatim
  *    (empty Disallow = nothing disallowed, dropped); unknown
  *    directives (Crawl-delay, Sitemap, …) are fully ignored and do
  *    not sever an agent run (§2.2.4).
  *  - [[RobotsMatch]](rules, path): RFC 9309 §2.2.2 — a rule matches
  *    if its pattern matches a PREFIX of the path, with `*` matching
  *    any run and a trailing `$` anchoring the pattern to the path
  *    end; the most specific (longest raw pattern) match wins, ties
  *    prefer Allow, residual ties resolve to the earliest rule; no
  *    match → allowed.
  *
  * Scale shape: robots texts live on the DOMAIN table (bounded,
  * orders of magnitude below the URL corpus), so the parse output —
  * an array of (allow, pattern) structs — joins onto the frontier by
  * host and every URL pays one codegen'd array walk, zero exchange
  * beyond the host join. Reference has no crawl surface; pipeline
  * extension (pairs with p52's frontier and p70's WARC ingest). */
object RobotsKernel {

  /** Parsed rule: allow flag + raw pattern. */
  final case class Rule(allow: Boolean, pat: String)

  def parse(text: String, agent: String): Array[Rule] = {
    val agentLc = agent.toLowerCase(java.util.Locale.ROOT)
    // groups: (agent tokens, rules)
    val groups = scala.collection.mutable.ArrayBuffer
      .empty[(scala.collection.mutable.ArrayBuffer[String],
              scala.collection.mutable.ArrayBuffer[Rule])]
    var inAgentRun = false
    text.split("\n", -1).foreach { raw =>
      val line = raw.takeWhile(_ != '#').trim
      val ci = line.indexOf(':')
      if (ci > 0) {
        val key = line.substring(0, ci).trim.toLowerCase(java.util.Locale.ROOT)
        val value = line.substring(ci + 1).trim
        key match {
          case "user-agent" =>
            if (!inAgentRun || groups.isEmpty) {
              groups += ((scala.collection.mutable.ArrayBuffer.empty[String],
                scala.collection.mutable.ArrayBuffer.empty[Rule]))
            }
            groups.last._1 += value.toLowerCase(java.util.Locale.ROOT)
            inAgentRun = true
          case "allow" | "disallow" =>
            inAgentRun = false
            if (groups.nonEmpty && value.nonEmpty)
              groups.last._2 += Rule(key == "allow", value)
          // empty Disallow (nothing disallowed) and empty Allow are
          // both no-ops; rules before any User-agent line are ignored
          //
          // unknown directives (Crawl-delay, Sitemap, …) are FULLY
          // ignored — in particular one between two User-agent lines
          // must not sever the agent run (RFC 9309 §2.2.4: lines with
          // unrecognized keys are skipped, so `ua: a / Crawl-delay /
          // ua: b / rules` is ONE group naming both agents)
          case _ =>
        }
      }
    }
    val named = groups.filter(_._1.contains(agentLc))
    val chosen = if (named.nonEmpty) named else groups.filter(_._1.contains("*"))
    chosen.flatMap(_._2).toArray
  }

  /** Does `pat` (with `*` wildcards, optional trailing `$` anchor)
    * match a prefix of `path`? Iterative single-backtrack-point glob —
    * O(|pat|·|path|) worst case, so a hostile robots.txt stacking
    * wildcards cannot blow the matcher up (robots texts are
    * third-party input; a naive recursive backtracker is exponential
    * on patterns like `*a*a*a*a`). */
  def patMatches(pat: String, path: String): Boolean = {
    val anchored = pat.nonEmpty && pat.charAt(pat.length - 1) == '$'
    val p = if (anchored) pat.substring(0, pat.length - 1) else pat
    var pi = 0
    var si = 0
    var starPi = -1
    var starSi = -1
    while (true) {
      if (pi == p.length) {
        // pattern exhausted: a prefix match succeeds outright; an
        // anchored match needs the whole path consumed, else retry
        // from the most recent star one character further along
        if (!anchored || si == path.length) return true
        if (starPi < 0) return false
        starSi += 1
        if (starSi > path.length) return false
        pi = starPi + 1; si = starSi
      } else if (p.charAt(pi) == '*') {
        starPi = pi; starSi = si; pi += 1
      } else if (si < path.length && path.charAt(si) == p.charAt(pi)) {
        pi += 1; si += 1
      } else {
        if (starPi < 0) return false
        starSi += 1
        if (starSi > path.length) return false
        pi = starPi + 1; si = starSi
      }
    }
    false // unreachable
  }

  /** (allowed, winning rule pattern or null): longest raw pattern
    * wins, ties prefer Allow, then earliest rule; no match → allowed. */
  def decide(rules: Array[Rule], path: String): (Boolean, String) = {
    var best: Rule = null
    rules.foreach { r =>
      if (patMatches(r.pat, path) &&
          (best == null || r.pat.length > best.pat.length ||
           (r.pat.length == best.pat.length && r.allow && !best.allow)))
        best = r
    }
    if (best == null) (true, null) else (best.allow, best.pat)
  }
}

/** [[RobotsKernel.parse]] as an expression: string → array of
  * struct(allow, pat). NULL text parses as an empty rule set (a
  * missing robots.txt allows everything — crawl convention), via the
  * caller coalescing; the expression itself is NULL-propagating. */
case class RobotsParse(child: Expression, agent: String)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if agent.nonEmpty => TypeCheckResult.TypeCheckSuccess
    case StringType => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs a non-empty agent")
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs a string input, got ${other.simpleString}")
  }
  override def dataType: DataType = RobotsParse.schema
  override def nullable: Boolean = true
  override def prettyName: String = "graft_robots_parse"

  override protected def nullSafeEval(v: Any): Any =
    RobotsParse.toArrayData(
      RobotsKernel.parse(v.asInstanceOf[UTF8String].toString, agent))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val agentRef = ctx.addReferenceObj("agent", agent, "java.lang.String")
      s"""${ev.value} = graft.functions.RobotsParse.toArrayData(
         |  graft.functions.RobotsKernel.parse($v.toString(), $agentRef));""".stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RobotsParse {
  val schema: DataType = ArrayType(StructType(Seq(
    StructField("allow", BooleanType, nullable = false),
    StructField("pat", StringType, nullable = false))), containsNull = false)

  def toArrayData(rules: Array[RobotsKernel.Rule]): ArrayData =
    new GenericArrayData(rules.map(r => InternalRow(
      r.allow, UTF8String.fromString(r.pat))).toArray[Any])

  def apply(text: Column, agent: String): Column =
    ColumnBridge.column(RobotsParse(ColumnBridge.expression(text), agent))
}

/** [[RobotsKernel.decide]] as an expression: (rules, path) →
  * struct(allowed, rule) with rule NULL when no pattern matched (the
  * allow-by-default case). */
case class RobotsMatch(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(s: StructType, _), StringType)
        if s.fieldNames.sameElements(Array("allow", "pat")) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs (robots rules array, string path), got " +
          s"${l.simpleString(10)} and ${r.simpleString(10)}")
    }
  override def dataType: DataType = StructType(Seq(
    StructField("allowed", BooleanType, nullable = false),
    StructField("rule", StringType, nullable = true)))
  override def nullable: Boolean = true
  override def prettyName: String = "graft_robots_match"

  override protected def nullSafeEval(rules: Any, path: Any): Any =
    RobotsMatch.kernel(rules.asInstanceOf[ArrayData],
      path.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (r, p) =>
      s"${ev.value} = graft.functions.RobotsMatch.kernel($r, $p);")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
}

object RobotsMatch {
  def kernel(rules: ArrayData, path: UTF8String): InternalRow = {
    val n = rules.numElements()
    val arr = new Array[RobotsKernel.Rule](n)
    var i = 0
    while (i < n) {
      val row = rules.getStruct(i, 2)
      arr(i) = RobotsKernel.Rule(row.getBoolean(0), row.getUTF8String(1).toString)
      i += 1
    }
    val (allowed, rule) = RobotsKernel.decide(arr, path.toString)
    InternalRow(allowed, if (rule == null) null else UTF8String.fromString(rule))
  }

  def apply(rules: Column, path: Column): Column =
    ColumnBridge.column(RobotsMatch(
      ColumnBridge.expression(rules), ColumnBridge.expression(path)))
}
