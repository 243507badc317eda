package graft

import graft.bql.BayesDB
import org.scalatest.funsuite.AnyFunSuite

/** Seeded random differential battery for the UNCORRELATED relational
  * planner, complementing CorrelatedCrossCheckSpec: generate plain-SQL
  * BQL over the sf0.001 tables and run the identical text through both
  * this planner and `spark.sql` on the same data. The planner compiles
  * BQL itself (lexer → parser → Column compiler), so Catalyst's SQL
  * front-end is an independent second implementation of the semantics.
  *
  * Generation avoids the documented dialect divergences (GLOB, COLLATE,
  * parameter markers, estimator clauses) and non-deterministic shapes
  * (LIMIT without a unique ORDER BY); everything else — expressions,
  * CASE, LIKE, BETWEEN, IN lists, IS NULL, multi-key GROUP BY, HAVING,
  * comma joins, set ops — is fair game.
  */
class RelationalFuzzSpec extends AnyFunSuite {
  import TestSpark._

  private val dir = "/root/testdata/sf0.001"

  private lazy val bdb: BayesDB = {
    val b = new BayesDB(spark, seed = 13L)
    Seq("customer", "nation", "region", "orders").foreach { t =>
      val df = Tables.load(spark, dir, t)
      b.registerTable(t, df)
      df.createOrReplaceTempView(t)
    }
    b
  }

  private def canon(rows: Array[org.apache.spark.sql.Row]): Seq[String] =
    rows.toSeq.map(_.toSeq.map {
      case null => "∅"
      case d: java.lang.Double => f"${d.doubleValue()}%.6f"
      case d: java.math.BigDecimal => f"${d.doubleValue()}%.6f"
      case f: java.lang.Float => f"${f.doubleValue()}%.6f"
      case other => other.toString
    }.mkString("|")).sorted

  // ----------------------------------------------------- generator

  private final class Gen(seed: Long) {
    val rng = new scala.util.Random(seed)
    def pick[A](xs: Seq[A]): A = xs(rng.nextInt(xs.length))

    val numCols = Seq("c_acctbal", "c_nationkey", "c_custkey")
    val strCols = Seq("c_name", "c_mktsegment")

    def numExpr(depth: Int): String =
      if (depth == 0) pick(numCols :+ rng.nextInt(5000).toString)
      else pick(Seq(
        s"${numExpr(depth - 1)} ${pick(Seq("+", "-", "*"))} ${numExpr(depth - 1)}",
        s"${numExpr(depth - 1)} / ${1 + rng.nextInt(9)}",
        s"-(${numExpr(depth - 1)})",
        s"abs(${numExpr(depth - 1)})",
        s"round(${numExpr(depth - 1)}, ${rng.nextInt(3)})",
        s"case when ${predicate(0)} then ${numExpr(depth - 1)}" +
          s" else ${numExpr(depth - 1)} end",
        s"ifnull(${numExpr(depth - 1)}, ${rng.nextInt(100)})",
        numExpr(depth - 1)))

    def strExpr(): String = pick(Seq(
      pick(strCols),
      s"upper(${pick(strCols)})",
      s"lower(${pick(strCols)})",
      s"${pick(strCols)} || '_' || ${pick(strCols)}",
      s"substr(${pick(strCols)}, 1, ${1 + rng.nextInt(6)})",
      s"trim(${pick(strCols)})"))

    def predicate(depth: Int): String = {
      // operands stay non-recursive: numExpr's CASE branch calls back
      // into predicate, and the alternatives are built eagerly, so a
      // numExpr operand here would recurse forever
      val operand = pick(numCols :+ rng.nextInt(5000).toString)
      val base = pick(Seq(
        s"${pick(numCols)} ${pick(Seq("<", "<=", ">", ">=", "=", "<>"))} $operand",
        s"${pick(numCols)} between ${rng.nextInt(50)} and ${50 + rng.nextInt(5000)}",
        s"${pick(numCols)} in (${Seq.fill(2 + rng.nextInt(3))(rng.nextInt(30)).mkString(", ")})",
        // BQL LIKE is case-insensitive (SQLite semantics, q09 oracle);
        // spark.sql's is case-sensitive — uppercase patterns against the
        // all-caps segment column behave identically in both
        s"c_mktsegment like '%${('A' + rng.nextInt(26)).toChar}%'",
        s"${pick(strCols)} is not null",
        s"${pick(numCols)} % ${2 + rng.nextInt(7)} = ${rng.nextInt(2)}"))
      if (depth == 0) base
      else s"(${predicate(depth - 1)} ${pick(Seq("and", "or"))} ${predicate(depth - 1)})"
    }

    val aggFns = Seq(
      () => s"count(*)",
      () => s"count(${pick(numCols ++ strCols)})",
      () => s"sum(c_acctbal)",
      () => s"avg(c_acctbal)",
      () => s"min(${pick(numCols)})",
      () => s"max(${pick(numCols)})",
      () => s"count(distinct ${pick(Seq("c_nationkey", "c_mktsegment"))})")

    /** Ungrouped scan: projection + filter + unique-key order + limit. */
    def flatQuery(): String = {
      val items = (1 to 1 + rng.nextInt(3)).map(i =>
        pick(Seq(s"${numExpr(rng.nextInt(3))} as v$i", s"${strExpr()} as v$i")))
      val distinct = if (rng.nextInt(4) == 0) "distinct " else ""
      val lim =
        if (distinct.isEmpty && rng.nextInt(2) == 0)
          s" order by c_custkey limit ${5 + rng.nextInt(40)}"
        else ""
      val proj = if (lim.nonEmpty) s"c_custkey, ${items.mkString(", ")}"
        else items.mkString(", ")
      s"select $distinct$proj from customer where ${predicate(rng.nextInt(2))}$lim"
    }

    /** Grouped aggregate: multi-key GROUP BY + HAVING. */
    def groupQuery(): String = {
      val keys = rng.shuffle(Seq("c_nationkey", "c_mktsegment"))
        .take(1 + rng.nextInt(2))
      val aggs = (1 to 1 + rng.nextInt(3)).map(i => s"${pick(aggFns)()} as a$i")
      val having = if (rng.nextInt(2) == 0) s" having ${pick(aggFns)()} ${pick(Seq(">", ">="))} ${rng.nextInt(5)}" else ""
      s"select ${keys.mkString(", ")}, ${aggs.mkString(", ")} from customer" +
        s" where ${predicate(rng.nextInt(2))}" +
        s" group by ${keys.mkString(", ")}$having"
    }

    /** Comma join + equality WHERE + grouped rollup. */
    def joinQuery(): String = {
      val extra = predicate(0).replaceAll("\\bc_name\\b", "c.c_name")
        .replaceAll("\\bc_mktsegment\\b", "c.c_mktsegment")
        .replaceAll("\\bc_acctbal\\b", "c.c_acctbal")
        .replaceAll("\\bc_custkey\\b", "c.c_custkey")
        .replaceAll("\\bc_nationkey\\b", "c.c_nationkey")
      s"select n.n_name, count(*) as n_c, ${pick(Seq("sum", "avg", "max"))}(c.c_acctbal) as s_c" +
        " from customer as c, nation as n where c.c_nationkey = n.n_nationkey" +
        s" and $extra group by n.n_name"
    }

    /** FROM-subquery: aggregate over a filtered projection. */
    def subQuery(): String =
      s"select count(*) as n, ${pick(Seq("sum", "avg", "min", "max"))}(v) as s" +
        s" from (select ${numExpr(1 + rng.nextInt(2))} as v from customer" +
        s" where ${predicate(rng.nextInt(2))}) as t" +
        s" where v ${pick(Seq("<", ">", ">=", "<="))} ${rng.nextInt(4000)}"

    /** 3-way star: customer → nation → region rollup. */
    def join3Query(): String = {
      val extra = predicate(0).replaceAll("\\b(c_[a-z]+)\\b", "c.$1")
      s"select r.r_name, count(*) as n_c," +
        s" ${pick(Seq("sum", "avg", "min", "max"))}(c.c_acctbal) as s_c" +
        " from customer as c, nation as n, region as r" +
        " where c.c_nationkey = n.n_nationkey and n.n_regionkey = r.r_regionkey" +
        s" and $extra group by r.r_name" +
        (if (rng.nextInt(2) == 0) " having count(*) >= 1" else "")
    }

    /** Fact-table join: orders × customer rollup. */
    def factJoinQuery(): String =
      s"select c.c_mktsegment, count(*) as n_o," +
        s" round(${pick(Seq("sum", "avg", "max"))}(o.o_totalprice), 4) as s_o" +
        " from orders as o, customer as c where o.o_custkey = c.c_custkey" +
        s" and o.o_totalprice ${pick(Seq("<", ">", ">=", "<="))} ${10000 + rng.nextInt(300000)}" +
        " group by c.c_mktsegment"

    // set ops are a DataFrame-level extension (q16), not BQL grammar —
    // the generator stays inside the parsed dialect
    def next(): String = rng.nextInt(6) match {
      case 0 => flatQuery()
      case 1 => groupQuery()
      case 2 => joinQuery()
      case 3 => join3Query()
      case 4 => factJoinQuery()
      case _ => subQuery()
    }
  }

  test("mutated queries fail with governed errors, never engine corruption") {
    bdb // force registration
    val gen = new Gen(77L)
    val rng = new scala.util.Random(99L)
    def mutate(q: String): String = {
      val toks = q.split(" ").toSeq
      rng.nextInt(4) match {
        case 0 => toks.patch(rng.nextInt(toks.length), Nil, 1).mkString(" ")
        case 1 =>
          val i = rng.nextInt(toks.length)
          toks.patch(i, Seq(toks(rng.nextInt(toks.length)), toks(i)), 1).mkString(" ")
        case 2 => rng.shuffle(toks).mkString(" ")
        case _ => q.take(1 + rng.nextInt(q.length))
      }
    }
    // smoking guns: error classes that indicate an unguarded internal
    // path rather than a governed rejection, anywhere in the cause chain
    val forbidden = Set("scala.MatchError", "java.lang.NullPointerException",
      "java.lang.StackOverflowError", "java.lang.ClassCastException",
      "java.lang.ArrayIndexOutOfBoundsException",
      "java.lang.StringIndexOutOfBoundsException")
    def smokingGun(e: Throwable): Option[Throwable] = {
      var cur: Throwable = e
      var seen = 0
      while (cur != null && seen < 8) {
        if (forbidden(cur.getClass.getName)) return Some(cur)
        cur = cur.getCause
        seen += 1
      }
      None
    }
    val bad = scala.collection.mutable.ListBuffer.empty[String]
    (1 to 300).foreach { _ =>
      val q = mutate(gen.next())
      try { bdb.execute(q).collect(); () }
      catch {
        case e: Throwable => smokingGun(e).foreach(g =>
          bad += s"$q\n  -> ${g.getClass.getName}: ${String.valueOf(g.getMessage).take(150)}")
      }
    }
    assert(bad.isEmpty,
      s"${bad.length} ungoverned failures:\n${bad.take(5).mkString("\n\n")}")
    // and the engine is still healthy afterwards
    assert(bdb.execute("select count(*) as n from nation")
      .collect().head.getLong(0) == 25L)
  }

  test("negative control: the harness sees the known LIKE dialect split") {
    // BQL LIKE is case-insensitive (SQLite semantics), spark.sql's is
    // case-sensitive — a lowercase pattern against the all-caps segment
    // column MUST split the engines; if it ever stops splitting, either
    // the harness went blind or the documented divergence changed
    val q = "select count(*) as n from customer where c_mktsegment like '%u%'"
    val ours = canon(bdb.execute(q).collect())
    val theirs = canon(spark.sql(q).collect())
    assert(ours != theirs,
      s"known LIKE divergence must be visible to the harness: both said $ours")
  }

  test("400 generated relational queries match spark.sql exactly") {
    import scala.concurrent.{Await, Future, ExecutionContext}
    import scala.concurrent.duration._
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(
      java.util.concurrent.Executors.newFixedThreadPool(8))
    bdb // force registration
    val gen = new Gen(2025L)
    val queries = Seq.fill(400)(gen.next()).distinct
    val results = Await.result(Future.traverse(queries) { q =>
      Future {
        try {
          val ours = canon(bdb.execute(q).collect())
          val theirs = canon(spark.sql(q).collect())
          if (ours == theirs) None
          else Some(s"$q\n  ours:   ${ours.take(4)}\n  theirs: ${theirs.take(4)}")
        } catch {
          case e: Exception => Some(s"$q\n  threw: ${e.getMessage.take(200)}")
        }
      }
    }, 15.minutes)
    val mismatches = results.flatten
    assert(mismatches.isEmpty,
      s"${mismatches.length} mismatches:\n${mismatches.take(5).mkString("\n\n")}")
    info(s"compared ${queries.length} distinct generated queries, 0 mismatches")
  }
}
