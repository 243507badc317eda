package graft

import graft.bql.BayesDB
import org.scalatest.funsuite.AnyFunSuite

/** Cross-engine check of the correlated-subquery machinery: the same
  * SQL text runs through the BQL planner (which decorrelates at the
  * prepass into grouped/theta joins) and through `spark.sql` (Catalyst's
  * own SQL-path decorrelation), over the same data — two independent
  * implementations of the semantics, compared result-for-result. The
  * template space crosses aggregates × correlation conjuncts ×
  * EXISTS/IN mask shapes (grouped, LIMIT, HAVING, NOT IN, depth-2 refs)
  * × outer positions, far beyond the handpicked spec cases. Shapes one
  * engine rejects (named D3 residuals on ours; UNSUPPORTED_SUBQUERY on
  * Catalyst's stricter SQL path) are skipped and counted — the assert
  * requires a floor of genuinely compared queries and zero mismatches. */
class CorrelatedCrossCheckSpec extends AnyFunSuite {
  import TestSpark._

  private lazy val bdb: BayesDB = {
    val b = new BayesDB(spark, seed = 7L)
    import spark.implicits._
    val dept = Seq((1L, "eng"), (2L, "ops"), (3L, "hr"), (4L, "empty"))
      .toDF("dk", "dname")
    val emp = Seq(
      (1L, "ann", Option(100.0)), (1L, "bob", Option(150.0)),
      (1L, "gil", Option.empty[Double]),
      (2L, "cid", Option(90.0)), (2L, "dee", Option(120.0)),
      (2L, "eve", Option(80.0)),
      (3L, "fay", Option(110.0)), (3L, "hal", Option(110.0)))
      .toDF("edk", "ename", "sal")
    b.registerTable("fdept", dept)
    b.registerTable("femp", emp)
    dept.createOrReplaceTempView("fdept")
    emp.createOrReplaceTempView("femp")
    b
  }

  private val aggs = Seq("count(*)", "count(sal)", "sum(sal)", "max(sal)", "avg(sal)")

  private val corrs = Seq(
    "m.edk = dk",
    "m.sal > dk * 40",
    "m.edk = dk and m.sal > dk * 30",
    "m.sal < dk * 60 or m.edk = dk")

  private val masks = Seq(
    "",
    " and exists (select 1 from femp as e2 where e2.edk = m.edk and e2.sal > m.sal)",
    " and not exists (select 1 from femp as e2 where e2.edk = m.edk and e2.sal > m.sal)",
    " and exists (select ename from femp as e2 where e2.edk = dk and e2.sal > m.sal" +
      " group by ename limit 2)",
    " and exists (select 1 from femp as e2 where e2.edk = m.edk" +
      " group by e2.ename having max(e2.sal) > m.sal)",
    " and m.sal in (select e2.sal from femp as e2 where e2.edk = dk and e2.sal > 85" +
      " group by e2.sal)",
    " and m.sal in (select e2.sal from femp as e2 where e2.edk = m.edk" +
      " group by e2.sal having count(*) >= 1)",
    " and m.sal not in (select e2.sal from femp as e2 where e2.edk = m.edk and e2.sal > 100)")

  private def scalars: Seq[String] =
    for (a <- aggs; c <- corrs; mk <- masks)
      yield s"select $a from femp as m where $c$mk"

  private def outers(sc: String): Seq[String] = Seq(
    s"select dname, ($sc) as v from fdept order by dname",
    s"select dname from fdept where ifnull(($sc), -1) > 1 order by dname")

  /** Normalized collected rows: stringified with doubles rounded, rows
    * sorted — engine-order-independent. */
  private def canon(rows: Array[org.apache.spark.sql.Row]): Seq[String] =
    rows.toSeq.map(_.toSeq.map {
      case null => "∅"
      case d: java.lang.Double => f"${d.doubleValue()}%.9f"
      case d: java.math.BigDecimal => f"${d.doubleValue()}%.9f"
      case other => other.toString
    }.mkString("|")).sorted

  /** Run (oursSql, sparkSql) pairs through both engines; returns
    * (compared, oursRejected, sparkRejected, mismatches). */
  private def crossCheck(pairs: Seq[(String, String)]): (Int, Int, Int, Seq[String]) = {
    import scala.concurrent.{Await, Future, ExecutionContext}
    import scala.concurrent.duration._
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(
      java.util.concurrent.Executors.newFixedThreadPool(8))
    sealed trait Res
    case object OursRejected extends Res
    case object SparkRejected extends Res
    case class Compared(mismatch: Option[String]) extends Res
    val results = Await.result(Future.traverse(pairs) { case (oursSql, sparkSql) =>
      Future {
        try {
          val o = canon(bdb.execute(oursSql).collect())
          try {
            val t = canon(spark.sql(sparkSql).collect())
            Compared(if (o == t) None
              else Some(s"$oursSql\n  ours:   $o\n  theirs: $t"))
          } catch {
            case _: org.apache.spark.sql.AnalysisException => SparkRejected
          }
        } catch { case _: UnsupportedOperationException => OursRejected }
      }
    }, 15.minutes)
    (results.count(_.isInstanceOf[Compared]), results.count(_ == OursRejected),
      results.count(_ == SparkRejected),
      results.collect { case Compared(Some(m)) => m })
  }

  test("correlated FROM-subquery flattening matches Spark LATERAL") {
    // SQLite (and the reference) resolve outer names from FROM-subquery
    // bodies; Spark only via LATERAL — so ours runs the bare form (the
    // flattening path) and Spark runs the LATERAL spelling of the SAME
    // query. Projections include computed and outer-referencing items.
    val fAggs = Seq("count(*)", "max(s)", "sum(s)", "avg(s)")
    val projs = Seq("sal as s", "sal * 2 as s", "sal + dk as s")
    val inners = Seq("edk = dk", "edk = dk and sal > 85", "sal > dk * 40")
    val twheres = Seq("", " where t.s > 100")
    val pairs = for (a <- fAggs; p <- projs; ic <- inners; tw <- twheres) yield {
      def q(lateral: String) =
        s"select dname, (select $a from $lateral(select $p from femp" +
          s" where $ic) as t$tw) as v from fdept order by dname"
      (q(""), q("lateral "))
    }
    val (compared, skippedOurs, skippedSpark, mismatches) = crossCheck(pairs)
    info(s"compared $compared, ours-rejected $skippedOurs, spark-rejected $skippedSpark")
    assert(mismatches.isEmpty,
      s"${mismatches.length} cross-engine mismatches:\n${mismatches.take(3).mkString("\n")}")
    // round 8 closed the agg-argument-outer-ref shapes: ALL 72 compare
    assert(compared >= 70, s"only $compared of ${pairs.length} compared")
  }

  test("depth-2 and scalar-in-scalar shapes match Catalyst") {
    // nested correlation: the inner subquery references the mid frame
    // (peeled via equality pairs) or the outer frame directly (deep
    // refs, key-tuple carried) — the machinery's hardest paths
    val inner2 = Seq(
      "(select avg(e2.sal) from femp as e2 where e2.edk = m.edk)",
      "(select max(e2.sal) from femp as e2 where e2.edk = dk)",
      "(select count(*) from femp as e2 where e2.edk = m.edk and e2.sal > m.sal)")
    val cmps = Seq("m.sal >", "m.sal + 5 <", "m.sal =")
    val aggs2 = Seq("count(*)", "sum(m.sal)", "max(m.sal)")
    val pairs = for (a <- aggs2; i2 <- inner2; c <- cmps) yield {
      val q = s"select dname, (select $a from femp as m where m.edk = dk" +
        s" and $c $i2) as v from fdept order by dname"
      (q, q)
    }
    val (compared, skippedOurs, skippedSpark, mismatches) = crossCheck(pairs)
    info(s"compared $compared, ours-rejected $skippedOurs, spark-rejected $skippedSpark")
    assert(mismatches.isEmpty,
      s"${mismatches.length} cross-engine mismatches:\n${mismatches.take(3).mkString("\n")}")
    assert(compared >= 15, s"only $compared of ${pairs.length} compared")
  }

  test("BQL decorrelation matches Catalyst SQL-path decorrelation") {
    val queries = for (sc <- scalars; sql <- outers(sc)) yield (sql, sql)
    val (compared, skippedOurs, skippedSpark, mismatches) = crossCheck(queries)
    info(s"compared $compared, ours-rejected $skippedOurs, spark-rejected $skippedSpark")
    assert(mismatches.isEmpty,
      s"${mismatches.length} cross-engine mismatches:\n${mismatches.take(3).mkString("\n")}")
    // the template space is 5×4×8×2 = 320; most must genuinely compare
    assert(compared >= 200, s"only $compared of 320 queries compared — " +
      "the cross-check lost its coverage (engine rejections grew)")
  }
}
