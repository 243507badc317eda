package graft

import graft.bql.BayesDB
import org.scalatest.funsuite.AnyFunSuite

/** Correlated subqueries (reference: inherited from SQLite,
  * src/compiler.py:1795-1797 passes any `(query)` through; we decorrelate
  * the equality-correlated forms — D3 narrowed in round 4). */
class CorrelatedSubquerySpec extends AnyFunSuite {
  import TestSpark._

  private lazy val bdb: BayesDB = {
    val b = new BayesDB(spark, seed = 11L)
    import spark.implicits._
    b.registerTable("dept", Seq(
      (1L, "eng"), (2L, "ops"), (3L, "empty")).toDF("dk", "dname"))
    b.registerTable("emp", Seq(
      (1L, "ann", 100.0), (1L, "bob", 150.0), (2L, "cid", 90.0),
      (2L, "dee", 120.0), (2L, "eve", 80.0)).toDF("edk", "ename", "sal"))
    b.registerTable("bonus", Seq(
      (1L, Option(10.0)), (2L, Option.empty[Double])).toDF("bk", "amt"))
    b
  }

  private def rows(sql: String): Seq[Seq[Any]] =
    bdb.execute(sql).collect().toSeq.map(_.toSeq)

  test("correlated scalar count decorrelates; empty group counts 0") {
    assert(rows("select dname, (select count(*) from emp where edk = dk) from dept order by dname") ==
      Seq(Seq("empty", 0L), Seq("eng", 2L), Seq("ops", 3L)))
  }

  test("correlated scalar max; empty group is NULL") {
    assert(rows("select dname, (select max(sal) from emp where edk = dk) from dept order by dname") ==
      Seq(Seq("empty", null), Seq("eng", 150.0), Seq("ops", 120.0)))
  }

  test("correlated scalar with residual inner filter") {
    assert(rows("select dname, (select count(ename) from emp where edk = dk and sal > 95) from dept order by dname") ==
      Seq(Seq("empty", 0L), Seq("eng", 2L), Seq("ops", 1L)))
  }

  test("correlated scalar in WHERE and ORDER BY") {
    assert(rows("select dname from dept where (select count(*) from emp where edk = dk) > 0" +
      " order by (select sum(sal) from emp where edk = dk) desc") ==
      Seq(Seq("ops"), Seq("eng")))
  }

  test("correlated EXISTS / NOT EXISTS") {
    assert(rows("select dname from dept where exists (select 1 from emp where edk = dk and sal > 120) order by dname") ==
      Seq(Seq("eng")))
    assert(rows("select dname from dept where not exists (select 1 from emp where edk = dk) order by dname") ==
      Seq(Seq("empty")))
  }

  test("correlated IN / NOT IN") {
    assert(rows("select ename from emp where sal in (select sal from emp as e2 where e2.edk = emp.edk and e2.sal > 100) order by ename") ==
      Seq(Seq("bob"), Seq("dee")))
    assert(rows("select ename from emp where sal not in (select sal from emp as e2 where e2.edk = emp.edk and e2.sal > 100) order by ename") ==
      Seq(Seq("ann"), Seq("cid"), Seq("eve")))
  }

  test("correlated scalar qualified outer reference") {
    assert(rows("select dname, (select count(*) from emp where edk = dept.dk) from dept order by dname") ==
      Seq(Seq("empty", 0L), Seq("eng", 2L), Seq("ops", 3L)))
  }

  test("non-equality aggregate correlation theta-decorrelates") {
    // count of emps earning more than 100×dk — `<`/`>` correlation, no
    // equality pair, handled by the theta rewrite (round-6 D3 narrowing)
    assert(rows("select dname, (select count(*) from emp where sal > dk * 100) as n from dept order by dname") ==
      Seq(Seq("empty", 0L), Seq("eng", 2L), Seq("ops", 0L)))
    // non-count aggregate over an empty theta group stays NULL
    assert(rows("select dname, (select max(sal) from emp where sal > dk * 100) as m from dept order by dname") ==
      Seq(Seq("empty", null), Seq("eng", 150.0), Seq("ops", null)))
    // TOTAL over an empty theta group is 0.0 (SQLite total semantics)
    assert(rows("select dname, (select total(sal) from emp where sal > dk * 100) as t from dept order by dname") ==
      Seq(Seq("empty", 0.0), Seq("eng", 270.0), Seq("ops", 0.0)))
    // mixed: equality pair AND inequality in the same subquery (the
    // equality pre-pass refuses, the theta path takes the whole WHERE) —
    // ops (dk=2): edk=2 and sal<120 matches cid(90) and eve(80)
    assert(rows("select dname, (select count(*) from emp where edk = dk and sal < dk * 60) as n from dept order by dname") ==
      Seq(Seq("empty", 0L), Seq("eng", 0L), Seq("ops", 2L)))
    // OR-mixed correlated conjunct (not expressible as join keys at all) —
    // eng (dk=1): sal>100 gives bob(150), dee(120); edk=1 adds ann
    assert(rows("select dname, (select count(*) from emp where sal > dk * 100 or edk = dk) as n from dept order by dname") ==
      Seq(Seq("empty", 0L), Seq("eng", 3L), Seq("ops", 3L)))
  }

  test("theta decorrelation plans as key-join-aggregate, not per-row execution") {
    val plan = bdb.execute(
      "select dname, (select count(*) from emp where sal > dk * 100) as n from dept")
      .queryExecution.optimizedPlan.toString
    assert(plan.contains("Aggregate"), s"expected grouped aggregate:\n$plan")
    assert(plan.contains("Join LeftOuter"), s"expected attach join:\n$plan")
  }

  test("deep-carry decorrelation plans as joins, not per-row execution") {
    // the nested avg decorrelates onto the joined key-inner frame: the
    // optimized plan is aggregates + outer joins end to end — no scalar
    // subquery expression survives (which would mean per-outer-row
    // re-execution on the driver side or an unresolved Catalyst plan)
    val plan = bdb.execute(
      "select dname, (select count(*) from emp where sal > dk" +
        " and sal > (select avg(sal) from emp as e2 where e2.edk = dk)) as n from dept")
      .queryExecution.optimizedPlan.toString
    assert(plan.contains("Aggregate"), s"expected grouped aggregates:\n$plan")
    assert(plan.contains("Join LeftOuter"), s"expected attach joins:\n$plan")
    assert(!plan.contains("scalar-subquery"), s"nested scalar must be decorrelated:\n$plan")
  }

  test("aggregate correlation in a grouped subquery stays D3") {
    // grouped + theta correlation + NO ORDER BY: the picked row would be
    // unspecified even in SQLite — still the named divergence
    val e = intercept[UnsupportedOperationException] {
      rows("select dname, (select count(*) from emp where sal > dk group by edk) from dept")
    }
    assert(e.getMessage.contains("D3"))
  }

  test("grouped ordered correlated scalar decorrelates (round-6 narrowing)") {
    // most common salary band per dept — item is a GROUP BY key, ranked
    // by count: eng = hi:2 → 'hi'; ops = lo:2, hi:1 → 'lo'; empty → NULL
    assert(rows("select dname, (select case when sal >= 100 then 'hi' else 'lo' end" +
      " from emp where edk = dk group by case when sal >= 100 then 'hi' else 'lo' end" +
      " order by count(*) desc, 1 limit 1) from dept order by dname") ==
      Seq(Seq("empty", null), Seq("eng", "hi"), Seq("ops", "lo")))
    // aggregate item: the top band's count — NO count-bug coalesce here
    // (zero groups ⇒ no row ⇒ NULL, unlike the ungrouped count form)
    assert(rows("select dname, (select count(*)" +
      " from emp where edk = dk group by case when sal >= 100 then 'hi' else 'lo' end" +
      " order by count(*) desc limit 1) from dept order by dname") ==
      Seq(Seq("empty", null), Seq("eng", 2L), Seq("ops", 2L)))
  }

  test("grouped correlated scalar with OFFSET picks the ranked row") {
    // runner-up band: ops → 'hi'; eng has one band → NULL; empty → NULL
    assert(rows("select dname, (select case when sal >= 100 then 'hi' else 'lo' end" +
      " from emp where edk = dk group by case when sal >= 100 then 'hi' else 'lo' end" +
      " order by count(*) desc, 1 limit 1 offset 1) from dept order by dname") ==
      Seq(Seq("empty", null), Seq("eng", null), Seq("ops", "hi")))
  }

  test("theta-correlated grouped ordered scalar decorrelates (DuckDB-checked)") {
    // greatest-n-per-group under a `>` correlation (no equality pair):
    // most common salary band among emps earning over dk*60 — eng (>60)
    // sees hi:3/lo:2 → 'hi'; ops (>120) sees only bob → 'hi'; empty
    // (>180) has no groups → NULL
    assert(rows("select dname, (select case when sal >= 100 then 'hi' else 'lo' end" +
      " from emp where sal > dk * 60" +
      " group by case when sal >= 100 then 'hi' else 'lo' end" +
      " order by count(*) desc, 1 limit 1) from dept order by dname") ==
      Seq(Seq("empty", null), Seq("eng", "hi"), Seq("ops", "hi")))
    // mixed equality + theta conjuncts with grouping: eng has no emp
    // with sal < 60 → NULL; ops (sal < 120) groups by name → count 1
    assert(rows("select dname, (select count(*) from emp where edk = dk and sal < dk * 60" +
      " group by ename order by count(*) desc, ename limit 1) from dept order by dname") ==
      Seq(Seq("empty", null), Seq("eng", null), Seq("ops", 1L)))
  }

  test("no-op ORDER BY/LIMIT on an ungrouped aggregate scalar strips") {
    assert(rows("select dname, (select max(sal) from emp where edk = dk order by 1 limit 1) from dept order by dname") ==
      Seq(Seq("empty", null), Seq("eng", 150.0), Seq("ops", 120.0)))
  }

  test("LIMIT 0 scalar subquery is provably NULL") {
    assert(rows("select dname, (select count(*) from emp where edk = dk limit 0) from dept order by dname") ==
      Seq(Seq("empty", null), Seq("eng", null), Seq("ops", null)))
  }

  test("grouped decorrelation plans as window + join, not per-row execution") {
    val plan = bdb.execute(
      "select dname, (select case when sal >= 100 then 'hi' else 'lo' end" +
        " from emp where edk = dk group by case when sal >= 100 then 'hi' else 'lo' end" +
        " order by count(*) desc, 1 limit 1) from dept")
      .queryExecution.optimizedPlan.toString
    assert(plan.contains("Window"), s"expected window rank:\n$plan")
    assert(plan.contains("Join LeftOuter"), s"expected attach join:\n$plan")
  }

  test("depth-2 correlation peels through equality pairs (scalar in scalar)") {
    // innermost avg references dk, TWO frames up; the mid equality
    // edk = dk requalifies it to the mid frame's edk, then each level
    // decorrelates one step (round-6 D3 narrowing)
    assert(rows("select dname, (select max(sal) from emp where edk = dk" +
      " and sal > (select avg(sal) from emp as e2 where e2.edk = dk)) from dept order by dname") ==
      Seq(Seq("empty", null), Seq("eng", 150.0), Seq("ops", 120.0)))
    // qualified and unqualified deep refs resolve to the same outer key
    assert(rows("select dname, (select max(sal) from emp where edk = dept.dk" +
      " and sal > (select avg(sal) from emp as e2 where e2.edk = dk)) from dept order by dname") ==
      Seq(Seq("empty", null), Seq("eng", 150.0), Seq("ops", 120.0)))
  }

  test("depth-3 correlation cascades one level per frame (DuckDB-checked)") {
    // each nesting level carries its own equality pair on dk, so the
    // peeling applies recursively as each level plans its subqueries
    assert(rows("select dname, (select max(sal) from emp as e1 where e1.edk = dk" +
      " and sal > (select avg(sal) from emp as e2 where e2.edk = dk" +
      " and e2.sal < (select max(sal) from emp as e3 where e3.edk = dk)))" +
      " from dept order by dname") ==
      Seq(Seq("empty", null), Seq("eng", 150.0), Seq("ops", 120.0)))
  }

  test("depth-2 correlation peels inside EXISTS bodies") {
    assert(rows("select dname from dept where exists (select 1 from emp where edk = dk" +
      " and exists (select 1 from emp as e2 where e2.edk = dk and e2.sal > 120)) order by dname") ==
      Seq(Seq("eng")))
  }

  test("depth-2 without a matching equality pair decorrelates (key-tuple carry)") {
    // the mid level correlates only by theta (sal > dk), so no equality
    // pair names dk for requalifyDeep — round 7 carries the deep ref in
    // the theta key tuple and decorrelates the nested avg against the
    // joined frame: dk=1 avg=125 → max 150; dk=2 avg≈96.67 → 150;
    // dk=3 empty avg=NULL → comparison NULL → empty set → NULL
    assert(rows("select dname, (select max(sal) from emp where sal > dk" +
      " and sal > (select avg(sal) from emp as e2 where e2.edk = dk)) from dept" +
      " order by dname") ==
      Seq(Seq("empty", null), Seq("eng", 150.0), Seq("ops", 150.0)))
  }

  test("deep-only correlation (enclosing otherwise uncorrelated) decorrelates") {
    // the enclosing subquery's ONLY link to dept is the deep dk ref
    // inside the nested avg — the key-inner join degenerates to a cross
    // product over |distinct dk| keys and the nested subquery supplies
    // the mask: dk=1 → sal > 125 → count 1 (bob); dk=2 → sal > 96.67 →
    // count 3 (ann, bob, dee); dk=3 → NULL mask → count 0, not NULL
    assert(rows("select dname, (select count(*) from emp" +
      " where sal > (select avg(sal) from emp as e2 where e2.edk = dk))" +
      " from dept order by dname") ==
      Seq(Seq("empty", 0L), Seq("eng", 1L), Seq("ops", 3L)))
  }

  test("equality-correlated enclosing with an unpaired deep ref decorrelates") {
    // edk = dk peels nothing for the SECOND outer column (dname has no
    // equality pair): sum of salaries in the department strictly above
    // the department's own average — eng: avg 125 → 150; ops: avg 96.67
    // → 120; empty: no rows → NULL
    assert(rows("select dname, (select sum(sal) from emp where edk = dk" +
      " and sal > (select avg(e2.sal) from emp as e2 where e2.edk = dk))" +
      " from dept order by dname") ==
      Seq(Seq("empty", null), Seq("eng", 150.0), Seq("ops", 120.0)))
  }

  test("deep EXISTS inside a theta aggregate scalar decorrelates via count") {
    // the nested EXISTS body references BOTH the deep frame (dk) and the
    // mid frame (emp.sal) — in the aggregate-bound mask position it
    // rewrites to (SELECT count(*) ...) > 0 and the count decorrelates
    // (mixed equality-on-key + theta-on-inner-column correlation):
    // counts employees with somebody better paid in department dk —
    // eng: sal<150 → 4; ops: sal<120 → 3; empty: no e2 rows → 0
    assert(rows("select dname, (select count(*) from emp where sal > dk" +
      " and exists (select 1 from emp as e2 where e2.edk = dk and e2.sal > emp.sal))" +
      " from dept order by dname") ==
      Seq(Seq("empty", 0L), Seq("eng", 4L), Seq("ops", 3L)))
  }

  test("deep IN inside a theta aggregate scalar decorrelates via count") {
    // membership source depends on the deep dk ref: departments whose
    // high earners (sal > dk*60) exist pass their edks — dk=1: {1,2} →
    // all 5 emp rows; dk=2: only bob → {1} → 2 rows; dk=3: empty set →
    // FALSE mask → count 0
    assert(rows("select dname, (select count(*) from emp where sal > dk" +
      " and edk in (select e2.edk from emp as e2 where e2.sal > dk * 60))" +
      " from dept order by dname") ==
      Seq(Seq("empty", 0L), Seq("eng", 5L), Seq("ops", 2L)))
  }

  test("deep NOT IN keeps SQL three-valued semantics under the mask") {
    // bonus(bk=2) holds a NULL amount: for dk >= 2 the NOT IN set
    // contains NULL, every comparison is NULL, the mask is NULL and all
    // rows drop — count 0, exactly SQLite/DuckDB's answer; dk=1 sees
    // only {10.0} and keeps all 5 rows
    assert(rows("select dname, (select count(*) from emp where sal > dk" +
      " and sal not in (select amt from bonus where bk <= dk))" +
      " from dept order by dname") ==
      Seq(Seq("empty", 0L), Seq("eng", 5L), Seq("ops", 0L)))
  }

  test("shadowed names inside the nested body bind inner-first, not deep") {
    // bare edk inside the nested subquery resolves in e2's own frame
    // (vacuously true edk = edk), exactly SQLite's inner-first scoping —
    // the nested subquery is self-contained (global min 80), NOT deep:
    // each department counts employees with sal > dk and sal > 80 → 4
    assert(rows("select dname, (select count(*) from emp" +
      " where sal > dk and sal > (select min(sal) from emp as e2 where edk = edk))" +
      " from dept order by dname") ==
      Seq(Seq("empty", 4L), Seq("eng", 4L), Seq("ops", 4L)))
  }

  test("correlated non-aggregate scalar takes first matching row") {
    assert(rows("select dname, (select ename from emp where edk = dk and sal > 140) from dept order by dname") ==
      Seq(Seq("empty", null), Seq("eng", "bob"), Seq("ops", null)))
  }

  test("name collision resolves inner-first (SQLite scoping)") {
    // `edk` inside the subquery binds e2's own edk, not the outer emp's:
    // e2.edk = e2.edk is vacuously true, so every row with sal above the
    // global min survives — same answer SQLite gives for this text
    assert(rows("select ename from emp where sal > (select min(sal) from emp as e2 where edk = edk) order by ename") ==
      Seq(Seq("ann"), Seq("bob"), Seq("cid"), Seq("dee")))
  }

  test("decorrelated plans are joins, not per-row re-execution") {
    // aggregate scalar: one grouped aggregate left-joined to the outer
    // frame — the shape Catalyst would plan for the SQL text
    val agg = bdb.execute(
      "select dname, (select count(*) from emp where edk = dk) from dept")
      .queryExecution.optimizedPlan.toString
    assert(agg.contains("Join LeftOuter"), s"expected grouped left join:\n$agg")
    assert(agg.contains("Aggregate"), s"expected inner aggregate:\n$agg")
    // correlated EXISTS: Catalyst decorrelates to a left-semi join
    val ex = bdb.execute(
      "select dname from dept where exists (select 1 from emp where edk = dk)")
      .queryExecution.optimizedPlan.toString
    assert(ex.contains("Join LeftSemi"), s"expected semi join:\n$ex")
  }

  test("HAVING under theta correlation filters groups before the row pick") {
    // theta WHERE (sal > dk*50) + theta-correlated HAVING (max(sal) >
    // dk*60): dk=2 keeps only bob's group (dee's max 120 fails > 120);
    // dk=3 has no qualifying rows at all
    assert(rows("select dname, (select ename from emp where sal > dk * 50" +
      " group by ename having count(*) >= 1 and max(sal) > dk * 60" +
      " order by max(sal) desc limit 1) as top from dept order by dname") ==
      Seq(Seq("empty", null), Seq("eng", "bob"), Seq("ops", "bob")))
  }

  test("HAVING aggregate-only under theta correlation") {
    // count(*) >= 2 drops dk=3's single-row group entirely; the tie at
    // dk=2 resolves by the edk tiebreak
    assert(rows("select dname, (select edk from emp where sal > dk * 40" +
      " group by edk having count(*) >= 2 order by count(*) desc, edk limit 1)" +
      " as busy from dept order by dname") ==
      Seq(Seq("empty", null), Seq("eng", 2L), Seq("ops", 1L)))
  }

  test("uncorrelated subqueries unchanged") {
    assert(rows("select dname from dept where dk = (select min(edk) from emp) order by dname") ==
      Seq(Seq("eng")))
    assert(rows("select dname from dept where dk in (select edk from emp) order by dname") ==
      Seq(Seq("eng"), Seq("ops")))
  }

  test("correlated FROM-subquery flattens into the scalar body (round 8)") {
    // outer ref hidden inside the FROM-term; flattening surfaces edk = dk
    // into the scalar's WHERE where the equality decorrelator takes it
    assert(rows("select dname, (select count(*) from" +
      " (select sal as s from emp where edk = dk) as t where t.s > 95)" +
      " from dept order by dname") ==
      Seq(Seq("empty", 0L), Seq("eng", 2L), Seq("ops", 1L)))
    // computed+renamed projection: refs to the alias map to the defining
    // expression on the merged frame
    assert(rows("select dname, (select max(x) from" +
      " (select sal * 2 as x from emp where edk = dk) as t)" +
      " from dept order by dname") ==
      Seq(Seq("empty", null), Seq("eng", 300.0), Seq("ops", 240.0)))
  }

  test("grouped/limited EXISTS body in an aggregate-bound mask (round 8)") {
    // the EXISTS body carries GROUP BY + LIMIT: groups exist iff rows
    // exist, the cap never changes emptiness — rewritten to a count
    assert(rows("select dname, (select count(*) from emp as m where m.edk = dk" +
      " and exists (select ename from emp as e2 where e2.edk = dk" +
      " and e2.sal > m.sal group by ename limit 2)) from dept order by dname") ==
      Seq(Seq("empty", 0L), Seq("eng", 1L), Seq("ops", 2L)))
    // LIMIT 0 is provably empty: EXISTS is constant FALSE
    assert(rows("select dname, (select count(*) from emp as m where m.edk = dk" +
      " and exists (select 1 from emp as e2 where e2.edk = dk limit 0))" +
      " from dept order by dname") ==
      Seq(Seq("empty", 0L), Seq("eng", 0L), Seq("ops", 0L)))
  }

  test("grouped IN body on its own group key in a mask (round 8)") {
    // membership in the grouped values of sal ≡ membership in raw sal
    assert(rows("select dname, (select count(*) from emp as m where m.edk = dk" +
      " and m.sal in (select sal from emp as e2 where e2.edk = dk" +
      " and e2.sal > 95 group by sal)) from dept order by dname") ==
      Seq(Seq("empty", 0L), Seq("eng", 2L), Seq("ops", 1L)))
  }

  test("grouped EXISTS with HAVING rewrites to the b31 scalar (round 8)") {
    // filter position: a (sal > 100) group of size ≥ 2 exists only in ops
    assert(rows("select dname from dept where exists (" +
      "select 1 from emp where edk = dk group by sal > 100" +
      " having count(*) >= 2) order by dname") ==
      Seq(Seq("ops")))
    // aggregate-bound mask, HAVING on the mid frame only
    assert(rows("select dname, (select count(*) from emp as m where m.edk = dk" +
      " and exists (select 1 from emp as e2 where e2.edk = dk and e2.sal >= m.sal" +
      " group by e2.ename having max(e2.sal) > 100)) from dept order by dname") ==
      Seq(Seq("empty", 0L), Seq("eng", 2L), Seq("ops", 3L)))
    // HAVING itself carries the correlation (theta against the mid frame)
    assert(rows("select dname, (select count(*) from emp as m where m.edk = dk" +
      " and exists (select 1 from emp as e2 where e2.edk = dk" +
      " group by e2.ename having max(e2.sal) > m.sal)) from dept order by dname") ==
      Seq(Seq("empty", 0L), Seq("eng", 1L), Seq("ops", 2L)))
    // degenerate: every ename group has one row — HAVING count(*) > 1
    // is constant-false, EXISTS too
    assert(rows("select dname, (select count(*) from emp where edk = dk" +
      " and exists (select ename from emp as e2 where e2.edk = dk" +
      " group by ename having count(*) > 1)) from dept order by dname") ==
      Seq(Seq("empty", 0L), Seq("eng", 0L), Seq("ops", 0L)))
  }

  test("grouped IN with HAVING composes EXISTS-HAVING probes (round 8)") {
    // membership in HAVING-filtered group keys: sals below 130 per dept
    assert(rows("select dname, (select count(*) from emp as m where m.edk = dk" +
      " and m.sal in (select e2.sal from emp as e2 where e2.edk = dk" +
      " group by e2.sal having max(e2.sal) < 130)) from dept order by dname") ==
      Seq(Seq("empty", 0L), Seq("eng", 1L), Seq("ops", 3L)))
    // NOT IN keeps three-valued semantics: a NULL LHS against a
    // nonempty HAVING-passing set is NULL, masking the row out
    assert(rows("select dname, (select count(*) from bonus as b" +
      " where b.amt not in (select e2.sal from emp as e2 where e2.edk = dk" +
      " group by e2.sal having max(e2.sal) < 130)) from dept order by dname") ==
      Seq(Seq("empty", 2L), Seq("eng", 1L), Seq("ops", 1L)))
    // plain filter position
    assert(rows("select dname from dept where 100.0 in" +
      " (select sal from emp where edk = dk group by sal" +
      " having count(*) >= 1) order by dname") ==
      Seq(Seq("eng")))
  }

  test("EXISTS over an ungrouped aggregate body is constant TRUE (round 8)") {
    // a global aggregate yields exactly one row, WHERE notwithstanding
    // (SQLite semantics: SELECT max(x) over no rows is one NULL row) —
    // every dept qualifies, including 'empty'
    assert(rows("select dname from dept where exists" +
      " (select max(sal) from emp where edk = dk) order by dname") ==
      Seq(Seq("empty"), Seq("eng"), Seq("ops")))
    // NOT EXISTS of the same body is constant FALSE
    assert(rows("select dname from dept where not exists" +
      " (select max(sal) from emp where edk = dk) order by dname") ==
      Seq.empty)
  }

  test("still-rejected D3 residuals keep the named error (round 8)") {
    // DISTINCT FROM-subquery cannot flatten (row multiplicity changes)
    val e2 = intercept[UnsupportedOperationException] {
      rows("select dname, (select count(*) from" +
        " (select distinct sal from emp where edk = dk) as t) from dept")
    }
    assert(e2.getMessage.contains("divergence D3"))
    // grouped IN whose selected item is NOT a group key: the picked row
    // per group is unspecified (SQLite bare-column semantics)
    val e3 = intercept[UnsupportedOperationException] {
      rows("select dname, (select count(*) from emp where edk = dk" +
        " and sal in (select sal from emp as e2 where e2.edk = dk" +
        " group by ename)) from dept")
    }
    assert(e3.getMessage.contains("divergence D3"))
  }
}
