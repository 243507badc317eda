package graft

import graft.bql.Ast._
import graft.bql.{Lexer, Parser}
import org.scalatest.funsuite.AnyFunSuite

/** BQL parser round-trip assertions, ported from the reference's
  * tests/test_parse.py (representative slice of the 1,633-line suite:
  * trivial selects, expressions & precedence, BQL estimators, estimate
  * family, infer, simulate, commands, parameters, completeness). */
class ParserSpec extends AnyFunSuite {

  private def one(s: String): Phrase = Parser.parseOne(s).phrase
  private def all(s: String): Seq[Phrase] = Parser.parseAll(s).map(_.phrase)
  private def selCols(s: String): Seq[SelCol] =
    one(s).asInstanceOf[Select].columns
  private def firstExp(s: String): Exp =
    selCols(s).head.asInstanceOf[SelColExp].expression

  private val T = Seq(SelTab(Right("t"), None))

  test("empty strings parse to no phrases (test_empty)") {
    for (s <- Seq("", ";", ";;", " ;", "; ", " ; ", " ; ; "))
      assert(all(s).isEmpty, s"input: '$s'")
  }

  test("multiple phrases with and without trailing semicolon (test_multiquery)") {
    val expected = Seq(
      Select(SelQuantAll, Seq(SelColExp(ExpLit(LitInt(0)), None)), Nil, None, None, Nil, None),
      Select(SelQuantAll, Seq(SelColExp(ExpLit(LitInt(1)), None)), Nil, None, None, Nil, None))
    assert(all("select 0; select 1;") == expected)
    assert(all("select 0; select 1") == expected)
  }

  test("literals (test_select_trivial)") {
    assert(firstExp("select null;") == ExpLit(LitNull))
    assert(firstExp("select 'x';") == ExpLit(LitString("x")))
    assert(firstExp("select 'x''y';") == ExpLit(LitString("x'y")))
    assert(firstExp("select \"x\";") == ExpCol(None, "x"))
    assert(firstExp("select \"x\"\"y\";") == ExpCol(None, "x\"y"))
    assert(firstExp("select 0;") == ExpLit(LitInt(0)))
    assert(firstExp("select 0.;") == ExpLit(LitFloat(0.0)))
    assert(firstExp("select .0;") == ExpLit(LitFloat(0.0)))
    assert(firstExp("select 1e+1;") == ExpLit(LitFloat(10.0)))
    assert(firstExp("select 1e-1;") == ExpLit(LitFloat(0.1)))
    assert(firstExp("select 1.5e0;") == ExpLit(LitFloat(1.5)))
    assert(firstExp("select 0x10;") == ExpLit(LitInt(16)))
  }

  test("select distinct/all and star forms") {
    assert(one("select distinct x from t;") ==
      Select(SelQuantDistinct, Seq(SelColExp(ExpCol(None, "x"), None)), T, None, None, Nil, None))
    assert(selCols("select * from t;") == Seq(SelColAll(None)))
    assert(selCols("select t.* from t;") == Seq(SelColAll(Some("t"))))
    assert(selCols("select x as y from t;") ==
      Seq(SelColExp(ExpCol(None, "x"), Some("y"))))
    assert(selCols("select t.x from t;") ==
      Seq(SelColExp(ExpCol(Some("t"), "x"), None)))
  }

  test("operator precedence ladder") {
    // 1 + 2 * 3 parses as 1 + (2 * 3)
    assert(firstExp("select 1 + 2 * 3;") ==
      ExpOp(Op.Add, Seq(ExpLit(LitInt(1)),
        ExpOp(Op.Mul, Seq(ExpLit(LitInt(2)), ExpLit(LitInt(3)))))))
    // a or b and c parses as a or (b and c)
    assert(firstExp("select a or b and c;") ==
      ExpOp(Op.BoolOr, Seq(ExpCol(None, "a"),
        ExpOp(Op.BoolAnd, Seq(ExpCol(None, "b"), ExpCol(None, "c"))))))
    // not x = y parses as not (x = y)  (NOT is above equality)
    assert(firstExp("select not x = y;") ==
      ExpOp(Op.BoolNot, Seq(ExpOp(Op.Eq, Seq(ExpCol(None, "x"), ExpCol(None, "y"))))))
    // bitwise binds tighter than comparison: a < b | c
    assert(firstExp("select a < b | c;") ==
      ExpOp(Op.Lt, Seq(ExpCol(None, "a"),
        ExpOp(Op.BitIor, Seq(ExpCol(None, "b"), ExpCol(None, "c"))))))
    // concat binds tighter than multiplication: a * b || c
    assert(firstExp("select a * b || c;") ==
      ExpOp(Op.Mul, Seq(ExpCol(None, "a"),
        ExpOp(Op.Concat, Seq(ExpCol(None, "b"), ExpCol(None, "c"))))))
    // unary minus: -a + b = (-a) + b
    assert(firstExp("select -a + b;") ==
      ExpOp(Op.Add, Seq(ExpOp(Op.Negate, Seq(ExpCol(None, "a"))), ExpCol(None, "b"))))
  }

  test("comparison and null predicates") {
    assert(firstExp("select x is null;") ==
      ExpOp(Op.Is, Seq(ExpCol(None, "x"), ExpLit(LitNull))))
    assert(firstExp("select x is not null;") ==
      ExpOp(Op.IsNot, Seq(ExpCol(None, "x"), ExpLit(LitNull))))
    assert(firstExp("select x isnull;") == ExpOp(Op.IsNull, Seq(ExpCol(None, "x"))))
    assert(firstExp("select x notnull;") == ExpOp(Op.NotNull, Seq(ExpCol(None, "x"))))
    assert(firstExp("select x between 1 and 2;") ==
      ExpOp(Op.Between, Seq(ExpCol(None, "x"), ExpLit(LitInt(1)), ExpLit(LitInt(2)))))
    assert(firstExp("select x not between 1 and 2;") ==
      ExpOp(Op.NotBetween, Seq(ExpCol(None, "x"), ExpLit(LitInt(1)), ExpLit(LitInt(2)))))
    assert(firstExp("select x != y;") ==
      ExpOp(Op.Neq, Seq(ExpCol(None, "x"), ExpCol(None, "y"))))
    assert(firstExp("select x like 'a%';") ==
      ExpOp(Op.Like, Seq(ExpCol(None, "x"), ExpLit(LitString("a%")))))
    assert(firstExp("select x not like 'a%' escape '\\';") ==
      ExpOp(Op.NotLikeEsc, Seq(ExpCol(None, "x"), ExpLit(LitString("a%")),
        ExpLit(LitString("\\")))))
    assert(firstExp("select x in (1, 2);") ==
      ExpInExp(ExpCol(None, "x"), positive = true, Seq(ExpLit(LitInt(1)), ExpLit(LitInt(2)))))
    assert(firstExp("select x not in (select y from t);") ==
      ExpInQuery(ExpCol(None, "x"), positive = false,
        Select(SelQuantAll, Seq(SelColExp(ExpCol(None, "y"), None)), T, None, None, Nil, None)))
  }

  test("case, cast, exists, function application") {
    assert(firstExp("select case when x then 1 else 0 end;") ==
      ExpCase(None, Seq((ExpCol(None, "x"), ExpLit(LitInt(1)))), Some(ExpLit(LitInt(0)))))
    assert(firstExp("select case x when 1 then 'a' end;") ==
      ExpCase(Some(ExpCol(None, "x")),
        Seq((ExpLit(LitInt(1)), ExpLit(LitString("a")))), None))
    assert(firstExp("select cast(x as double precision);") ==
      ExpCast(ExpCol(None, "x"), TypeSpec(Seq("double", "precision"), Nil)))
    assert(firstExp("select cast(x as decimal(10, -2));") ==
      ExpCast(ExpCol(None, "x"), TypeSpec(Seq("decimal"), Seq(10L, -2L))))
    assert(firstExp("select exists (select 1);") ==
      ExpExists(Select(SelQuantAll, Seq(SelColExp(ExpLit(LitInt(1)), None)),
        Nil, None, None, Nil, None)))
    assert(firstExp("select count(*);") == ExpAppStar("count"))
    assert(firstExp("select count(distinct x);") ==
      ExpApp(distinct = true, "count", Seq(ExpCol(None, "x"))))
    assert(firstExp("select f(x, y);") ==
      ExpApp(distinct = false, "f", Seq(ExpCol(None, "x"), ExpCol(None, "y"))))
  }

  test("where, group by, having, order by, limit") {
    assert(one("select x from t where y > 0 group by z having count(*) > 1" +
        " order by w desc limit 10 offset 2;") ==
      Select(SelQuantAll, Seq(SelColExp(ExpCol(None, "x"), None)), T,
        Some(ExpOp(Op.Gt, Seq(ExpCol(None, "y"), ExpLit(LitInt(0))))),
        Some(Grouping(Seq(ExpCol(None, "z")),
          Some(ExpOp(Op.Gt, Seq(ExpAppStar("count"), ExpLit(LitInt(1))))))),
        Seq(Ord(ExpCol(None, "w"), asc = false)),
        Some(Lim(ExpLit(LitInt(10)), Some(ExpLit(LitInt(2)))))))
    // LIMIT k, n means offset k limit n (SQLite convention)
    assert(one("select x from t limit 2, 10;").asInstanceOf[Select].limit ==
      Some(Lim(ExpLit(LitInt(10)), Some(ExpLit(LitInt(2))))))
  }

  test("predictive probability forms (test_select_bql)") {
    assert(firstExp("select predictive probability of c from t;") ==
      ExpBQLPredProb(Seq(ColListLit(Seq("c"))), Nil))
    assert(firstExp("select predictive probability of (c) from t;") ==
      ExpBQLPredProb(Seq(ColListLit(Seq("c"))), Nil))
    assert(firstExp("select predictive probability of (*), * from t;") ==
      ExpBQLPredProb(Seq(ColListAll), Nil))
    assert(firstExp("select predictive probability of d given (c, f) from t;") ==
      ExpBQLPredProb(Seq(ColListLit(Seq("d"))),
        Seq(ColListLit(Seq("c")), ColListLit(Seq("f")))))
    assert(firstExp("select predictive probability of (d, w, *) given (c, *) from t;") ==
      ExpBQLPredProb(
        Seq(ColListLit(Seq("d")), ColListLit(Seq("w")), ColListAll),
        Seq(ColListLit(Seq("c")), ColListAll)))
    // `of c, d` splits: second select column is plain d
    assert(selCols("select predictive probability of c, d from t;") ==
      Seq(SelColExp(ExpBQLPredProb(Seq(ColListLit(Seq("c"))), Nil), None),
        SelColExp(ExpCol(None, "d"), None)))
  }

  test("probability density and similarity (test_select_bql)") {
    assert(firstExp("select probability density of c = 42 from t;") ==
      ExpBQLProbDensity(Seq(("c", ExpLit(LitInt(42)))), Nil))
    assert(firstExp("select probability density of c = 1 given (d = 2) from t;") ==
      ExpBQLProbDensity(Seq(("c", ExpLit(LitInt(1)))), Seq(("d", ExpLit(LitInt(2))))))
    assert(firstExp("select probability density of value 4 from t;") ==
      ExpBQLProbDensityFn(ExpLit(LitInt(4)), Nil))
    assert(firstExp("select similarity in the context of c from t;") ==
      ExpBQLSim(None, None, ColListLit(Seq("c"))))
    assert(firstExp("select similarity to (rowid=8) in the context of s from t;") ==
      ExpBQLSim(None,
        Some(ExpOp(Op.Eq, Seq(ExpCol(None, "rowid"), ExpLit(LitInt(8))))),
        ColListLit(Seq("s"))))
    assert(firstExp(
        "select similarity of (rowid=1) to (rowid=8) in the context of s from t;") ==
      ExpBQLSim(
        Some(ExpOp(Op.Eq, Seq(ExpCol(None, "rowid"), ExpLit(LitInt(1))))),
        Some(ExpOp(Op.Eq, Seq(ExpCol(None, "rowid"), ExpLit(LitInt(8))))),
        ColListLit(Seq("s"))))
    // OF without TO is an error
    intercept[Parser.ParseError] {
      one("select similarity of (rowid=8) in the context of r from t")
    }
    // a column named similarity still parses as a name
    assert(firstExp("select similarity from t;") == ExpCol(None, "similarity"))
  }

  test("dependence probability, mutual information, correlation") {
    assert(firstExp("select dependence probability of c with d from t;") ==
      ExpBQLDepProb(Some("c"), Some("d")))
    assert(firstExp("select dependence probability with d from t;") ==
      ExpBQLDepProb(None, Some("d")))
    assert(firstExp("select dependence probability from t;") ==
      ExpBQLDepProb(None, None))
    assert(firstExp("select mutual information of c with d from t;") ==
      ExpBQLMutInf(Seq("c"), Seq("d"), Nil, None))
    assert(firstExp("select mutual information of (a, b) with (c, d)" +
        " using 42 samples from t;") ==
      ExpBQLMutInf(Seq("a", "b"), Seq("c", "d"), Nil, Some(ExpLit(LitInt(42)))))
    assert(firstExp("select mutual information of a with b given (c = 1, d)" +
        " from t;") ==
      ExpBQLMutInf(Seq("a"), Seq("b"),
        Seq(MiEquality("c", ExpLit(LitInt(1))), MiMarginal("d")), None))
    assert(firstExp("select correlation of c with d from t;") ==
      ExpBQLCorrel(Some("c"), Some("d")))
    assert(firstExp("select correlation pvalue of c with d from t;") ==
      ExpBQLCorrelPval(Some("c"), Some("d")))
    assert(firstExp("select predict c with confidence 0.9 from t;") ==
      ExpBQLPredict("c", ExpLit(LitFloat(0.9)), None))
  }

  test("predictive relevance (test_predictive_relevance)") {
    assert(firstExp("select predictive relevance to existing rows (rowid = 1)" +
        " in the context of c from t;") ==
      ExpBQLPredRel(None,
        Some(ExpOp(Op.Eq, Seq(ExpCol(None, "rowid"), ExpLit(LitInt(1))))),
        Nil, ColListLit(Seq("c"))))
    assert(firstExp("select predictive relevance of (rowid = 2)" +
        " to existing rows (rowid = 1)" +
        " and hypothetical rows with values ((c = 5), (c = 6, d = 7))" +
        " in the context of c from t;") ==
      ExpBQLPredRel(
        Some(ExpOp(Op.Eq, Seq(ExpCol(None, "rowid"), ExpLit(LitInt(2))))),
        Some(ExpOp(Op.Eq, Seq(ExpCol(None, "rowid"), ExpLit(LitInt(1))))),
        Seq(Seq(("c", ExpLit(LitInt(5)))),
            Seq(("c", ExpLit(LitInt(6))), ("d", ExpLit(LitInt(7))))),
        ColListLit(Seq("c"))))
  }

  test("estimate family") {
    assert(one("estimate x from p;") ==
      Estimate(SelQuantAll, Seq(SelColExp(ExpCol(None, "x"), None)),
        "p", None, None, None, None, Nil, None))
    assert(one("estimate x from p modeled by g using models 1-3;") ==
      Estimate(SelQuantAll, Seq(SelColExp(ExpCol(None, "x"), None)),
        "p", Some("g"), Some(Seq(1, 2, 3)), None, None, Nil, None))
    assert(one("estimate x by p;") ==
      EstBy(SelQuantAll, Seq(SelColExp(ExpCol(None, "x"), None)), "p", None, None))
    assert(one("estimate * from variables of p;") ==
      EstCols(Seq(SelColAll(None)), "p", None, None, None, Nil, None))
    assert(one("estimate * from columns of p;") ==
      EstCols(Seq(SelColAll(None)), "p", None, None, None, Nil, None))
    assert(one("estimate dependence probability from pairwise variables of p;") ==
      EstPairCols(Seq(SelColExp(ExpBQLDepProb(None, None), None)),
        "p", None, None, None, None, Nil, None))
    assert(one("estimate dependence probability from pairwise variables of p" +
        " for a, b;") ==
      EstPairCols(Seq(SelColExp(ExpBQLDepProb(None, None), None)),
        "p", Some(Seq(ColListLit(Seq("a")), ColListLit(Seq("b")))),
        None, None, None, Nil, None))
    assert(one("estimate similarity in the context of c from pairwise p;") ==
      EstPairRow(
        Seq(SelColExp(ExpBQLSim(None, None, ColListLit(Seq("c"))), None)),
        "p", None, None, None, Nil, None))
    intercept[Parser.ParseError] { one("estimate columns from p;") }
    intercept[Parser.ParseError] { one("estimate pairwise x from p;") }
  }

  test("infer (test_infer_*)") {
    assert(one("infer x from p;") ==
      InferAuto(Seq(InfColOne("x", None)), Some(ExpLit(LitInt(0))), None,
        "p", None, None, None, None, Nil, None))
    assert(one("infer * with confidence 0.9 from p;") ==
      InferAuto(Seq(InfColAll), Some(ExpLit(LitFloat(0.9))), None,
        "p", None, None, None, None, Nil, None))
    assert(one("infer x, y as z with confidence 0.9 using 5 samples from p;") ==
      InferAuto(Seq(InfColOne("x", None), InfColOne("y", Some("z"))),
        Some(ExpLit(LitFloat(0.9))), Some(ExpLit(LitInt(5))),
        "p", None, None, None, None, Nil, None))
    assert(one("infer explicit x, predict y as yh confidence yc from p;") ==
      InferExplicit(
        Seq(SelColExp(ExpCol(None, "x"), None),
          PredCol("y", Some("yh"), Some("yc"), None)),
        "p", None, None, None, None, Nil, None))
  }

  test("simulate (test_simulate)") {
    assert(one("simulate x, y from p limit 10;") ==
      Simulate(Seq(SelColExp(ExpCol(None, "x"), None),
          SelColExp(ExpCol(None, "y"), None)),
        "p", None, None, Nil, Some(ExpLit(LitInt(10))), None))
    assert(one("simulate x from p given y = 5 limit 10 accuracy 3;") ==
      Simulate(Seq(SelColExp(ExpCol(None, "x"), None)),
        "p", None, None, Seq(("y", ExpLit(LitInt(5)))),
        Some(ExpLit(LitInt(10))), Some(3)))
    intercept[Parser.ParseError] { one("simulate x from p;") }  // missing limit
    intercept[Parser.ParseError] { one("simulate x + 1 from p limit 5;") }
    assert(one("simulate x from models of p;") ==
      SimulateModelsExp(Seq(SelColExp(ExpCol(None, "x"), None)), "p", None))
  }

  test("commands (test_trivial_commands, test_analyze, test_create_tab_csv)") {
    assert(one("begin") == Begin)
    assert(one("commit;") == Commit)
    assert(one("create table t as select 1;") ==
      CreateTabAs(temp = false, ifNotExists = false, "t",
        Select(SelQuantAll, Seq(SelColExp(ExpLit(LitInt(1)), None)), Nil, None, None, Nil, None)))
    assert(one("create temp table if not exists t from 'f.csv';") ==
      CreateTabCsv(temp = true, ifNotExists = true, "t", "f.csv"))
    assert(one("drop table if exists t;") == DropTab(ifExists = true, "t"))
    assert(one("alter table t rename to u, rename column a to b;") ==
      AlterTab("t", Seq(AlterTabRenameTab("u"), AlterTabRenameCol("a", "b"))))
    assert(one("guess schema for t;") == GuessSchema("t"))
    assert(one("create population p for t (guess stattypes of (*));") ==
      CreatePop(ifNotExists = false, "p", "t", Seq(PopGuessVars(Nil))))
    assert(one("create population p for t (x numerical; y nominal; ignore z);") ==
      CreatePop(ifNotExists = false, "p", "t", Seq(
        PopModelVars(Seq("x"), "numerical"),
        PopModelVars(Seq("y"), "nominal"),
        PopIgnoreVars(Seq("z")))))
    assert(one("create population p for t (set stattypes of x, y to numerical);") ==
      CreatePop(ifNotExists = false, "p", "t",
        Seq(PopModelVars(Seq("x", "y"), "numerical"))))
    assert(one("create population for t (guess stattypes of (*));") ==
      CreatePop(ifNotExists = false, "t", "t", Seq(PopGuessVars(Nil))))
    assert(one("drop population p;") == DropPop(ifExists = false, "p"))
    assert(one("create generator g for p using nig_normal;") ==
      CreateGen(Some("g"), ifNotExists = false, "p", Some("nig_normal"), Seq(Nil)))
    assert(one("create generator for p;") ==
      CreateGen(None, ifNotExists = false, "p", None, Seq(Nil)))
    assert(one("drop generator g;") == DropGen(ifExists = false, "g"))
    assert(one("initialize 10 models for g;") ==
      InitModels(ifNotExists = false, "g", 10))
    assert(one("initialize 1 model if not exists for g;") ==
      InitModels(ifNotExists = true, "g", 1))
    assert(one("analyze g for 10 iterations;") ==
      AnalyzeModels("g", None, Some(10), None, None, None, Nil))
    assert(one("analyze g models 1-3, 5 for 2 minutes checkpoint 30 seconds;") ==
      AnalyzeModels("g", Some(Seq(1, 2, 3, 5)), None, Some(120), None, Some(30), Nil))
    assert(one("drop models 1-3 from g;") == DropModels("g", Some(Seq(1, 2, 3))))
    assert(one("drop models from g;") == DropModels("g", None))
    assert(one("alter population p add variable x numerical;") ==
      AlterPop("p", Seq(AlterPopAddVar("x", Some("numerical")))))
    assert(one("alter population p set stattype of x to nominal;") ==
      AlterPop("p", Seq(AlterPopStatType(Seq("x"), "nominal"))))
  }

  test("regress (test_regress)") {
    assert(one("regress y given (x, z) using 100 samples by p;") ==
      Regress("y", Seq(SelColExp(ExpCol(None, "x"), None),
          SelColExp(ExpCol(None, "z"), None)),
        Some(ExpLit(LitInt(100))), "p", None, None))
  }

  test("parameters (test_parametrized)") {
    val p1 = Parser.parseOne("select * from t where x = ? and y = ?;")
    assert(p1.nNumpar == 2)
    val p2 = Parser.parseOne("select * from t where x = :foo and y = @bar and z = :foo;")
    assert(p2.nNumpar == 2)
    assert(p2.namparMap == Map("foo" -> 1, "bar" -> 2))
    assert(one("select ?, ?2;").asInstanceOf[Select].columns ==
      Seq(SelColExp(ExpNumpar(1), None), SelColExp(ExpNumpar(2), None)))
  }

  test("string completeness (test_complete)") {
    assert(Parser.stringCompleteP("select 1;"))
    assert(Parser.stringCompleteP("select 1"))
    assert(!Parser.stringCompleteP("select 'x"))
    assert(!Parser.stringCompleteP("select (1"))
    assert(Parser.stringCompleteP(";"))
  }

  test("keyword fallback: keywords usable as column names") {
    // the grammar %fallback list makes most keywords valid names
    assert(firstExp("select model from t;") == ExpCol(None, "model"))
    assert(firstExp("select population from t;") == ExpCol(None, "population"))
    assert(firstExp("select estimate from t;") // estimate as bare column
      == ExpCol(None, "estimate"))
  }

  test("modeled by / using models variants (test_using_model)") {
    assert(one("estimate x by p modeled by g;") ==
      EstBy(SelQuantAll, Seq(SelColExp(ExpCol(None, "x"), None)), "p", Some("g"), None))
    assert(one("estimate x by p using model 7;") ==
      EstBy(SelQuantAll, Seq(SelColExp(ExpCol(None, "x"), None)), "p", None, Some(Seq(7))))
    assert(one("simulate x from p modeled by g using models 0, 2-3 limit 5;") ==
      Simulate(Seq(SelColExp(ExpCol(None, "x"), None)), "p", Some("g"),
        Some(Seq(0, 2, 3)), Nil, Some(ExpLit(LitInt(5))), None))
    assert(one("infer explicit predict y as yh confidence yc using 9 samples from p;") ==
      InferExplicit(Seq(PredCol("y", Some("yh"), Some("yc"), Some(ExpLit(LitInt(9))))),
        "p", None, None, None, None, Nil, None))
  }

  test("joint/conditional probability forms") {
    assert(firstExp("select probability density of (a = 1, b = 2) from t;") ==
      ExpBQLProbDensity(Seq(("a", ExpLit(LitInt(1))), ("b", ExpLit(LitInt(2)))), Nil))
    assert(firstExp("select probability density of value 4 given (c = 1) from t;") ==
      ExpBQLProbDensityFn(ExpLit(LitInt(4)), Seq(("c", ExpLit(LitInt(1))))))
    assert(firstExp("select probability of (x > 1) from t;") ==
      ExpBQLProbEst(ExpOp(Op.Gt, Seq(ExpCol(None, "x"), ExpLit(LitInt(1))))))
    // predictive probability with AND-separated column lists
    assert(firstExp("select predictive probability of (a and b) from t;") ==
      ExpBQLPredProb(Seq(ColListLit(Seq("a")), ColListLit(Seq("b"))), Nil))
  }

  test("nested subqueries and table subqueries") {
    val q = one("select x from (select y from t) as s where x in (select z from u);")
      .asInstanceOf[Select]
    assert(q.tables.head.table.isLeft && q.tables.head.name.contains("s"))
    assert(q.condition.exists(_.isInstanceOf[ExpInQuery]))
    // scalar subquery nested inside arithmetic
    assert(firstExp("select 1 + (select max(x) from t);") ==
      ExpOp(Op.Add, Seq(ExpLit(LitInt(1)),
        ExpSub(Select(SelQuantAll, Seq(SelColExp(
          ExpApp(distinct = false, "max", Seq(ExpCol(None, "x"))), None)),
          T, None, None, Nil, None)))))
  }

  test("quoted identifiers preserve case and keywords") {
    assert(firstExp("select \"SELECT\" from t;") == ExpCol(None, "SELECT"))
    assert(firstExp("select \"Mixed Case\" from t;") == ExpCol(None, "Mixed Case"))
  }

  test("lexer errors") {
    intercept[Lexer.LexError] { Parser.parseAll("select 1x;") }
    intercept[Lexer.LexError] { Parser.parseAll("select 'abc") }
  }
}
