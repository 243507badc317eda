package graft

import graft.catalog.{Guess, StatType}
import graft.functions.Correlation
import org.scalatest.funsuite.AnyFunSuite

class CorrelationSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("pearsonR2 on exactly-linear data is 1, on constant data NaN") {
    val lin = Seq((1.0, 2.0), (2.0, 4.0), (3.0, 6.0), (4.0, 8.0)).toDF("x", "y")
    assert(math.abs(Correlation.pearsonR2(lin, "x", "y") - 1.0) < 1e-12)
    val const = Seq((1.0, 5.0), (2.0, 5.0), (3.0, 5.0)).toDF("x", "y")
    assert(Correlation.pearsonR2(const, "x", "y").isNaN)
  }

  test("pearson p-value: perfect correlation → 0; known 4-point example") {
    val lin = Seq((1.0, 2.0), (2.0, 4.0), (3.0, 6.0), (4.0, 8.0)).toDF("x", "y")
    // r lands at 1-ε in floating point, so the p-value is ~0 not exactly 0
    // (the reference has the same fuzz through numpy)
    assert(Correlation.pearsonPValue(lin, "x", "y") < 1e-12)
    // hand-computable: r of (1,1),(2,3),(3,2),(4,4) = 0.8, n=4, t = 0.8*sqrt(2/0.36)
    val df = Seq((1.0, 1.0), (2.0, 3.0), (3.0, 2.0), (4.0, 4.0)).toDF("x", "y")
    val r = Correlation.pearsonR(df, "x", "y")
    assert(math.abs(r - 0.8) < 1e-12)
    val t = 0.8 * math.sqrt(2.0 / (1.0 - 0.64))
    val expect = 2.0 * functions.SpecialMath.tCdf(-t, 2.0)
    assert(math.abs(Correlation.pearsonPValue(df, "x", "y") - expect) < 1e-12)
    // n <= 2 → NaN
    val tiny = Seq((1.0, 1.0), (2.0, 3.0)).toDF("x", "y")
    assert(Correlation.pearsonPValue(tiny, "x", "y").isNaN)
  }

  test("cramerPhi: independent 2x2 → 0, perfectly dependent → 1, constant → NaN") {
    val indep = Seq(("a", "x"), ("a", "y"), ("b", "x"), ("b", "y")).toDF("c0", "c1")
    assert(math.abs(Correlation.cramerPhi(indep, "c0", "c1")) < 1e-12)
    val dep = Seq(("a", "x"), ("a", "x"), ("b", "y"), ("b", "y")).toDF("c0", "c1")
    assert(math.abs(Correlation.cramerPhi(dep, "c0", "c1") - 1.0) < 1e-12)
    val const = Seq(("a", "x"), ("a", "y")).toDF("c0", "c1")
    assert(Correlation.cramerPhi(const, "c0", "c1").isNaN)
  }

  test("cramerPhi handles zero cells (2x3 with an empty cell)") {
    // contingency: a:(x:2, y:1, z:0), b:(x:0, y:1, z:2) — chi2 by hand:
    // n=6, row totals 3,3; col totals 2,2,2; expected all = 1
    // chi2 = (2-1)^2/1 + 0 + 1 + 1 + 0 + (2-1)^2/1 = 4; phi = sqrt(4/(6*1))
    val df = Seq(("a", "x"), ("a", "x"), ("a", "y"), ("b", "y"), ("b", "z"), ("b", "z"))
      .toDF("c0", "c1")
    val got = Correlation.cramerPhi(df, "c0", "c1")
    assert(math.abs(got - math.sqrt(4.0 / 6.0)) < 1e-12, s"got $got")
  }

  test("anova: between-group signal only → R2=1-ish, no signal → near 0, NaN cases") {
    // distinct group means, zero within-group variance → F = +inf → R2 = 1
    val pure = Seq(("a", 1.0), ("a", 1.0), ("b", 2.0), ("b", 2.0)).toDF("g", "y")
    assert(Correlation.anovaR2(pure, "g", "y") == 1.0)
    // one group → NaN; all-singleton groups → NaN
    val one = Seq(("a", 1.0), ("a", 2.0)).toDF("g", "y")
    assert(Correlation.anovaR2(one, "g", "y").isNaN)
    val singletons = Seq(("a", 1.0), ("b", 2.0), ("c", 3.0)).toDF("g", "y")
    assert(Correlation.anovaR2(singletons, "g", "y").isNaN)
  }

  test("anova F matches hand computation") {
    // groups a=(1,2,3), b=(2,3,4): means 2,3; overall 2.5; K=2, N=6
    // bgv = (3*(2-2.5)^2 + 3*(3-2.5)^2)/(2-1) = 1.5
    // wgv = ((1-2)^2+(3-2)^2 + (2-3)^2+(4-3)^2 + 0 + 0)/(6-2) = 4/4 = 1
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0), ("b", 2.0), ("b", 3.0), ("b", 4.0))
      .toDF("g", "y")
    val (f, k, n) = Correlation.anovaF(df, "g", "y")
    assert(k == 2 && n == 6)
    assert(math.abs(f - 1.5) < 1e-12, s"F=$f")
    val r2 = Correlation.anovaR2(df, "g", "y")
    assert(math.abs(r2 - (1.0 - 1.0 / (1.0 + 1.5 * (1.0 / 4.0)))) < 1e-12)
    val p = Correlation.anovaPValue(df, "g", "y")
    val expect = functions.SpecialMath.fSf(1.5, 1.0, 4.0)
    assert(math.abs(p - expect) < 1e-12)
  }

  test("stattype dispatch matches the reference table") {
    val df = Seq(("a", 1.0), ("a", 2.0), ("b", 5.0), ("b", 6.0)).toDF("g", "y")
    // nominal × numerical routes to ANOVA either way around
    val d1 = Correlation.correlation(df, "g", StatType.Nominal, "y", StatType.Numerical)
    val d2 = Correlation.correlation(df, "y", StatType.Numerical, "g", StatType.Nominal)
    assert(math.abs(d1 - d2) < 1e-12)
    // cyclic behaves as numerical
    val num = Seq((1.0, 2.0), (2.0, 4.1), (3.0, 5.9)).toDF("x", "y")
    val c1 = Correlation.correlation(num, "x", StatType.Cyclic, "y", StatType.Numerical)
    val c2 = Correlation.correlation(num, "x", StatType.Numerical, "y", StatType.Numerical)
    assert(math.abs(c1 - c2) < 1e-12)
  }

  test("survival functions match closed forms at known degrees of freedom") {
    import graft.functions.SpecialMath
    // t, df=2: 2·sf(t) = 1 − t/√(2+t²)
    for (t <- Seq(0.3, 1.0, 1.7, 4.2))
      assert(math.abs(2 * SpecialMath.tCdf(-t, 2.0) -
        (1 - t / math.sqrt(2 + t * t))) < 1e-10, s"t=$t")
    // χ², df=2: sf(x) = e^(−x/2)
    for (x <- Seq(0.5, 3.7, 11.0))
      assert(math.abs(SpecialMath.chi2Sf(x, 2.0) - math.exp(-x / 2)) < 1e-10, s"x=$x")
    // F, d1=2: sf(x) = (1 + 2x/d2)^(−d2/2)
    for ((x, d2) <- Seq((1.3, 40.0), (0.7, 7.0), (4.0, 100.0)))
      assert(math.abs(SpecialMath.fSf(x, 2.0, d2) -
        math.pow(1 + 2 * x / d2, -d2 / 2)) < 1e-10, s"x=$x d2=$d2")
  }

  test("survival functions match the reference's pinned values") {
    import graft.functions.SpecialMath
    def relerr(exp: Double, got: Double) = math.abs((got - exp) / exp)
    // reference tests/test_stats.py:100-154 (scipy-checked constants)
    assert(relerr(0.5173903, SpecialMath.fSf(1, 12, 8)) < 1e-4)
    assert(relerr(0.2618860, SpecialMath.fSf(1.9, 1, 3)) < 1e-4)
    assert(relerr(0.1111111, SpecialMath.fSf(8, 2, 2)) < 1e-4)
    assert(relerr(0.0434186, SpecialMath.fSf(10, 5, 3)) < 1e-4)
    assert(relerr(0.92318422834700042, SpecialMath.tCdf(1.9, 3)) < 1e-6)
    assert(relerr(0.076815771652999562, SpecialMath.tCdf(-1.9, 3)) < 1e-6)
    assert(relerr(0.30899158341328747, SpecialMath.tCdf(-0.5, 121)) < 1e-6)
    assert(relerr(0.346437e-4, SpecialMath.chi2Sf(193, 121)) < 1e-3)
  }

  test("4-point Pearson p-value equals the df=2 closed form exactly") {
    val df4 = Seq((0.0, 0.1), (1.0, 0.9), (2.0, 2.3), (3.0, 2.8)).toDF("x", "y")
    val p = Correlation.pearsonPValue(df4, "x", "y")
    // closed form from the same 4 points
    val xs = Seq(0.0, 1.0, 2.0, 3.0); val ys = Seq(0.1, 0.9, 2.3, 2.8)
    val mx = xs.sum / 4; val my = ys.sum / 4
    val cov = xs.zip(ys).map { case (a, b) => (a - mx) * (b - my) }.sum / 4
    val sx = math.sqrt(xs.map(a => (a - mx) * (a - mx)).sum / 4)
    val sy = math.sqrt(ys.map(b => (b - my) * (b - my)).sum / 4)
    val r = cov / (sx * sy)
    val t = math.abs(r) * math.sqrt(2 / (1 - r * r))
    assert(math.abs(p - (1 - t / math.sqrt(2 + t * t))) < 1e-9, s"p=$p")
  }
}

class GuessSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("guesses key, numerical, nominal, ignore on a crafted table") {
    val n = 200
    val rows = (1 to n).map { i =>
      (i.toLong,                       // all-distinct ints → key (first)
       s"user_$i",                     // all-distinct strings, key taken → ignore (pseudo-key)
       i * 1.37 + (i % 7),             // many distinct numbers → numerical
       Seq("red", "green", "blue")(i % 3), // 3 levels → nominal
       "constant")                     // single value → ignore
    }
    val df = rows.toDF("id", "name", "score", "color", "fixed")
    val got = Guess.guessStattypes(df).map(g => g.column -> g.stattype).toMap
    assert(got("id") == StatType.Key, got.toString)
    assert(got("name") == StatType.Ignore, got.toString)
    assert(got("score") == StatType.Numerical, got.toString)
    assert(got("color") == StatType.Nominal, got.toString)
    assert(got("fixed") == StatType.Ignore, got.toString)
  }

  test("nullify-and-reguess: dominant value masks the remainder") {
    // 95% "missing", remainder 3 colors → nominal after nullify recursion
    val rows = (1 to 200).map { i =>
      if (i <= 190) "missing" else Seq("red", "green", "blue")(i % 3)
    }
    val df = rows.toDF("c")
    val g = Guess.guessStattypes(df).head
    assert(g.stattype == StatType.Nominal, g.toString)
    assert(g.reason.contains("remainder"), g.reason)
  }

  test("null markers are nullified; few distinct ints → nominal not numerical") {
    val rows = (1 to 100).map(i => (if (i % 10 == 0) "N/A" else (i % 5).toString, i % 30))
    val df = rows.toDF("cat_ints", "many_ints")
    val got = Guess.guessStattypes(df).map(g => g.column -> g.stattype).toMap
    assert(got("cat_ints") == StatType.Nominal, got.toString)   // 5 distinct ints ≤ 20
    assert(got("many_ints") == StatType.Numerical, got.toString) // 30 distinct > 20, ratio 0.3
  }

  test("overrides win and unknown overrides are rejected") {
    val df = (1 to 50).map(i => (i, i % 3)).toDF("a", "b")
    val got = Guess.guessStattypes(df, overrides = Map("b" -> StatType.Numerical))
      .map(g => g.column -> g.stattype).toMap
    assert(got("b") == StatType.Numerical)
    intercept[IllegalArgumentException] {
      Guess.guessStattypes(df, overrides = Map("zzz" -> StatType.Nominal))
    }
  }

  test("guess over the real customer table is sane") {
    val df = Tables.load(spark, sf, "customer")
    val got = Guess.guessStattypes(df).map(g => g.column -> g.stattype).toMap
    assert(got("c_custkey") == StatType.Key, got.toString)
    assert(got("c_acctbal") == StatType.Numerical, got.toString)
    assert(got("c_mktsegment") == StatType.Nominal, got.toString)
  }
}
