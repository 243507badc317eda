package graft

import org.scalatest.funsuite.AnyFunSuite

/** The determinism gate is only as strong as its hash — these pin the
  * properties Verify.canonicalHash claims: invariance to row and
  * column ORDER (Spark gives no ordering guarantees), sensitivity to
  * VALUES (incl. IEEE bit distinctions a toString render would
  * alias), and no cross-type collisions for null vs the string
  * "null". */
class CanonicalHashSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def h(df: org.apache.spark.sql.DataFrame): String =
    Verify.canonicalHash(df)

  test("row order and column order do not change the hash") {
    val a = Seq((1L, "x", 1.5), (2L, "y", 2.5)).toDF("id", "s", "v")
    val rowsSwapped = Seq((2L, "y", 2.5), (1L, "x", 1.5)).toDF("id", "s", "v")
    val colsSwapped = a.select("v", "id", "s")
    assert(h(a) == h(rowsSwapped))
    assert(h(a) == h(colsSwapped))
  }

  test("value, name, and assignment changes DO change the hash") {
    val a = Seq((1L, "x", 1.5), (2L, "y", 2.5)).toDF("id", "s", "v")
    assert(h(a) != h(Seq((1L, "x", 1.5), (2L, "y", 2.6)).toDF("id", "s", "v")))
    assert(h(a) != h(a.withColumnRenamed("v", "w")))
    // same multiset of cell values, different row assignment
    assert(h(Seq((1L, 2.5), (2L, 1.5)).toDF("id", "v")) !=
      h(Seq((1L, 1.5), (2L, 2.5)).toDF("id", "v")))
  }

  test("IEEE distinctions and null-vs-'null' cannot alias") {
    assert(h(Seq(Tuple1(0.0)).toDF("v")) != h(Seq(Tuple1(-0.0)).toDF("v")))
    val nullDf = Seq(Tuple1(Option.empty[String])).toDF("v")
    val strDf = Seq(Tuple1(Option("null"))).toDF("v")
    assert(h(nullDf) != h(strDf))
    // NaN hashes stably (doubleToRawLongBits, not toString)
    val nan = Seq(Tuple1(Double.NaN)).toDF("v")
    assert(h(nan) == h(Seq(Tuple1(Double.NaN)).toDF("v")))
    assert(h(nan) != h(Seq(Tuple1(1.0)).toDF("v")))
  }

  test("row and cell boundaries cannot alias") {
    // {"ab","c"} vs {"a","bc"}: same sorted-concatenated characters,
    // different row multisets — the per-row length prefix must separate
    // them (pre-fix these collided)
    val x = Seq(Tuple1("ab"), Tuple1("c")).toDF("v")
    val y = Seq(Tuple1("a"), Tuple1("bc")).toDF("v")
    assert(h(x) != h(y))
    // a string cell containing the in-row separator byte must not
    // migrate across cell boundaries — string cells are length-prefixed
    val a = Seq(("a\u0001b", "c")).toDF("u", "v")
    val b = Seq(("a", "b\u0001c")).toDF("u", "v")
    assert(h(a) != h(b))
  }

  test("arrays and nested rows hash by content, unambiguous across boundaries") {
    // ["ab","c"] must not alias ["a","bc"] — the separator guarantees it
    val x = Seq(Tuple1(Seq("ab", "c"))).toDF("v")
    val y = Seq(Tuple1(Seq("a", "bc"))).toDF("v")
    assert(h(x) != h(y))
    val arr = Seq((1L, Array(1.0f, 2.0f))).toDF("id", "emb")
    assert(h(arr) == h(Seq((1L, Array(1.0f, 2.0f))).toDF("id", "emb")))
    assert(h(arr) != h(Seq((1L, Array(1.0f, 2.5f))).toDF("id", "emb")))
  }
}
