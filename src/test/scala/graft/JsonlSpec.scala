package graft

import graft.sources.Jsonl
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.charset.StandardCharsets
import java.nio.file.Files

/** JSONL ingest (p60): strictness posture over malformed lines, the
  * audited mode's verdict columns, and schema semantics (missing →
  * NULL, extras ignored, key order irrelevant). The valid-file parse
  * semantics are cross-engine-pinned by the p60 oracle over the
  * checked-in fixture. */
class JsonlSpec extends AnyFunSuite {
  import TestSpark._

  private val schema = StructType(Seq(
    StructField("doc_id", LongType), StructField("source", StringType),
    StructField("text", StringType)))

  private def scratch(lines: String*): String = {
    val f = Files.createTempFile("graft_jsonl", ".jsonl")
    Files.write(f, (lines.mkString("\n") + "\n").getBytes(StandardCharsets.UTF_8))
    f.toFile.deleteOnExit()
    f.toString
  }

  test("strict mode fails loudly on a malformed line") {
    val p = scratch(
      """{"doc_id": 1, "source": "a", "text": "fine"}""",
      """{"doc_id": 2, "source": "b", "text": BROKEN}""")
    val e = intercept[Exception] {
      Jsonl.read(spark, p, schema).count()
    }
    assert(e.getMessage.toLowerCase.contains("malformed")
      || Option(e.getCause).exists(_.getMessage.toLowerCase.contains("malformed")),
      s"expected a malformed-record error, got: ${e.getMessage}")
  }

  test("audited mode keeps every line with an auditable verdict") {
    val p = scratch(
      """{"doc_id": 1, "source": "a", "text": "fine"}""",
      """{"doc_id": 2, "source": "b", "text": BROKEN}""",
      """{"doc_id": 3, "text": "missing source is fine"}""")
    val out = Jsonl.readAudited(spark, p, schema)
      .orderBy(coalesce(col("doc_id"), lit(Long.MaxValue)))
      .collect()
    assert(out.length === 3)
    assert(out(0).getAs[Boolean]("ok") && out(0).getAs[String]("bad_line") == null)
    assert(out(1).getAs[Boolean]("ok") && out(1).getAs[String]("source") == null)
    val bad = out(2)
    assert(!bad.getAs[Boolean]("ok"))
    assert(bad.getAs[String]("bad_line").contains("BROKEN"))
    assert(bad.isNullAt(bad.fieldIndex("doc_id")))
  }

  test("key order and unknown extras do not change the parse") {
    val p = scratch(
      """{"text": "t", "source": "s", "doc_id": 7, "extra": {"deep": [1,2]}}""")
    val r = Jsonl.read(spark, p, schema).head()
    assert((r.getLong(0), r.getString(1), r.getString(2)) === ((7L, "s", "t")))
  }

  test("the reserved corrupt-record column name is refused in schemas") {
    val clash = schema.add("__graft_corrupt", StringType)
    val e = intercept[IllegalArgumentException] {
      Jsonl.readAudited(spark, scratch("""{"doc_id": 1}"""), clash)
    }
    assert(e.getMessage.contains("reserved"))
  }
}
