package graft.tools

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

/** One-shot generator for the checked-in JSONL ingest fixture
  * (`fixtures/docs.jsonl`): 113 valid newline-delimited JSON records
  * exercising the ingest edge surface — missing optional fields,
  * explicit nulls, reordered keys, extra unknown fields, unicode
  * escapes and raw UTF-8, numbers in strings vs numbers, and
  * empty/whitespace text. Every line is VALID JSON (the DuckDB oracle
  * must read the same file); malformed-line behavior is pinned by
  * JsonlSpec over a scratch file instead.
  *
  *   sbt "runMain graft.tools.JsonlFixture /root/repo/fixtures"
  *
  * Regeneration is byte-identical (fully deterministic, LF endings).
  */
object JsonlFixture {

  def lines(): Seq[String] = {
    val rng = graft.backends.DetRng(20260815L)
    val words = Seq("spark", "table", "row", "scan", "merge", "hash",
      "key", "value", "batch", "fast", "slow", "agg")
    def text(n: Int): String =
      (0 until n).map(_ => words(rng.nextInt(words.length))).mkString(" ")
    val base = (0 until 100).map { i =>
      val src = s"crawl-${i % 4}"
      s"""{"doc_id": $i, "source": "$src", "text": "${text(5 + rng.nextInt(20))}"}"""
    }
    val edges = Seq(
      // key order must not matter
      """{"text": "order of keys reversed", "source": "crawl-0", "doc_id": 100}""",
      // missing optional text -> NULL
      """{"doc_id": 101, "source": "crawl-1"}""",
      // explicit null text -> NULL
      """{"doc_id": 102, "source": "crawl-2", "text": null}""",
      // empty and whitespace-only text survive as-is
      """{"doc_id": 103, "source": "crawl-3", "text": ""}""",
      """{"doc_id": 104, "source": "crawl-0", "text": "   "}""",
      // unknown extra fields are ignored
      """{"doc_id": 105, "source": "crawl-1", "text": "extra fields ride along", "warc_offset": 123456, "pipeline": {"stage": "raw"}}""",
      // unicode: JSON \u escapes (built by concat so the Scala lexer
      // can't pre-process them) and raw UTF-8
      "{\"doc_id\": 106, \"source\": \"crawl-2\", \"text\": \"caf" +
        "\\" + "u00e9 touch" + "\\" + "u00e9\"}",
      """{"doc_id": 107, "source": "crawl-3", "text": "naïve café 中文"}""",
      // escaped quotes / backslashes / newlines inside the string
      """{"doc_id": 108, "source": "crawl-0", "text": "she said \"hi\\bye\" and\nleft"}""",
      // a number-looking string stays a string
      """{"doc_id": 109, "source": "crawl-1", "text": "12345"}""",
      // missing source
      """{"doc_id": 110, "text": "no source field"}""",
      // duplicate content across sources (ingest must not dedup)
      """{"doc_id": 111, "source": "crawl-2", "text": "duplicate payload"}""",
      """{"doc_id": 112, "source": "crawl-3", "text": "duplicate payload"}""")
    base ++ edges
  }

  def main(args: Array[String]): Unit = {
    val outDir = if (args.nonEmpty) args(0) else "/root/repo/fixtures"
    val p = Paths.get(outDir, "docs.jsonl")
    Files.createDirectories(p.getParent)
    Files.write(p, (lines().mkString("\n") + "\n").getBytes(StandardCharsets.UTF_8))
    println(s"[jsonl-fixture] wrote ${lines().size} lines to $p")
  }
}
