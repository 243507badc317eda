package graft.bql

import graft.catalog.Names

/** The cgpm generator-schema sub-language (reference: `CREATE GENERATOR
  * ... (...)` bodies are re-parsed by cgpm_schema.parse, imported at
  * src/backends/cgpm_backend.py:39-41; clause inventory SURVEY §2.10).
  * The parser input is the token soup the BQL parser preserves.
  *
  * Supported clauses (the slice the shipped backends can honor):
  *   - `SUBSAMPLE n` / `SUBSAMPLE(n)` — bound the MCMC row subsample
  *     (reference: cgpm_backend.py:189-205)
  *   - `<var> <dist>` basic clauses — validated against the default
  *     dist table (`_DEFAULT_DIST`, cgpm_backend.py:1905-1912):
  *     numerical → normal, nominal → categorical; requesting any other
  *     component dist is rejected as unsupported
  * `LATENT` and `OVERRIDE GENERATIVE MODEL` (foreign CGPM composition)
  * are recognized and rejected explicitly.
  */
object GenSchema {

  final case class Parsed(
      subsample: Option[Int],
      basics: Seq[(String, String)],        // (variable, dist)
      deviations: Seq[(String, String)])    // (latent name, observed var)

  def parse(schemata: Seq[Seq[String]]): Parsed = {
    var subsample: Option[Int] = None
    val basics = Seq.newBuilder[(String, String)]
    val deviations = Seq.newBuilder[(String, String)]
    schemata.map(_.filter(_.nonEmpty)).filter(_.nonEmpty).foreach { toks =>
      val words = toks.filterNot(t => t == "(" || t == ")" || t == ",")
      words.map(Names.casefold) match {
        case Seq() => ()
        case Seq("subsample", n) =>
          subsample = Some(n.toInt)
        case head +: _ if head == "latent" =>
          throw new UnsupportedOperationException(
            "LATENT variables: not supported yet")
        case head +: _ if head == "override" =>
          throw new UnsupportedOperationException(
            "OVERRIDE GENERATIVE MODEL (foreign CGPM composition): not supported")
        case Seq(dev, "deviation", obs) =>
          // nig_normal latent deviation variable (reference:
          // nig_normal.py:145-177 — `dev DEVIATION (obs)`)
          deviations += ((words.head, words(2)))
        case Seq(v, dist) =>
          basics += ((words.head, dist))
        case Seq(v, dist, rest @ _*) =>
          // dist with parameters, e.g. categorical(k=3) — parameters were
          // flattened out of the parens above; accept dist, ignore params
          basics += ((words.head, dist))
        case other =>
          throw new IllegalArgumentException(
            s"Unrecognized generator schema clause: ${toks.mkString(" ")}")
      }
    }
    Parsed(subsample, basics.result(), deviations.result())
  }

  /** Validate basic clauses against the default dist per stattype. */
  def validateDists(parsed: Parsed, isNominal: String => Boolean): Unit =
    parsed.basics.foreach { case (v, dist) =>
      val expected = if (isNominal(v)) "categorical" else "normal"
      require(dist == expected,
        s"Component dist '$dist' for $v is not supported (expected $expected;" +
          " the shipped CrossCat models numerical→normal, nominal→categorical)")
    }
}
