package graft.bql

import graft.catalog.Names

/** The cgpm generator-schema sub-language (reference: `CREATE GENERATOR
  * ... (...)` bodies are re-parsed by cgpm_schema.parse, imported at
  * src/backends/cgpm_backend.py:39-41; grammar
  * src/backends/cgpm_schema/grammar.y; clause inventory SURVEY §2.10).
  * The parser input is the token soup the BQL parser preserves.
  *
  * Supported clauses:
  *   - `SUBSAMPLE n` / `SUBSAMPLE(n)` — bound the MCMC row subsample
  *     (reference: cgpm_backend.py:189-205)
  *   - `<var> <dist>` basic clauses — validated against the default
  *     dist table (`_DEFAULT_DIST`, cgpm_backend.py:1905-1912)
  *   - `<dev> DEVIATION (<obs>)` — nig_normal latent deviation
  *   - `LATENT <var> <stattype>` — generator-scoped latent variable
  *     (reference: grammar.y clause(latent); colno<0 via core.py:398-414)
  *   - `OVERRIDE [GENERATIVE] MODEL FOR outs [GIVEN ins]
  *      [[AND] EXPOSE lv st, ...] USING predictor[(k=v, ...)]` — foreign
  *     predictor composition (reference: grammar.y clause(foreign);
  *     exposed variables become latent outputs, cgpm_backend.py:1491-1508)
  */
object GenSchema {

  final case class Foreign(
      predictor: String,
      outputs: Seq[String],
      inputs: Seq[String],
      exposed: Seq[(String, String)],   // (latent var, stattype)
      params: Map[String, String])

  final case class Parsed(
      subsample: Option[Int],
      basics: Seq[(String, String)],        // (variable, dist)
      deviations: Seq[(String, String)],    // (latent name, observed var)
      latents: Seq[(String, String)],       // (latent name, stattype)
      foreigns: Seq[Foreign])

  def parse(schemata: Seq[Seq[String]]): Parsed = {
    var subsample: Option[Int] = None
    val basics = Seq.newBuilder[(String, String)]
    val deviations = Seq.newBuilder[(String, String)]
    val latents = Seq.newBuilder[(String, String)]
    val foreigns = Seq.newBuilder[Foreign]
    schemata.map(_.filter(_.nonEmpty)).filter(_.nonEmpty).foreach { toks =>
      val headKw = Names.casefold(toks.head)
      if (headKw == "latent") {
        val words = toks.filterNot(t => t == "(" || t == ")" || t == ",")
        require(words.length == 3,
          s"LATENT clause needs `LATENT var stattype`: ${toks.mkString(" ")}")
        latents += ((words(1), Names.casefold(words(2))))
      } else if (headKw == "override") {
        foreigns += parseOverride(toks)
      } else {
        val words = toks.filterNot(t => t == "(" || t == ")" || t == ",")
        words.map(Names.casefold) match {
          case Seq() => ()
          case Seq("subsample", n) =>
            subsample = Some(n.toInt)
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
    }
    Parsed(subsample, basics.result(), deviations.result(),
      latents.result(), foreigns.result())
  }

  /** OVERRIDE [GENERATIVE] MODEL FOR o1, o2 [GIVEN i1, i2]
    * [[AND] EXPOSE v1 st1, v2 st2] USING name[(k=v, ...)] */
  private def parseOverride(toks0: Seq[String]): Foreign = {
    var toks = toks0.toList
    def fail(msg: String): Nothing = throw new IllegalArgumentException(
      s"$msg in OVERRIDE clause: ${toks0.mkString(" ")}")
    def eat(kw: String): Unit = toks match {
      case h :: t if Names.casefold(h) == kw => toks = t
      case _ => fail(s"expected $kw")
    }
    def peek: Option[String] = toks.headOption.map(Names.casefold)
    def isKw(s: Option[String]) =
      s.exists(Set("given", "and", "expose", "using"))
    eat("override")
    if (peek.contains("generative")) toks = toks.tail
    eat("model"); eat("for")
    def nameList(): Seq[String] = {
      val out = Seq.newBuilder[String]
      var expectName = true
      while (toks.nonEmpty && (expectName || toks.head == ",") && !isKw(peek)) {
        if (toks.head == ",") { toks = toks.tail; expectName = true }
        else { out += toks.head; toks = toks.tail; expectName = false }
      }
      out.result()
    }
    val outputs = nameList()
    if (outputs.isEmpty) fail("no output variables")
    val inputs = if (peek.contains("given")) { toks = toks.tail; nameList() } else Nil
    val exposed = Seq.newBuilder[(String, String)]
    if (peek.contains("and")) toks = toks.tail
    if (peek.contains("expose")) {
      toks = toks.tail
      var more = true
      while (more) {
        toks match {
          case v :: st :: rest =>
            exposed += ((v, Names.casefold(st)))
            toks = rest
            if (toks.headOption.contains(",")) { toks = toks.tail } else more = false
          case _ => fail("EXPOSE needs `var stattype` pairs")
        }
        if (peek.contains("using")) more = false
      }
    }
    eat("using")
    val predictor = toks match {
      case h :: t => toks = t; Names.casefold(h)
      case Nil => fail("missing predictor name")
    }
    // optional (k=v, ...) — parens arrive as "(" ")" markers
    val params = scala.collection.mutable.Map.empty[String, String]
    if (toks.headOption.contains("(")) {
      toks = toks.tail
      while (toks.nonEmpty && toks.head != ")") {
        toks match {
          case k :: "=" :: v :: rest =>
            params += Names.casefold(k) -> Names.casefold(v); toks = rest
          case "," :: rest => toks = rest
          case other => fail(s"bad predictor parameter near ${other.take(3).mkString(" ")}")
        }
      }
      if (toks.headOption.contains(")")) toks = toks.tail
    }
    Foreign(predictor, outputs, inputs, exposed.result(), params.toMap)
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
