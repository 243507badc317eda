package graft.bql

import Ast._
import Lexer._

/** Recursive-descent BQL parser (reference: LALR grammar src/grammar.y +
  * semantic actions src/parse.py:116-729; same language, different
  * parsing technique — the grammar's %fallback of keywords to L_NAME
  * becomes "accept any unquoted name token except CASE/WHEN where a name
  * is expected", and the few shift ambiguities (SIMILARITY-as-column vs
  * SIMILARITY-the-estimator, PREDICT-as-column, …) are resolved by
  * bounded backtracking.
  */
object Parser {

  final class ParseError(msg: String, val pos: Int)
      extends RuntimeException(s"$msg (at offset $pos)")

  /** Parse a BQL string holding exactly one phrase (reference enforces
    * one phrase per execute, src/bayesdb.py:270-280). */
  def parseOne(input: String): Parametrized = {
    val all = parseAll(input)
    if (all.isEmpty) throw new ParseError("Empty BQL string", 0)
    if (all.length > 1) throw new ParseError("More than one phrase", 0)
    all.head
  }

  /** Parse a semicolon-separated script of phrases. */
  def parseAll(input: String): Seq[Parametrized] = {
    val lexed = Lexer.lex(input)
    val p = new Parser(lexed.tokens)
    val phrases = Seq.newBuilder[Parametrized]
    while (!p.atEof) {
      if (p.opSym(";")) ()  // empty phrase_opt
      else {
        val ph = p.phrase()
        phrases += Parametrized(ph, lexed.nNumpar, lexed.namparMap)
        if (!p.atEof && !p.opSym(";"))
          throw new ParseError("Expected ';' between phrases", p.pos)
      }
    }
    phrases.result()
  }

  /** Is this string one or more complete phrases (i.e., does it end at a
    * phrase boundary)? Used by REPLs for multi-line input (reference:
    * bql_string_complete_p, src/parse.py:86-114). Approximation: lexes
    * cleanly and ends with ';' outside any string/paren nesting, or
    * parses outright. */
  def stringCompleteP(input: String): Boolean = {
    try {
      val lexed = Lexer.lex(input)
      val toks = lexed.tokens
      if (toks.length <= 1) return false  // only EOF
      toks(toks.length - 2) match {
        case TOp(";", _) => true
        case _ =>
          try { parseAll(input); true }
          catch { case _: ParseError => false }
      }
    } catch { case _: LexError => false }
  }
}

private final class Parser(tokens: Vector[Token]) {
  import Parser.ParseError

  private var i = 0
  private def cur: Token = tokens(i)
  private def ahead(k: Int): Token = tokens(math.min(i + k, tokens.length - 1))
  def pos: Int = cur.pos
  def atEof: Boolean = cur.isInstanceOf[TEof]

  private def fail(msg: String): Nothing = throw new ParseError(msg, pos)

  /** Backtracking: run p; on ParseError restore position and return None. */
  private def attempt[T](p: => T): Option[T] = {
    val save = i
    try Some(p)
    catch { case _: ParseError => i = save; None }
  }

  // ------------------------------------------------------------ token ops

  /** Current token is the keyword `k` (casefolded, unquoted)? */
  private def at(k: String): Boolean = cur match {
    case t: TName if !t.quoted => t.folded == k
    case _ => false
  }
  private def atAhead(n: Int, k: String): Boolean = ahead(n) match {
    case t: TName if !t.quoted => t.folded == k
    case _ => false
  }
  private def kw(k: String): Boolean =
    if (at(k)) { i += 1; true } else false
  private def expectKw(k: String): Unit =
    if (!kw(k)) fail(s"Expected ${k.toUpperCase}")

  def opSym(sym: String): Boolean = cur match {
    case TOp(s, _) if s == sym => i += 1; true
    case _ => false
  }
  private def atOp(sym: String): Boolean = cur match {
    case TOp(s, _) => s == sym
    case _ => false
  }
  private def atOpAhead(n: Int, sym: String): Boolean = ahead(n) match {
    case TOp(s, _) => s == sym
    case _ => false
  }
  private def expectOp(sym: String): Unit =
    if (!opSym(sym)) fail(s"Expected '$sym'")

  /** A name: any TName except unquoted CASE/WHEN (the two keywords the
    * reference excludes from %fallback, src/grammar.y:777,874). */
  private def name(): String = cur match {
    case t: TName if t.quoted || (t.folded != "case" && t.folded != "when") =>
      i += 1; t.value
    case _ => fail("Expected a name")
  }
  private def integer(): Long = cur match {
    case TInt(v, _) => i += 1; v
    case _ => fail("Expected an integer")
  }
  private def stringLit(): String = cur match {
    case TString(v, _) => i += 1; v
    case _ => fail("Expected a string")
  }

  // -------------------------------------------------------------- phrases

  def phrase(): Phrase =
    if (at("select") || at("estimate") || at("infer") || at("simulate")) query()
    else command()

  def query(): Query =
    if (at("select")) select()
    else if (at("estimate")) estimate()
    else if (at("infer")) infer()
    else if (at("simulate")) simulate()
    else fail("Expected a query")

  private def atQueryStart: Boolean =
    at("select") || at("estimate") || at("infer") || at("simulate")

  // -------------------------------------------------------------- command

  private def command(): Command = {
    if (kw("begin")) Begin
    else if (kw("rollback")) Rollback
    else if (kw("commit")) Commit
    else if (at("create")) createCommand()
    else if (at("drop")) dropCommand()
    else if (at("alter")) alterCommand()
    else if (kw("guess")) { expectKw("schema"); expectKw("for"); GuessSchema(name()) }
    else if (kw("initialize")) {
      val n = integer().toInt
      if (!kw("model")) expectKw("models")
      val ine = ifNotExists()
      expectKw("for")
      InitModels(ine, name(), n)
    }
    else if (kw("analyze")) analyzeCommand()
    else if (kw("regress")) regressCommand()
    else fail("Expected a command or query")
  }

  private def ifNotExists(): Boolean =
    if (at("if") && atAhead(1, "not") && atAhead(2, "exists")) { i += 3; true } else false
  private def ifExists(): Boolean =
    if (at("if") && atAhead(1, "exists")) { i += 2; true } else false

  private def createCommand(): Command = {
    expectKw("create")
    val temp = kw("temp") || kw("temporary")
    if (kw("table")) {
      val ine = ifNotExists()
      val nm = name()
      if (kw("as")) CreateTabAs(temp, ine, nm, query())
      else if (kw("from")) CreateTabCsv(temp, ine, nm, stringLit())
      else fail("Expected AS or FROM in CREATE TABLE")
    } else if (kw("population")) {
      if (temp) fail("TEMP populations are not supported")
      val ine = ifNotExists()
      // implicit-name form: CREATE POPULATION FOR t (...)
      val (nm, table) =
        if (kw("for")) { val t = name(); (t, t) }
        else { val n = name(); expectKw("for"); (n, name()) }
      if (at("with") && atAhead(1, "schema")) i += 2
      val close = if (opSym("(")) ")" else { expectOp("{"); "}" }
      val schema = popSchema()
      expectOp(close)
      CreatePop(ine, nm, table, schema)
    } else if (kw("generator")) {
      if (temp) fail("TEMP generators are not supported")
      val ine = ifNotExists()
      val (nm, pop) =
        if (kw("for")) (None, name())
        else { val n = name(); expectKw("for"); (Some(n), name()) }
      val backend = if (kw("using")) Some(name()) else None
      val schema =
        if (atOp("(") || atOp("{")) {
          val close = if (opSym("(")) ")" else { expectOp("{"); "}" }
          val ss = genSchema()
          expectOp(close)
          ss
        } else Seq(Seq.empty)
      CreateGen(nm, ine, pop, backend, schema)
    } else fail("Expected TABLE, POPULATION, or GENERATOR after CREATE")
  }

  private def popSchema(): Seq[PopClause] = {
    val clauses = Seq.newBuilder[PopClause]
    var done = false
    while (!done) {
      if (!atOp(";") && !atOp(")") && !atOp("}")) clauses += popClause()
      if (!opSym(";")) done = true
    }
    clauses.result()
  }

  private def popClause(): PopClause = {
    if (kw("set")) {
      if (!kw("stattypes")) expectKw("stattype")
      expectKw("of")
      val cols = popColumns()
      expectKw("to")
      PopModelVars(cols, name())
    } else if (kw("ignore")) PopIgnoreVars(popColumns())
    else if (kw("guess")) {
      if ((at("stattype") || at("stattypes")) && atAhead(1, "of")) i += 2
      if (atOp("(") && atOpAhead(1, "*") && atOpAhead(2, ")")) {
        i += 3; PopGuessVars(Nil)
      } else PopGuessVars(popColumns())
    } else {
      val col = name()
      PopModelVars(Seq(col), name())
    }
  }

  private def popColumns(): Seq[String] = {
    val cols = Seq.newBuilder[String]
    cols += name()
    while (opSym(",")) cols += name()
    cols.result()
  }

  /** Generator schema: comma-separated token soups with parens flattened
    * to "(" / ")" markers (reference keeps nested lists,
    * src/parse.py:247-254; flat-with-markers is equivalent). */
  private def genSchema(): Seq[Seq[String]] = {
    val schemata = Seq.newBuilder[Seq[String]]
    var done = false
    while (!done) {
      cur match {
        case TOp(")", _) | TOp("}", _) | _: TEof => done = true
        case TOp(",", _) | TOp(";", _) => i += 1  // separator / empty clause
        case t: TName if graft.catalog.Names.casefold(t.value) == "override" =>
          // OVERRIDE [GENERATIVE] MODEL FOR a, b ... USING f[(...)]:
          // internal commas belong to the clause (reference grammar.y
          // vars(many)); the clause ends after the USING predictor
          schemata += overrideSchemum()
        case _ => schemata += genSchemum(0)
      }
    }
    schemata.result()
  }

  /** One OVERRIDE clause: runs through `USING name [(params)]`. */
  private def overrideSchemum(): Seq[String] = {
    val toks = Seq.newBuilder[String]
    var sawUsing = false
    var done = false
    while (!done) {
      cur match {
        case TOp("(", _) =>
          i += 1; toks += "("; toks ++= genSchemum(1, stopAtComma = false); toks += ")"
          expectOp(")")
          if (sawUsing) done = true  // (params) after the predictor name
        case TOp(")", _) | TOp("}", _) | TOp(";", _) | _: TEof => done = true
        case t: TName =>
          i += 1; toks += t.value
          if (sawUsing) {
            // predictor name; an optional (params) group may follow
            cur match {
              case TOp("(", _) => ()  // next loop turn consumes it
              case _ => done = true
            }
          } else if (graft.catalog.Names.casefold(t.value) == "using") sawUsing = true
        case TOp(",", _) => i += 1; toks += ","
        case TInt(v, _) => i += 1; toks += v.toString
        case TFloat(v, _) => i += 1; toks += v.toString
        case TString(v, _) => i += 1; toks += v
        case TOp(s, _) => i += 1; toks += s
        case _ => fail("Bad generator schema token")
      }
    }
    toks.result()
  }

  private def genSchemum(depth: Int, stopAtComma: Boolean = true): Seq[String] = {
    val toks = Seq.newBuilder[String]
    var done = false
    while (!done) {
      cur match {
        case TOp("(", _) =>
          i += 1; toks += "("; toks ++= genSchemum(depth + 1, stopAtComma = false); toks += ")"
          expectOp(")")
        case TOp(")", _) | TOp("}", _) | _: TEof => done = true
        case TOp(",", _) if stopAtComma => done = true
        case TOp(";", _) if stopAtComma => done = true
        case t: TName => i += 1; toks += t.value
        case TInt(v, _) => i += 1; toks += v.toString
        case TFloat(v, _) => i += 1; toks += v.toString
        case TString(v, _) => i += 1; toks += v
        case TOp(s, _) => i += 1; toks += s
        case _ => fail("Bad generator schema token")
      }
    }
    toks.result()
  }

  private def dropCommand(): Command = {
    expectKw("drop")
    if (kw("table")) { val ife = ifExists(); DropTab(ife, name()) }
    else if (kw("population")) { val ife = ifExists(); DropPop(ife, name()) }
    else if (kw("generator")) { val ife = ifExists(); DropGen(ife, name()) }
    else if (kw("model") || kw("models")) {
      val ms = attempt(modelSet())
      expectKw("from")
      DropModels(name(), ms)
    } else fail("Expected TABLE, POPULATION, GENERATOR, or MODELS after DROP")
  }

  private def alterCommand(): Command = {
    expectKw("alter")
    if (kw("table")) {
      val t = name()
      val cmds = Seq.newBuilder[AlterTabCmd]
      var done = false
      while (!done) {
        expectKw("rename")
        if (kw("to")) cmds += AlterTabRenameTab(name())
        else {
          kw("column")
          val old = name(); expectKw("to")
          cmds += AlterTabRenameCol(old, name())
        }
        if (!opSym(",")) done = true
      }
      AlterTab(t, cmds.result())
    } else if (kw("population")) {
      val p = name()
      val cmds = Seq.newBuilder[AlterPopCmd]
      var done = false
      while (!done) {
        if (kw("rename")) { expectKw("to"); cmds += AlterPopRenamePop(name()) }
        else if (kw("add")) {
          expectKw("variable")
          val c = name()
          val st = attempt(name())
          cmds += AlterPopAddVar(c, st)
        } else if (kw("set")) {
          if (!kw("stattypes")) expectKw("stattype")
          expectKw("of")
          val cols = popColumns()
          expectKw("to")
          cmds += AlterPopStatType(cols, name())
        } else fail("Expected RENAME, ADD, or SET in ALTER POPULATION")
        if (!opSym(",")) done = true
      }
      AlterPop(p, cmds.result())
    } else if (kw("generator")) {
      val g = name()
      val modelnos =
        if ((at("model") || at("models")) && atOpAhead(1, "(")) {
          i += 1; expectOp("(")
          val m = modelSet()
          expectOp(")")
          Some(m)
        } else None
      val cmds = Seq.newBuilder[AlterGenCmd]
      var done = false
      while (!done) {
        if (at("rename") && atAhead(1, "to")) {
          i += 2; cmds += AlterGenRenameGen(name())
        } else cmds += AlterGenGeneric(genSchemum(0))
        if (!opSym(",")) done = true
      }
      AlterGen(g, modelnos, cmds.result())
    } else fail("Expected TABLE, POPULATION, or GENERATOR after ALTER")
  }

  private def modelSet(): Seq[Int] = {
    val ns = Seq.newBuilder[Int]
    def range(): Unit = {
      val lo = integer().toInt
      if (opSym("-")) { val hi = integer().toInt; ns ++= (lo to hi) }
      else ns += lo
    }
    range()
    while (opSym(",")) range()
    ns.result().sorted
  }

  private def analyzeCommand(): Command = {
    val gen = name()
    val modelnos =
      if (kw("model") || kw("models")) Some(modelSet()) else None
    expectKw("for")
    def duration(): (String, Int) = {
      val n = integer().toInt
      if (kw("iteration") || kw("iterations")) ("iterations", n)
      else if (kw("minute") || kw("minutes")) ("seconds", 60 * n)
      else if (kw("second") || kw("seconds")) ("seconds", n)
      else fail("Expected ITERATIONS, MINUTES, or SECONDS")
    }
    val d0 = duration()
    val d1 = if (kw("or")) Some(duration()) else None
    val durations = Seq(Some(d0), d1).flatten
    val iters = durations.collect { case ("iterations", n) => n }
    val secs = durations.collect { case ("seconds", n) => n }
    val ckpt = if (kw("checkpoint")) Some(duration()) else None
    val program =
      if (opSym("(")) {
        // analysis programs keep commas as plain tokens (reference:
        // src/parse.py:305-309 — ANY includes T_COMMA)
        val p = genSchemum(0, stopAtComma = false)
        expectOp(")")
        p
      } else Seq.empty
    AnalyzeModels(gen, modelnos,
      iters.minOption, secs.minOption,
      ckpt.collect { case ("iterations", n) => n },
      ckpt.collect { case ("seconds", n) => n },
      program)
  }

  private def regressCommand(): Command = {
    val target = name()
    expectKw("given")
    expectOp("(")
    val givens = selectColumns()
    expectOp(")")
    val nsamp = nsamplesOpt()
    if (!kw("by")) expectKw("within")
    val pop = name()
    val gen = modeledByOpt()
    val modelnos = usingModelsOpt()
    Regress(target, givens, nsamp, pop, gen, modelnos)
  }

  // -------------------------------------------------------------- queries

  private def selectQuant(): SelQuant =
    if (kw("distinct")) SelQuantDistinct
    else { kw("all"); SelQuantAll }

  private def select(): Select = {
    expectKw("select")
    val quant = selectQuant()
    val cols = selectColumns()
    val tabs =
      if (kw("from")) selectTables()
      else Seq.empty
    val cond = whereOpt()
    val grouping = groupByOpt()
    val order = orderByOpt()
    val lim = limitOpt()
    Select(quant, cols, tabs, cond, grouping, order, lim)
  }

  private def estimate(): Query = {
    expectKw("estimate")
    if (at("columns"))
      fail("deprecated `ESTIMATE COLUMNS': use `ESTIMATE ... FROM COLUMNS OF'")
    if (at("pairwise") && atAhead(1, "row"))
      fail("deprecated `ESTIMATE PAIRWISE ROW': use `ESTIMATE ... FROM PAIRWISE'")
    if (at("pairwise"))
      fail("deprecated `ESTIMATE PAIRWISE': use `ESTIMATE ... FROM PAIRWISE COLUMNS OF'")
    val quant = selectQuant()
    val cols = selectColumns()
    if (kw("by") || kw("within")) {
      val pop = name()
      val gen = modeledByOpt()
      val modelnos = usingModelsOpt()
      return EstBy(quant, cols, pop, gen, modelnos)
    }
    expectKw("from")
    val mode: (String, Option[Seq[ColList]], String) =
      if (kw("pairwise")) {
        if (kw("columns") || kw("variables")) {
          expectKw("of")
          val nm = name()
          val sub = if (kw("for")) Some(columnLists()) else None
          ("paircol", sub, nm)
        } else ("pairrow", None, name())
      } else if ((at("columns") || at("variables")) && atAhead(1, "of")) {
        i += 2
        ("col", None, name())
      } else ("row", None, name())
    val gen = modeledByOpt()
    val modelnos = usingModelsOpt()
    val cond = whereOpt()
    val grouping = groupByOpt()
    val order = orderByOpt()
    val lim = limitOpt()
    mode match {
      case ("row", _, nm) =>
        Estimate(quant, cols, nm, gen, modelnos, cond, grouping, order, lim)
      case ("pairrow", _, nm) =>
        EstPairRow(cols, nm, gen, modelnos, cond, order, lim)
      case ("col", _, nm) =>
        EstCols(cols, nm, gen, modelnos, cond, order, lim)
      case ("paircol", sub, nm) =>
        EstPairCols(cols, nm, sub, gen, modelnos, cond, order, lim)
      case _ => fail("unreachable")
    }
  }

  private def infer(): Query = {
    expectKw("infer")
    if (kw("explicit")) {
      val cols = Seq.newBuilder[SelCol]
      def inferExpCol(): SelCol =
        if (kw("predict")) {
          val col = name()
          val nm = if (kw("as")) Some(name()) else None
          val conf = if (kw("confidence")) Some(name()) else None
          val nsamp = nsamplesOpt()
          PredCol(col, nm, conf, nsamp)
        } else selectColumn()
      cols += inferExpCol()
      while (opSym(",")) cols += inferExpCol()
      expectKw("from")
      val pop = name()
      val gen = modeledByOpt()
      val modelnos = usingModelsOpt()
      InferExplicit(cols.result(), pop, gen, modelnos,
        whereOpt(), groupByOpt(), orderByOpt(), limitOpt())
    } else {
      val cols = Seq.newBuilder[InfCol]
      def inferAutoCol(): InfCol =
        if (opSym("*")) InfColAll
        else {
          val col = name()
          val nm = if (kw("as")) Some(name()) else None
          InfColOne(col, nm)
        }
      cols += inferAutoCol()
      while (opSym(",")) cols += inferAutoCol()
      val conf =
        if (at("with") && atAhead(1, "confidence")) { i += 2; primaryExp() }
        else ExpLit(LitInt(0))
      val nsamp = nsamplesOpt()
      expectKw("from")
      val pop = name()
      val gen = modeledByOpt()
      val modelnos = usingModelsOpt()
      InferAuto(cols.result(), Some(conf), nsamp, pop, gen, modelnos,
        whereOpt(), groupByOpt(), orderByOpt(), limitOpt())
    }
  }

  private def simulate(): Query = {
    expectKw("simulate")
    val cols = selectColumns()
    expectKw("from")
    if (at("models") && atAhead(1, "of")) {
      i += 2
      val pop = name()
      val gen = modeledByOpt()
      return SimulateModelsExp(cols, pop, gen)
    }
    val pop = name()
    val gen = modeledByOpt()
    val modelnos = usingModelsOpt()
    val constraints =
      if (kw("given")) {
        val cs = Seq.newBuilder[(String, Exp)]
        def constraint(): (String, Exp) = {
          val c = name(); expectOp("="); (c, expression())
        }
        cs += constraint()
        while (opSym(",")) cs += constraint()
        cs.result()
      } else Seq.empty
    // limit is mandatory for plain SIMULATE (reference errors without it,
    // src/parse.py:327-340)
    expectKw("limit")
    val lim = expression()
    val acc = if (kw("accuracy")) Some(integer().toInt) else None
    for (c <- cols) c match {
      case SelColSub(_, _) => ()
      case SelColExp(_: ExpCol, _) => ()
      case _ => fail("simulate only accepts population variables")
    }
    Simulate(cols, pop, gen, modelnos, constraints, Some(lim), acc)
  }

  private def modeledByOpt(): Option[String] =
    if (kw("modeled") || kw("modelled")) { expectKw("by"); Some(name()) }
    else None

  private def usingModelsOpt(): Option[Seq[Int]] =
    if (at("using") && (atAhead(1, "model") || atAhead(1, "models"))) {
      i += 2; Some(modelSet())
    } else None

  private def selectColumns(): Seq[SelCol] = {
    val cols = Seq.newBuilder[SelCol]
    cols += selectColumn()
    while (opSym(",")) cols += selectColumn()
    cols.result()
  }

  private def selectColumn(): SelCol = {
    if (opSym("*")) SelColAll(None)
    else {
      // t.* and t.(query)
      val qualified = attempt {
        val t = name()
        expectOp(".")
        if (opSym("*")) SelColAll(Some(t))
        else if (atOp("(") && { val s = ahead(1); s match {
            case n: TName if !n.quoted =>
              Seq("select", "estimate", "infer", "simulate").contains(n.folded)
            case _ => false } }) {
          expectOp("(")
          val q = query()
          expectOp(")")
          SelColSub(t, q)
        } else fail("not a qualified star/subquery")
      }
      qualified.getOrElse {
        val e = expression()
        val nm = if (kw("as")) Some(name()) else None
        SelColExp(e, nm)
      }
    }
  }

  private def selectTables(): Seq[SelTab] = {
    val ts = Seq.newBuilder[SelTab]
    def one(): SelTab =
      if (atOp("(")) {
        expectOp("(")
        val q = query()
        expectOp(")")
        SelTab(Left(q), if (kw("as")) Some(name()) else None)
      } else {
        val t = name()
        SelTab(Right(t), if (kw("as")) Some(name()) else None)
      }
    ts += one()
    while (opSym(",")) ts += one()
    ts.result()
  }

  private def whereOpt(): Option[Exp] =
    if (kw("where")) Some(expression()) else None

  private def groupByOpt(): Option[Grouping] =
    if (at("group") && atAhead(1, "by")) {
      i += 2
      val keys = Seq.newBuilder[Exp]
      keys += expression()
      while (opSym(",")) keys += expression()
      val cond = if (kw("having")) Some(expression()) else None
      Some(Grouping(keys.result(), cond))
    } else None

  private def orderByOpt(): Seq[Ord] =
    if (at("order") && atAhead(1, "by")) {
      i += 2
      val keys = Seq.newBuilder[Ord]
      def one(): Ord = {
        val e = expression()
        val asc = if (kw("desc")) false else { kw("asc"); true }
        Ord(e, asc)
      }
      keys += one()
      while (opSym(",")) keys += one()
      keys.result()
    } else Seq.empty

  private def limitOpt(): Option[Lim] =
    if (kw("limit")) {
      val e1 = expression()
      if (kw("offset")) Some(Lim(e1, Some(expression())))
      else if (opSym(",")) Some(Lim(expression(), Some(e1)))
      else Some(Lim(e1, None))
    } else None

  // ---------------------------------------------------------- expressions

  def expression(): Exp = booleanOr()

  private def booleanOr(): Exp = {
    var e = booleanAnd()
    while (at("or") && { i += 1; true }) e = ExpOp(Op.BoolOr, Seq(e, booleanAnd()))
    e
  }

  private def booleanAnd(): Exp = {
    var e = booleanNot()
    while (at("and") && { i += 1; true }) e = ExpOp(Op.BoolAnd, Seq(e, booleanNot()))
    e
  }

  private def booleanNot(): Exp =
    if (kw("not")) ExpOp(Op.BoolNot, Seq(booleanNot()))
    else equality()

  private def equality(): Exp = {
    var e = ordering()
    var done = false
    while (!done) {
      if (kw("is")) {
        if (kw("not")) e = ExpOp(Op.IsNot, Seq(e, ordering()))
        else e = ExpOp(Op.Is, Seq(e, ordering()))
      } else if (at("like") || at("glob") || at("regexp") || at("match")) {
        e = likeFamily(e, positive = true)
      } else if (at("not") && (atAhead(1, "like") || atAhead(1, "glob") ||
          atAhead(1, "regexp") || atAhead(1, "match"))) {
        i += 1
        e = likeFamily(e, positive = false)
      } else if (at("not") && atAhead(1, "between")) {
        i += 2
        val lo = ordering(); expectKw("and"); val hi = ordering()
        e = ExpOp(Op.NotBetween, Seq(e, lo, hi))
      } else if (kw("between")) {
        val lo = ordering(); expectKw("and"); val hi = ordering()
        e = ExpOp(Op.Between, Seq(e, lo, hi))
      } else if (at("not") && atAhead(1, "in")) {
        i += 2
        e = inTail(e, positive = false)
      } else if (kw("in")) {
        e = inTail(e, positive = true)
      } else if (kw("isnull")) e = ExpOp(Op.IsNull, Seq(e))
      else if (kw("notnull")) e = ExpOp(Op.NotNull, Seq(e))
      else if (opSym("=")) e = ExpOp(Op.Eq, Seq(e, ordering()))
      else if (opSym("<>")) e = ExpOp(Op.Neq, Seq(e, ordering()))
      else done = true
    }
    e
  }

  private def likeFamily(l: Exp, positive: Boolean): Exp = {
    val (base, esc): ((Op, Op), (Op, Op)) =
      if (kw("like")) ((Op.Like, Op.NotLike), (Op.LikeEsc, Op.NotLikeEsc))
      else if (kw("glob")) ((Op.Glob, Op.NotGlob), (Op.GlobEsc, Op.NotGlobEsc))
      else if (kw("regexp")) ((Op.Regexp, Op.NotRegexp), (Op.RegexpEsc, Op.NotRegexpEsc))
      else { expectKw("match"); ((Op.Match, Op.NotMatch), (Op.MatchEsc, Op.NotMatchEsc)) }
    val r = ordering()
    if (kw("escape")) {
      val e = ordering()
      ExpOp(if (positive) esc._1 else esc._2, Seq(l, r, e))
    } else ExpOp(if (positive) base._1 else base._2, Seq(l, r))
  }

  private def inTail(l: Exp, positive: Boolean): Exp = {
    expectOp("(")
    if (atQueryStart) {
      val q = query()
      expectOp(")")
      ExpInQuery(l, positive, q)
    } else if (opSym(")")) ExpInExp(l, positive, Seq.empty)
    else {
      val es = Seq.newBuilder[Exp]
      es += expression()
      while (opSym(",")) es += expression()
      expectOp(")")
      ExpInExp(l, positive, es.result())
    }
  }

  private def ordering(): Exp = {
    var e = bitwise()
    var done = false
    while (!done) {
      if (opSym("<")) e = ExpOp(Op.Lt, Seq(e, bitwise()))
      else if (opSym("<=")) e = ExpOp(Op.Leq, Seq(e, bitwise()))
      else if (opSym(">=")) e = ExpOp(Op.Geq, Seq(e, bitwise()))
      else if (opSym(">")) e = ExpOp(Op.Gt, Seq(e, bitwise()))
      else done = true
    }
    e
  }

  private def bitwise(): Exp = {
    var e = additive()
    var done = false
    while (!done) {
      if (opSym("&")) e = ExpOp(Op.BitAnd, Seq(e, additive()))
      else if (opSym("|")) e = ExpOp(Op.BitIor, Seq(e, additive()))
      else if (opSym("<<")) e = ExpOp(Op.LShift, Seq(e, additive()))
      else if (opSym(">>")) e = ExpOp(Op.RShift, Seq(e, additive()))
      else done = true
    }
    e
  }

  private def additive(): Exp = {
    var e = multiplicative()
    var done = false
    while (!done) {
      if (opSym("+")) e = ExpOp(Op.Add, Seq(e, multiplicative()))
      else if (opSym("-")) e = ExpOp(Op.Sub, Seq(e, multiplicative()))
      else done = true
    }
    e
  }

  private def multiplicative(): Exp = {
    var e = concatenative()
    var done = false
    while (!done) {
      if (opSym("*")) e = ExpOp(Op.Mul, Seq(e, concatenative()))
      else if (opSym("/")) e = ExpOp(Op.Div, Seq(e, concatenative()))
      else if (opSym("%")) e = ExpOp(Op.Rem, Seq(e, concatenative()))
      else done = true
    }
    e
  }

  private def concatenative(): Exp = {
    var e = collating()
    while (opSym("||")) e = ExpOp(Op.Concat, Seq(e, collating()))
    e
  }

  private def collating(): Exp = {
    var e = unary()
    while (kw("collate")) {
      val c = cur match {
        case t: TName => i += 1; t.value
        case TString(v, _) => i += 1; v
        case _ => fail("Expected collation name")
      }
      e = ExpCollate(e, c)
    }
    e
  }

  private def unary(): Exp =
    if (opSym("~")) ExpOp(Op.BitNot, Seq(unary()))
    else if (opSym("-")) ExpOp(Op.Negate, Seq(unary()))
    else if (opSym("+")) ExpOp(Op.PlusId, Seq(unary()))
    else bqlfn()

  // ------------------------------------------------------- BQL estimators

  private def bqlfn(): Exp = {
    if (at("predictive") && atAhead(1, "probability")) { i += 2; predProb() }
    else if (at("predictive") && atAhead(1, "relevance")) { i += 2; predRel() }
    else if (at("probability") && atAhead(1, "density")) { i += 2; probDensity() }
    else if (at("probability") && atAhead(1, "of")) {
      i += 2; expectOp("(")
      val e = expression()
      expectOp(")")
      ExpBQLProbEst(e)
    }
    else if (at("similarity"))
      attempt { i += 1; similarity() }.getOrElse(primaryExp())
    else if (at("dependence") && atAhead(1, "probability")) {
      i += 2
      val (c0, c1) = ofWith()
      ExpBQLDepProb(c0, c1)
    }
    else if (at("mutual") && atAhead(1, "information")) { i += 2; mutInf() }
    else if (at("correlation")) {
      i += 1
      if (kw("pvalue")) { val (c0, c1) = ofWith(); ExpBQLCorrelPval(c0, c1) }
      else { val (c0, c1) = ofWith(); ExpBQLCorrel(c0, c1) }
    }
    else if (at("predict"))
      attempt {
        i += 1
        val col = name()
        expectKw("with"); expectKw("confidence")
        val conf = primaryExp()
        ExpBQLPredict(col, conf, nsamplesOpt())
      }.getOrElse(primaryExp())
    else primaryExp()
  }

  private def predProb(): Exp = {
    expectKw("of")
    val targets = columnListsMaybeParen()
    val constraints =
      if (kw("given")) { expectOp("("); val cs = columnLists(); expectOp(")"); cs }
      else Seq.empty
    ExpBQLPredProb(targets, constraints)
  }

  /** After `PREDICTIVE PROBABILITY OF`: either one bare column_list, or a
    * parenthesized list of them (reference grammar distinguishes
    * predprob_row vs jpredprob_row, src/grammar.y:589-601). A leading
    * "(" could be a subquery column_list or the parenthesized list —
    * resolved by what follows. */
  private def columnListsMaybeParen(): Seq[ColList] = {
    if (atOp("(")) {
      if ({ val s = ahead(1); s match {
          case n: TName if !n.quoted =>
            Seq("select", "estimate", "infer", "simulate").contains(n.folded)
          case _ => false } })
        Seq(columnList())  // (query) subquery list
      else { expectOp("("); val cs = columnLists(); expectOp(")"); cs }
    } else Seq(columnList())
  }

  private def columnLists(): Seq[ColList] = {
    val cs = Seq.newBuilder[ColList]
    cs += columnList()
    while (opSym(",") || kw("and")) cs += columnList()
    cs.result()
  }

  private def columnList(): ColList =
    if (opSym("*")) ColListAll
    else if (atOp("(")) {
      expectOp("(")
      val q = query()
      expectOp(")")
      ColListSub(q)
    } else ColListLit(Seq(name()))

  private def probDensity(): Exp = {
    expectKw("of")
    if (kw("value")) {
      val e = primaryExp()
      val cs = givenConstraintsOpt()
      ExpBQLProbDensityFn(e, cs)
    } else if (atOp("(")) {
      expectOp("(")
      val targets = constraintsOpt()
      expectOp(")")
      ExpBQLProbDensity(targets, givenConstraintsOpt())
    } else {
      val col = name()
      expectOp("=")
      val e = unary()
      ExpBQLProbDensity(Seq((col, e)), givenConstraintsOpt())
    }
  }

  private def constraintsOpt(): Seq[(String, Exp)] =
    if (atOp(")")) Seq.empty
    else {
      val cs = Seq.newBuilder[(String, Exp)]
      def one(): (String, Exp) = { val c = name(); expectOp("="); (c, expression()) }
      cs += one()
      while (opSym(",")) cs += one()
      cs.result()
    }

  private def givenConstraintsOpt(): Seq[(String, Exp)] =
    if (kw("given")) {
      expectOp("(")
      val cs = constraintsOpt()
      expectOp(")")
      cs
    } else Seq.empty

  private def similarity(): Exp = {
    val ofCond =
      if (at("of") && atOpAhead(1, "(")) {
        i += 1; expectOp("(")
        val e = expression()
        expectOp(")")
        Some(e)
      } else None
    val toCond =
      if (kw("to")) {
        expectOp("(")
        val e = expression()
        expectOp(")")
        Some(e)
      } else None
    if (ofCond.isDefined && toCond.isEmpty) fail("SIMILARITY OF requires TO")
    ExpBQLSim(ofCond, toCond, wrt())
  }

  private def wrt(): ColList = {
    expectKw("in"); expectKw("the"); expectKw("context"); expectKw("of")
    columnList()
  }

  private def predRel(): Exp = {
    val ofCond =
      if (at("of") && atOpAhead(1, "(")) {
        i += 1; expectOp("(")
        val e = expression()
        expectOp(")")
        Some(e)
      } else None
    expectKw("to")
    var toCond: Option[Exp] = None
    var hyp: Seq[Seq[(String, Exp)]] = Seq.empty
    if (kw("existing")) {
      expectKw("rows")
      expectOp("(")
      toCond = Some(expression())
      expectOp(")")
      if (kw("and")) { hyp = hypotheticalRows() }
    } else hyp = hypotheticalRows()
    ExpBQLPredRel(ofCond, toCond, hyp, wrt())
  }

  private def hypotheticalRows(): Seq[Seq[(String, Exp)]] = {
    expectKw("hypothetical"); expectKw("rows"); expectKw("with"); expectKw("values")
    expectOp("(")
    val rows = Seq.newBuilder[Seq[(String, Exp)]]
    def row(): Seq[(String, Exp)] = {
      expectOp("(")
      val cs = constraintsOpt()
      expectOp(")")
      cs
    }
    rows += row()
    while (opSym(",")) rows += row()
    expectOp(")")
    rows.result()
  }

  private def mutInf(): Exp = {
    val (cols0, cols1): (Seq[String], Seq[String]) =
      if (kw("of")) {
        val c0 = miColumns()
        expectKw("with")
        (c0, miColumns())
      } else if (kw("with")) (Seq.empty, miColumns())
      else (Seq.empty, Seq.empty)
    val constraints =
      if (kw("given")) {
        expectOp("(")
        val cs = Seq.newBuilder[MiConstraint]
        def one(): MiConstraint = {
          val c = name()
          if (opSym("=")) MiEquality(c, expression()) else MiMarginal(c)
        }
        cs += one()
        while (opSym(",")) cs += one()
        expectOp(")")
        cs.result()
      } else Seq.empty
    ExpBQLMutInf(cols0, cols1, constraints, nsamplesOpt())
  }

  private def miColumns(): Seq[String] =
    if (opSym("(")) {
      val cs = Seq.newBuilder[String]
      cs += name()
      while (opSym(",")) cs += name()
      expectOp(")")
      cs.result()
    } else Seq(name())

  private def ofWith(): (Option[String], Option[String]) =
    if (kw("of")) {
      val c0 = name()
      expectKw("with")
      (Some(c0), Some(name()))
    } else if (kw("with")) (None, Some(name()))
    else (None, None)

  private def nsamplesOpt(): Option[Exp] =
    if (at("using") && !atAhead(1, "model") && !atAhead(1, "models")) {
      i += 1
      val n = primaryExp()
      expectKw("samples")
      Some(n)
    } else None

  // -------------------------------------------------------------- primary

  private def primaryExp(): Exp = {
    cur match {
      case TInt(v, _) => i += 1; ExpLit(LitInt(v))
      case TFloat(v, _) => i += 1; ExpLit(LitFloat(v))
      case TString(v, _) => i += 1; ExpLit(LitString(v))
      case TNumpar(n, _) => i += 1; ExpNumpar(n)
      case TNampar(n, nm, _) => i += 1; ExpNampar(n, nm)
      case TOp("(", _) =>
        i += 1
        if (atQueryStart) {
          val q = query()
          expectOp(")")
          ExpSub(q)
        } else {
          val e = expression()
          expectOp(")")
          e
        }
      case t: TName if !t.quoted && t.folded == "null" => i += 1; ExpLit(LitNull)
      case t: TName if !t.quoted && t.folded == "cast" && atOpAhead(1, "(") =>
        i += 1; expectOp("(")
        val e = expression()
        expectKw("as")
        val tp = typeSpec()
        expectOp(")")
        ExpCast(e, tp)
      case t: TName if !t.quoted && t.folded == "exists" && atOpAhead(1, "(") =>
        i += 1; expectOp("(")
        val q = query()
        expectOp(")")
        ExpExists(q)
      case t: TName if !t.quoted && t.folded == "case" =>
        i += 1
        val key = if (at("when") || at("else") || at("end")) None else Some(expression())
        val whens = Seq.newBuilder[(Exp, Exp)]
        while (kw("when")) {
          val w = expression()
          expectKw("then")
          whens += ((w, expression()))
        }
        val otherwise = if (kw("else")) Some(expression()) else None
        expectKw("end")
        ExpCase(key, whens.result(), otherwise)
      case t: TName =>
        // function application / tabcol / bare column
        if (atOpAhead(1, "(") && !t.quoted) {
          i += 2
          if (opSym("*")) { expectOp(")"); ExpAppStar(t.value) }
          else {
            val distinct = kw("distinct")
            if (opSym(")")) ExpApp(distinct, t.value, Seq.empty)
            else {
              val es = Seq.newBuilder[Exp]
              es += expression()
              while (opSym(",")) es += expression()
              expectOp(")")
              ExpApp(distinct, t.value, es.result())
            }
          }
        } else {
          val n1 = name()
          if (atOp(".") && !atOpAhead(1, "*") && { val a = ahead(1)
              a.isInstanceOf[TName] || atOpAhead(1, "(") }) {
            // tabcol (t.* and t.(query) are handled at select-column level)
            expectOp(".")
            ExpCol(Some(n1), name())
          } else ExpCol(None, n1)
        }
      case _ => fail("Expected an expression")
    }
  }

  private def typeSpec(): TypeSpec = {
    val names = Seq.newBuilder[String]
    names += name()
    while (cur.isInstanceOf[TName] && !atOp("(")) names += name()
    val args = Seq.newBuilder[Long]
    if (opSym("(")) {
      def arg(): Long =
        if (opSym("+")) integer()
        else if (opSym("-")) -integer()
        else integer()
      args += arg()
      if (opSym(",")) args += arg()
      expectOp(")")
    }
    TypeSpec(names.result(), args.result())
  }
}
