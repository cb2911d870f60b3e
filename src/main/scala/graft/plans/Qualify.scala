package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The host engine's QUALIFY clause for Spark SQL.
  *
  * The reference's host (DuckDB) filters window-function results with
  * QUALIFY; Spark has no such clause, so host-engine queries using it do not
  * port verbatim. This folds QUALIFY at parse time into the equivalent
  * window-subquery shape Catalyst already optimizes:
  *
  * {{{
  * SELECT <list> FROM <rel> ... QUALIFY <pred> [ORDER BY ... LIMIT ...]
  *   →
  * SELECT * EXCEPT (__graft_qualify) FROM (
  *   SELECT <list>, (<pred>) AS __graft_qualify FROM <rel> ...
  * ) WHERE __graft_qualify [ORDER BY ... LIMIT ...]
  * }}}
  *
  * The rewrite is text-level but token-aware: single/double/backtick quotes,
  * `--` and block comments, and parenthesis depth are respected, and
  * subqueries / CTE bodies are rewritten recursively, so QUALIFY works at any
  * nesting level. The plan after rewrite is exactly the hand-written
  * window-subquery plan — one Window + Filter, no extra shuffle; the marker
  * column is pruned by the outer projection before anything materializes.
  *
  * Two installation paths:
  *  - session-wide via GraftExtensions (injectParser): every `spark.sql`
  *    statement may use QUALIFY — the zero-code deployment contract;
  *  - per-call via [[Qualify.sql]] for sessions built without the extension.
  *
  * Unsupported (throws [[QualifyRewriteException]]): QUALIFY on a
  * SELECT DISTINCT block (the predicate column would change DISTINCT's
  * grouping; wrap the DISTINCT in a subquery instead). When installed as a
  * parser, a failed rewrite falls back to the stock parser so sessions never
  * lose statements that merely *mention* the word (e.g. a column named
  * `qualify`).
  */
object Qualify {

  final class QualifyRewriteException(msg: String) extends IllegalArgumentException(msg)

  private val Marker = "__graft_qualify"

  /** A host-dialect SQL macro: untyped, lazily bound — call sites inline the
    * body with arguments substituted textually, exactly the host engine's
    * macro semantics (the body never parses until a call parses).
    */
  final case class SqlMacro(name: String, params: Seq[String], body: String)

  // per-session macro registries; weak keys so dropped sessions free theirs
  private val macroRegistries =
    new java.util.WeakHashMap[SparkSession, scala.collection.concurrent.TrieMap[String, SqlMacro]]()

  private def registryOf(spark: SparkSession) = macroRegistries.synchronized {
    var r = macroRegistries.get(spark)
    if (r == null) { r = scala.collection.concurrent.TrieMap.empty; macroRegistries.put(spark, r) }
    r
  }

  /** Programmatic path: run a host-dialect statement on any session.
    * `CREATE [OR REPLACE] MACRO` statements register the macro and return a
    * single-row acknowledgement; other statements expand known macro calls
    * and then apply the dialect folds.
    */
  def sql(spark: SparkSession, text: String): DataFrame = {
    ensureVocabulary(spark)
    parseInstallLoad(text) match {
      case Some((verb, ext)) =>
        applyInstallLoad(spark, verb, ext)
        return spark.sql("SELECT true AS ok")
      case None =>
    }
    parseSetTiles(text) match {
      case Some(path) =>
        applySetTiles(spark, path)
        return spark.sql("SELECT true AS ok")
      case None =>
    }
    parseCreateMacro(text) match {
      case Some(m) =>
        registryOf(spark).put(m.name.toLowerCase, m)
        spark.sql("SELECT true AS ok")
      case None =>
        parseCopy(text) match {
          case Some(spec) =>
            // expand macros + dialect on the export body here, so COPY gets
            // the full shim treatment on sessions without the injected parser
            val inner = dialect(expandMacros(spec.innerSql, registryOf(spark)))
            val n = CopyToFile.run(spark, spec.copy(innerSql = inner))
            spark.sql(s"SELECT CAST($n AS BIGINT) AS Count")
          case None =>
            spark.sql(dialect(expandMacros(text, registryOf(spark))))
        }
    }
  }

  // host function vocabulary registered once per session on the
  // programmatic path (GraftExtensions sessions get it injected) — the
  // host autoloads its core extensions (json among them), so statements
  // arriving here may assume the names exist
  private val vocabDone = new java.util.WeakHashMap[SparkSession, java.lang.Boolean]()

  private def ensureVocabulary(spark: SparkSession): Unit = vocabDone.synchronized {
    if (vocabDone.get(spark) == null) {
      graft.functions.DuckCompat.register(spark)
      graft.functions.JsonCompat.register(spark)
      graft.functions.ReadBlob.register(spark)
      vocabDone.put(spark, java.lang.Boolean.TRUE)
    }
  }

  /** Macros registered for `spark` via [[sql]] or the injected parser. */
  def macrosOf(spark: SparkSession): collection.Map[String, SqlMacro] = registryOf(spark)

  /** Register a macro for `spark` (the injected parser's DDL path). */
  def registerMacro(spark: SparkSession, m: SqlMacro): Unit =
    registryOf(spark).put(m.name.toLowerCase, m)

  /** Drop a registered macro (un-shadows a built-in of the same name). */
  def unregisterMacro(spark: SparkSession, name: String): Unit =
    registryOf(spark).remove(name.toLowerCase)

  /** True if everything before `pos` is whitespace or comments — i.e. the
    * token at `pos` is the statement's first. Lets the statement-form
    * parsers (INSTALL/LOAD, SET, COPY, CREATE MACRO) accept script chunks
    * that carry leading comment banners.
    */
  private def leadingIsTrivia(text: String, pos: Int): Boolean = {
    var i = 0
    while (i < pos) {
      val c = text.charAt(i)
      if (c.isWhitespace) i += 1
      else if (c == '-' && i + 1 < text.length && text.charAt(i + 1) == '-') {
        while (i < pos && text.charAt(i) != '\n') i += 1
      } else if (c == '/' && i + 1 < text.length && text.charAt(i + 1) == '*') {
        i += 2
        while (i + 1 < text.length && !(text.charAt(i) == '*' && text.charAt(i + 1) == '/')) i += 1
        i = math.min(text.length, i + 2)
      } else return false
    }
    true
  }

  /** True if everything from `from` on is whitespace, comments, or `;`. */
  private def tailIsTrivia(text: String, from: Int): Boolean = {
    var i = from
    val n = text.length
    while (i < n) {
      val c = text.charAt(i)
      if (c.isWhitespace || c == ';') i += 1
      else if (c == '-' && i + 1 < n && text.charAt(i + 1) == '-') {
        while (i < n && text.charAt(i) != '\n') i += 1
      } else if (c == '/' && i + 1 < n && text.charAt(i + 1) == '*') {
        i += 2
        while (i + 1 < n && !(text.charAt(i) == '*' && text.charAt(i + 1) == '/')) i += 1
        i = math.min(n, i + 2)
      } else return false
    }
    true
  }

  /** Drop `--` and block comments outside strings; used to clean a
    * statement tail before reading a value from it.
    */
  private def stripComments(s: String): String = {
    val sb = new StringBuilder(s.length)
    val n = s.length
    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      if (c == '\'') {
        val st = i
        i += 1
        var done = false
        while (i < n && !done) {
          if (s.charAt(i) == '\'') {
            if (i + 1 < n && s.charAt(i + 1) == '\'') i += 2 else { done = true; i += 1 }
          } else i += 1
        }
        sb.append(s.substring(st, i))
      } else if (c == '-' && i + 1 < n && s.charAt(i + 1) == '-') {
        while (i < n && s.charAt(i) != '\n') i += 1
      } else if (c == '/' && i + 1 < n && s.charAt(i + 1) == '*') {
        i += 2
        while (i + 1 < n && !(s.charAt(i) == '*' && s.charAt(i + 1) == '/')) i += 1
        i = math.min(n, i + 2)
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** Recognize the host's extension-management statements — `INSTALL x` /
    * `LOAD x` (examples/monaco_pure_sql.sql:11-13). Exactly two words, so
    * Spark's own `LOAD DATA INPATH ...` never matches. Returns
    * (verb, extension-name).
    */
  def parseInstallLoad(text: String): Option[(String, String)] = {
    val (words, _) = scan(text)
    val top = words.filter(_._4 == 0)
    if (top.length == 2 && (top.head._1 == "INSTALL" || top.head._1 == "LOAD") &&
      leadingIsTrivia(text, top.head._2) &&
      tailIsTrivia(text, top(1)._3))
      Some((top.head._1, text.substring(top(1)._2, top(1)._3).toLowerCase))
    else None
  }

  /** The host's LOAD semantics, mapped: everything ships in this one jar,
    * so LOAD registers the named surface into the session instead of
    * loading a shared library — `spatial` → the st_* shims, `json` → the
    * json_object/json_array/json pack, the routing extension itself → the
    * bootstrap travel_time* surface. Unknown names (httpfs — Hadoop speaks
    * http/s3 natively) acknowledge as no-ops; INSTALL is always a no-op.
    */
  def applyInstallLoad(spark: SparkSession, verb: String, ext: String): Unit =
    if (verb == "LOAD") ext match {
      case "spatial" => graft.routing.StFunctions.register(spark)
      case "json" => graft.functions.JsonCompat.register(spark)
      case "valhalla_routing" | "duckdb_routing" | "travel_time" | "graft" =>
        graft.routing.RoutingContext.install(spark)
        // the host extension also registers its catalog introspection at
        // load (test/sql/travel_time.test:16-48 queries duckdb_functions()
        // right after `require travel_time`)
        graft.functions.Introspection.register(spark)
      case _ => ()
    }

  /** Recognize `SET valhalla_tiles = <path>` (or the examples' alternate
    * spelling `valhalla_config`) — the host's setting whose write callback
    * LOADS the tiles (src/config_setting.cpp:23-70). Returns the path
    * (quotes stripped) so the caller can run the same callback.
    */
  def parseSetTiles(text: String): Option[String] = {
    val (words, _) = scan(text)
    val top = words.filter(_._4 == 0)
    if (top.length < 2 || top.head._1 != "SET" ||
      !leadingIsTrivia(text, top.head._2)) return None
    if (top(1)._1 != "VALHALLA_TILES" && top(1)._1 != "VALHALLA_CONFIG") return None
    val afterName = text.substring(top(1)._3).dropWhile(_.isWhitespace)
    if (!afterName.startsWith("=")) return None
    // trailing comments are trivia, not part of the path
    val raw = stripComments(afterName.substring(1)).trim.stripSuffix(";").trim
    val value =
      if (raw.length >= 2 && raw.startsWith("'") && raw.endsWith("'"))
        raw.substring(1, raw.length - 1).replace("''", "'")
      else raw
    if (value.isEmpty) None else Some(value)
  }

  /** The host's valhalla_tiles write callback: record the path in the
    * session conf and load the graph store eagerly
    * (src/config_setting.cpp:23-70 loads on SET, not on first query).
    */
  def applySetTiles(spark: SparkSession, path: String): Unit = {
    spark.conf.set(graft.routing.RoutingContext.TilesConf, path)
    graft.routing.RoutingContext.ensureFromConf(spark)
  }

  /** Recognize the host's `COPY (<query>) TO '<file>' [(options)]` export
    * statement — also the `COPY name TO ...` table form (inner query
    * becomes `SELECT * FROM name`). Options parse loosely as
    * key [value] pairs (`FORMAT CSV, HEADER, DELIMITER '|'`). Returns the
    * spec for [[CopyToFile]]; anything not matching falls through to the
    * stock parser.
    */
  def parseCopy(text: String): Option[CopyToFile.Spec] = {
    val (words, groups) = scan(text)
    val top = words.filter(_._4 == 0)
    if (top.isEmpty || top.head._1 != "COPY" ||
      !leadingIsTrivia(text, top.head._2)) return None
    val copyEnd = top.head._3
    // source: a parenthesized query, or a bare table identifier
    val afterCopy = text.substring(copyEnd).dropWhile(_.isWhitespace)
    val (inner, srcEnd) =
      if (afterCopy.startsWith("(")) {
        val open = text.indexOf('(', copyEnd)
        val close = matchParen(text, open).getOrElse(return None)
        (text.substring(open + 1, close).trim, close + 1)
      } else {
        val name = top.lift(1).getOrElse(return None)
        if (!text.substring(copyEnd, name._2).isBlank) return None
        (s"SELECT * FROM ${text.substring(name._2, name._3)}", name._3)
      }
    val toWord = top.find(w => w._1 == "TO" && w._2 >= srcEnd).getOrElse(return None)
    if (!text.substring(srcEnd, toWord._2).isBlank) return None
    // the target is a string literal right after TO
    val afterTo = text.substring(toWord._3).dropWhile(_.isWhitespace)
    if (!afterTo.startsWith("'")) return None
    val quoteStart = toWord._3 + (text.substring(toWord._3).length - afterTo.length)
    var i = quoteStart + 1
    val sb = new StringBuilder
    var closed = false
    while (i < text.length && !closed) {
      val c = text.charAt(i)
      if (c == '\'') {
        if (i + 1 < text.length && text.charAt(i + 1) == '\'') { sb.append('\''); i += 2 }
        else { closed = true; i += 1 }
      } else { sb.append(c); i += 1 }
    }
    if (!closed || sb.isEmpty) return None
    // optional (options) or WITH (options); then only `;`/whitespace may follow
    val rest = text.substring(i)
    val restTrim = rest.dropWhile(_.isWhitespace)
    val restOffset = i + (rest.length - restTrim.length)
    var options = Map.empty[String, String]
    var tail = restTrim
    val withStripped =
      if (restTrim.toUpperCase.startsWith("WITH")) restTrim.substring(4).dropWhile(_.isWhitespace)
      else restTrim
    if (withStripped.startsWith("(")) {
      val open = restOffset + (restTrim.length - withStripped.length)
      val close = matchParen(text, open).getOrElse(return None)
      options = splitTopLevel(text.substring(open + 1, close)).flatMap { part =>
        val toks = part.trim.split("\\s+", 2)
        if (toks.isEmpty || toks(0).isEmpty) None
        else {
          // keys case-fold; values keep their spelling (a DELIMITER is
          // literal text) — boolean-ish values fold at the use site
          val key = toks(0).toLowerCase
          val value = if (toks.length > 1)
            toks(1).trim.stripPrefix("'").stripSuffix("'") else "true"
          Some(key -> value)
        }
      }.toMap
      tail = text.substring(close + 1)
    }
    if (!tailIsTrivia(tail, 0)) return None
    Some(CopyToFile.Spec(inner, sb.toString, options))
  }

  /** Recognize `CREATE [OR REPLACE] [TEMP|TEMPORARY] MACRO name(p1, p2) AS
    * [TABLE] body` — the host dialect's scalar and table macro DDL
    * (examples/geometry_macro.sql:30-36). Parameter defaults are not
    * recognized and fall through to the stock parser.
    */
  def parseCreateMacro(text: String): Option[SqlMacro] = {
    val (words, _) = scan(text)
    val top = words.filter(_._4 == 0)
    if (top.isEmpty || top.head._1 != "CREATE" || !leadingIsTrivia(text, top.head._2))
      return None
    val kw = top.map(_._1)
    val mIdx = kw.indexOf("MACRO")
    if (mIdx < 0) return None
    // everything between CREATE and MACRO must be the optional modifiers
    if (!kw.slice(1, mIdx).forall(Set("OR", "REPLACE", "TEMP", "TEMPORARY"))) return None
    if (mIdx + 1 >= top.length) return None
    val name = top(mIdx + 1)
    val open = text.indexOf('(', name._3)
    if (open < 0 || !text.substring(name._3, open).isBlank) return None
    val close = matchParen(text, open).getOrElse(return None)
    val params = splitTopLevel(text.substring(open + 1, close)).map(_.trim)
    if (params.exists(p => p.isEmpty || !p.forall(c => c.isLetterOrDigit || c == '_')))
      return None
    val asWord = words.find(w => w._1 == "AS" && w._2 > close).getOrElse(return None)
    if (!text.substring(close + 1, asWord._2).isBlank) return None
    // `AS TABLE body` is the host's table macro — same textual-inline
    // expansion (the parenthesized body is a FROM-position subquery)
    val afterAs = words.find(_._2 >= asWord._3)
    val bodyStart = afterAs match {
      case Some(w) if w._1 == "TABLE" && text.substring(asWord._3, w._2).isBlank => w._3
      case _ => asWord._3
    }
    val body = text.substring(bodyStart).trim.stripSuffix(";").trim
    if (body.isEmpty) return None
    Some(SqlMacro(name._1.toLowerCase, params.map(_.toLowerCase), body))
  }

  /** Inline every registered macro call in `text`: arguments substitute
    * textually for parameter names in the body (each wrapped in parens to
    * preserve precedence), and the inlined body is itself wrapped — the host
    * engine's expansion semantics. Macros may call macros; expansion loops
    * to a bounded fixed point.
    */
  def expandMacros(text: String, macros: collection.Map[String, SqlMacro]): String = {
    if (macros.isEmpty) return text
    var out = text
    var guard = 0
    var changed = true
    // each pass expands EVERY call site in one scan (rightmost first, so
    // earlier positions stay valid); the guard bounds only macro-in-macro
    // NESTING depth, never the number of call sites in a statement
    while (changed && guard < 16) {
      changed = false
      guard += 1
      val (words, _) = scan(out)
      val sites = words.filter { case (w, _, en, _) =>
        macros.contains(w.toLowerCase) &&
          out.substring(en).dropWhile(_.isWhitespace).headOption.contains('(')
      }
      sites.reverseIterator.foreach { case (w, st, en, _) =>
        val m = macros(w.toLowerCase)
        val open = out.indexOf('(', en)
        matchParen(out, open).foreach { close =>
          val args = splitTopLevel(out.substring(open + 1, close))
          if (args.length == m.params.length) {
            val sub = m.params.zip(args.map(a => s"(${a.trim})")).toMap
            val (bw, _) = scan(m.body)
            val sb = new StringBuilder
            var pos = 0
            bw.foreach { case (bword, bst, ben, _) =>
              sub.get(bword.toLowerCase).foreach { arg =>
                sb.append(m.body.substring(pos, bst)).append(arg)
                pos = ben
              }
            }
            sb.append(m.body.substring(pos))
            val bodyTxt = sb.toString.trim
            val wrapped =
              if (bodyTxt.startsWith("(") && matchParen(bodyTxt, 0).contains(bodyTxt.length - 1))
                bodyTxt
              else s"($bodyTxt)"
            out = out.substring(0, st) + wrapped + out.substring(close + 1)
            changed = true
          }
        }
      }
    }
    out
  }

  /** Split a multi-statement host script into statements: `;` at paren
    * depth 0 (strings/comments honored), CLI dot-command lines (`.timer on`)
    * dropped, comment-only chunks dropped — so a reference `.sql` file runs
    * top to bottom through [[sql]].
    */
  def splitStatements(script: String): Seq[String] = {
    val body = script.linesIterator
      .filterNot(_.trim.matches("^\\.[a-zA-Z]\\S*( .*)?"))
      .mkString("\n")
    val parts = Seq.newBuilder[String]
    val n = body.length
    var i = 0; var depth = 0; var st = 0
    while (i < n) {
      val c = body.charAt(i)
      if (c == '\'') {
        i += 1
        var done = false
        while (i < n && !done) {
          if (body.charAt(i) == '\'') {
            if (i + 1 < n && body.charAt(i + 1) == '\'') i += 2 else { done = true; i += 1 }
          } else i += 1
        }
      } else if (c == '"' || c == '`') {
        i += 1; while (i < n && body.charAt(i) != c) i += 1; i += 1
      } else if (c == '-' && i + 1 < n && body.charAt(i + 1) == '-') {
        while (i < n && body.charAt(i) != '\n') i += 1
      } else if (c == '/' && i + 1 < n && body.charAt(i + 1) == '*') {
        i += 2
        while (i + 1 < n && !(body.charAt(i) == '*' && body.charAt(i + 1) == '/')) i += 1
        i = math.min(n, i + 2)
      } else if (c == '(') { depth += 1; i += 1 }
      else if (c == ')') { depth -= 1; i += 1 }
      else if (c == ';' && depth == 0) { parts += body.substring(st, i); st = i + 1; i += 1 }
      else i += 1
    }
    parts += body.substring(st)
    // keep only chunks with actual tokens (scan skips comments)
    parts.result().map(_.trim).filter(s => s.nonEmpty && scan(s)._1.nonEmpty)
  }

  /** Split `s` on commas at paren depth 0, honoring strings/comments. */
  private def splitTopLevel(s: String): Seq[String] = {
    if (s.trim.isEmpty) return Seq.empty
    val parts = Seq.newBuilder[String]
    val n = s.length
    var i = 0; var depth = 0; var st = 0
    while (i < n) {
      val c = s.charAt(i)
      if (c == '\'') {
        i += 1
        var done = false
        while (i < n && !done) {
          if (s.charAt(i) == '\'') {
            if (i + 1 < n && s.charAt(i + 1) == '\'') i += 2 else { done = true; i += 1 }
          } else i += 1
        }
      } else if (c == '"' || c == '`') {
        i += 1; while (i < n && s.charAt(i) != c) i += 1; i += 1
      } else if (c == '(') { depth += 1; i += 1 }
      else if (c == ')') { depth -= 1; i += 1 }
      else if (c == ',' && depth == 0) { parts += s.substring(st, i); st = i + 1; i += 1 }
      else i += 1
    }
    parts += s.substring(st)
    parts.result()
  }

  /** All host-dialect shims: QUALIFY and DISTINCT ON folding, the
    * `* EXCLUDE (...)` star modifier (Spark spells that one `* EXCEPT`),
    * the `struct_pack(k := v)` struct constructor (Spark spells it
    * `named_struct('k', v)`), the `USING SAMPLE` clause (Spark spells
    * it `TABLESAMPLE`), and the `::JSON` cast (stripped — Spark has no
    * JSON type; functions.JsonCompat detects JSON-ness structurally).
    */
  def dialect(text: String): String =
    rewriteUsingSample(rewriteStructPack(rewriteExclude(rewriteJsonCast(
      rewriteBracketLists(rewrite(text))))))

  /** `[a, b, c]` list literals → `array(a, b, c)` — the host dialect's list
    * constructor (test/sql/monaco_routing.test:113-118). A `[` is a
    * SUBSCRIPT only when it is ADJACENT (no whitespace) to a value ending —
    * an identifier character, `)`, `]`, or a string/quoted-identifier
    * close — exactly how element access is written (`xs[1]`, `m['k']`,
    * `f(x)[2]`, `'abc'[1]`); everything else is a literal, so
    * `SELECT [1, 2]`, `THEN [..]` and `IN ([..])` all build lists even
    * though a keyword (identifier characters) precedes them across the
    * whitespace. `[1, 2][1]` builds then subscripts, the host's reading.
    */
  def rewriteBracketLists(sql: String): String = {
    if (!sql.contains('[')) return sql
    val sb = new StringBuilder(sql.length + 16)
    val kind = new java.util.ArrayDeque[Boolean]() // true = literal list
    val n = sql.length
    var i = 0
    var prev: Char = 0       // last significant char outside strings/comments
    var gapSincePrev = true  // whitespace/comment between prev and here?
    def valueEnd(c: Char): Boolean =
      c.isLetterOrDigit || c == '_' || c == ')' || c == ']' || c == '\'' || c == '"' || c == '`'
    while (i < n) {
      val c = sql.charAt(i)
      if (c == '\'') {
        val st = i
        i += 1
        var done = false
        while (i < n && !done) {
          if (sql.charAt(i) == '\'') {
            if (i + 1 < n && sql.charAt(i + 1) == '\'') i += 2 else { done = true; i += 1 }
          } else i += 1
        }
        sb.append(sql.substring(st, i)); prev = '\''; gapSincePrev = false
      } else if (c == '"' || c == '`') {
        val st = i
        i += 1; while (i < n && sql.charAt(i) != c) i += 1; i += 1
        sb.append(sql.substring(st, math.min(i, n))); prev = c; gapSincePrev = false
      } else if (c == '-' && i + 1 < n && sql.charAt(i + 1) == '-') {
        val st = i
        while (i < n && sql.charAt(i) != '\n') i += 1
        sb.append(sql.substring(st, i)); gapSincePrev = true
      } else if (c == '/' && i + 1 < n && sql.charAt(i + 1) == '*') {
        val st = i
        i += 2
        while (i + 1 < n && !(sql.charAt(i) == '*' && sql.charAt(i + 1) == '/')) i += 1
        i = math.min(n, i + 2)
        sb.append(sql.substring(st, i)); gapSincePrev = true
      } else if (c == '[') {
        val subscript = !gapSincePrev && valueEnd(prev)
        kind.push(!subscript)
        sb.append(if (subscript) "[" else "array(")
        prev = '('; gapSincePrev = false
        i += 1
      } else if (c == ']') {
        val literal = if (kind.isEmpty) false else kind.pop()
        sb.append(if (literal) ")" else "]")
        prev = ']'; gapSincePrev = false
        i += 1
      } else {
        sb.append(c)
        if (c.isWhitespace) gapSincePrev = true
        else { prev = c; gapSincePrev = false }
        i += 1
      }
    }
    sb.toString
  }

  /** `<operand>::JSON` → `json(<operand>)` — the host dialect's JSON cast
    * (examples/monaco_pure_sql.sql:108). Spark has no JSON type; `json(x)`
    * is functions.JsonCompat's raw-embedding marker, so a plain string
    * column or literal cast to JSON embeds RAW in `json_object`, exactly
    * the host semantics. The operand extent is found by walking back over
    * one postfix-primary chain (identifier / string literal / call or
    * paren group / subscript, joined by `.`), using pair maps from a
    * forward scan — never through strings or comments. Only the exact
    * token context rewrites (`::` then the word JSON).
    */
  def rewriteJsonCast(sql: String): String = {
    if (!sql.toLowerCase.contains("json")) return sql
    val (words, _) = scan(sql)
    val hits = words.filter { case (w, st, _, _) =>
      w == "JSON" && sql.substring(0, st).reverse.dropWhile(_.isWhitespace).startsWith("::")
    }
    if (hits.isEmpty) return sql
    val (pairs, stringSpans) = pairsAndStrings(sql)
    val stringByEnd = stringSpans.map(s => s._2 -> s._1).toMap
    def isIdent(c: Char) = c.isLetterOrDigit || c == '_'
    // rightmost-first so earlier positions stay valid
    var out = sql
    hits.reverseIterator.foreach { case (_, st, en, _) =>
      var i = st - 1
      while (i >= 0 && sql.charAt(i).isWhitespace) i -= 1
      i -= 2 // skip both colons (the filter verified they are there)
      while (i >= 0 && sql.charAt(i).isWhitespace) i -= 1
      val operandEnd = i + 1 // exclusive
      // walk back over one postfix chain
      var start = operandEnd
      var continue = start > 0
      while (continue) {
        continue = false
        val c = sql.charAt(start - 1)
        if (c == ')' || c == ']') {
          pairs.get(start - 1) match {
            case Some(open) => start = open
            case None => // unbalanced — leave as-is
          }
          // a call: consume the function-name identifier before '('
          while (start > 0 && isIdent(sql.charAt(start - 1))) start -= 1
        } else if (c == '\'') {
          stringByEnd.get(start - 1) match {
            case Some(s0) => start = s0
            case None =>
          }
        } else if (isIdent(c)) {
          while (start > 0 && isIdent(sql.charAt(start - 1))) start -= 1
        }
        // qualified / chained: a.b, f(x).g — keep walking
        if (start > 0 && sql.charAt(start - 1) == '.' && start - 1 > 0) {
          start -= 1
          continue = true
        }
      }
      if (start < operandEnd) {
        out = out.substring(0, start) + "json(" +
          out.substring(start, operandEnd) + ")" + out.substring(en)
      }
    }
    out
  }

  /** One forward scan producing (close→open pair map for `()` and `[]`,
    * string-literal spans as (start, endInclusive)). Comments and quoted
    * identifiers are skipped like [[scan]].
    */
  private def pairsAndStrings(s: String): (Map[Int, Int], Seq[(Int, Int)]) = {
    val pairs = Map.newBuilder[Int, Int]
    val strings = Seq.newBuilder[(Int, Int)]
    val stack = new java.util.ArrayDeque[Int]()
    val n = s.length
    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      if (c == '\'') {
        val st = i
        i += 1
        var done = false
        while (i < n && !done) {
          if (s.charAt(i) == '\'') {
            if (i + 1 < n && s.charAt(i + 1) == '\'') i += 2 else { done = true; i += 1 }
          } else i += 1
        }
        strings += ((st, i - 1))
      } else if (c == '"' || c == '`') {
        i += 1; while (i < n && s.charAt(i) != c) i += 1; i += 1
      } else if (c == '-' && i + 1 < n && s.charAt(i + 1) == '-') {
        while (i < n && s.charAt(i) != '\n') i += 1
      } else if (c == '/' && i + 1 < n && s.charAt(i + 1) == '*') {
        i += 2
        while (i + 1 < n && !(s.charAt(i) == '*' && s.charAt(i + 1) == '/')) i += 1
        i = math.min(n, i + 2)
      } else if (c == '(' || c == '[') { stack.push(i); i += 1 }
      else if (c == ')' || c == ']') {
        if (!stack.isEmpty) pairs += (i -> stack.pop())
        i += 1
      } else i += 1
    }
    (pairs.result(), strings.result())
  }

  /** `USING SAMPLE n%` / `USING SAMPLE n PERCENT` / `USING SAMPLE n ROWS`
    * → `TABLESAMPLE (n PERCENT|ROWS)` — the host dialect's sampling clause,
    * same syntactic position (after a table or subquery). The method form
    * `USING SAMPLE … (bernoulli, seed)` is left untouched (no Spark
    * equivalent); `JOIN … USING (cols)` never matches because the next
    * word must be SAMPLE.
    */
  def rewriteUsingSample(sql: String): String = {
    val lower = sql.toLowerCase
    if (!lower.contains("using") || !lower.contains("sample")) return sql
    val (words, _) = scan(sql)
    val sb = new StringBuilder
    var pos = 0
    words.sliding(2).foreach {
      case Seq(("USING", uSt, uEn, _), ("SAMPLE", sSt, sEn, _))
          if sql.substring(uEn, sSt).isBlank && uSt >= pos =>
        // number [% | PERCENT | ROWS]
        var i = sEn
        while (i < sql.length && sql.charAt(i).isWhitespace) i += 1
        val numSt = i
        while (i < sql.length && (sql.charAt(i).isDigit || sql.charAt(i) == '.')) i += 1
        val num = sql.substring(numSt, i)
        if (num.nonEmpty) {
          var j = i
          while (j < sql.length && sql.charAt(j).isWhitespace) j += 1
          val restUp = sql.substring(j).toUpperCase
          val (unit, unitLen) =
            if (j < sql.length && sql.charAt(j) == '%') ("PERCENT", 1)
            else if (restUp.startsWith("PERCENT")) ("PERCENT", "PERCENT".length)
            else if (restUp.startsWith("ROWS")) ("ROWS", "ROWS".length)
            else ("ROWS", 0) // bare count defaults to rows, as in the host
          val afterUnit = sql.substring(j + unitLen).dropWhile(_.isWhitespace)
          if (!afterUnit.headOption.contains('(')) { // skip the method form
            sb.append(sql.substring(pos, uSt))
            sb.append(s"TABLESAMPLE ($num $unit)")
            pos = j + unitLen
          }
        }
      case _ =>
    }
    if (pos == 0) return sql
    sb.append(sql.substring(pos))
    sb.toString
  }

  /** `struct_pack(a := x, b := y)` → `named_struct('a', x, 'b', y)` — the
    * host dialect's named-field struct constructor, used verbatim in every
    * reference example that re-wraps route results
    * (examples/geometry_macro.sql:31-35, test/sql/monaco_routing.test:135-139).
    * Only the exact token context rewrites (the word, then an open paren,
    * then `name :=` pairs at that group's own depth), so identifiers named
    * `struct_pack` elsewhere and `:=` inside nested calls are never touched;
    * nested struct_packs fold inside-out. Field-name case is preserved as
    * written, matching the host engine's key semantics.
    */
  def rewriteStructPack(sql: String): String = {
    if (!sql.toLowerCase.contains("struct_pack")) return sql
    val (words, _) = scan(sql)
    val hit = words.find { case (w, _, en, _) =>
      w == "STRUCT_PACK" && sql.substring(en).dropWhile(_.isWhitespace).headOption.contains('(')
    }.getOrElse(return sql)
    val open = sql.indexOf('(', hit._3)
    val close = matchParen(sql, open).getOrElse(return sql)
    // fold nested struct_packs first, then rewrite this group's own
    // `name :=` pairs (depth 0 relative to the folded inner text)
    val inner = rewriteStructPack(sql.substring(open + 1, close))
    val sb = new StringBuilder
    var pos = 0
    scan(inner)._1.filter(_._4 == 0).foreach { case (_, st, en, _) =>
      val after = inner.substring(en)
      val trimmed = after.dropWhile(_.isWhitespace)
      if (trimmed.startsWith(":=") && st >= pos) {
        sb.append(inner.substring(pos, st))
        sb.append(s"'${inner.substring(st, en)}',")
        pos = en + (after.length - trimmed.length) + 2
      }
    }
    sb.append(inner.substring(pos))
    rewriteStructPack(
      sql.substring(0, hit._2) + "named_struct(" + sb.toString + ")" +
        sql.substring(close + 1))
  }

  /** Index of the `)` matching the `(` at `open`, honoring the same string/
    * comment skipping as [[scan]]; None if unbalanced.
    */
  private def matchParen(s: String, open: Int): Option[Int] = {
    val n = s.length
    var i = open; var depth = 0
    while (i < n) {
      val c = s.charAt(i)
      if (c == '\'') {
        i += 1
        var done = false
        while (i < n && !done) {
          if (s.charAt(i) == '\'') {
            if (i + 1 < n && s.charAt(i + 1) == '\'') i += 2 else { done = true; i += 1 }
          } else i += 1
        }
      } else if (c == '"' || c == '`') {
        i += 1; while (i < n && s.charAt(i) != c) i += 1; i += 1
      } else if (c == '-' && i + 1 < n && s.charAt(i + 1) == '-') {
        while (i < n && s.charAt(i) != '\n') i += 1
      } else if (c == '/' && i + 1 < n && s.charAt(i + 1) == '*') {
        i += 2
        while (i + 1 < n && !(s.charAt(i) == '*' && s.charAt(i + 1) == '/')) i += 1
        i = math.min(n, i + 2)
      } else if (c == '(') { depth += 1; i += 1 }
      else if (c == ')') {
        depth -= 1
        if (depth == 0) return Some(i)
        i += 1
      } else i += 1
    }
    None
  }

  /** `* EXCLUDE (` → `* EXCEPT (` — rewritten only in that exact token
    * context (a star, then the word, then an open paren), so identifiers
    * named `exclude` elsewhere are never touched.
    */
  def rewriteExclude(sql: String): String = {
    if (!sql.toLowerCase.contains("exclude")) return sql
    val words = scan(sql)._1
    val hits = words.filter { case (w, st, en, _) =>
      w == "EXCLUDE" && {
        val before = sql.substring(0, st).reverse.dropWhile(_.isWhitespace)
        val after = sql.substring(en).dropWhile(_.isWhitespace)
        before.headOption.contains('*') && after.headOption.contains('(')
      }
    }
    if (hits.isEmpty) return sql
    val sb = new StringBuilder
    var pos = 0
    hits.foreach { case (_, st, en, _) =>
      sb.append(sql.substring(pos, st)).append("EXCEPT")
      pos = en
    }
    sb.append(sql.substring(pos))
    sb.toString
  }

  /** Rewrite every QUALIFY clause in `sql` (recursively, at any depth) into
    * the window-subquery form. Text without QUALIFY is returned unchanged.
    */
  def rewrite(sql: String): String = {
    val lower = sql.toLowerCase
    if (!lower.contains("qualify") && !lower.contains("distinct")) return sql
    val groups = scan(sql)._2
    val sb = new StringBuilder
    var pos = 0
    groups.foreach { case (open, close) =>
      sb.append(sql.substring(pos, open + 1))
      sb.append(rewrite(sql.substring(open + 1, close)))
      pos = close
    }
    sb.append(sql.substring(pos))
    // each pass folds the first remaining depth-0 QUALIFY or DISTINCT ON
    // (set-op compounds may carry one per operand); bounded to rule out any
    // pathological loop
    var out = sb.toString
    var prev = ""
    var guard = 0
    while ((out ne prev) && out != prev && guard < 32) {
      prev = out
      out = rewriteDistinctOnTop(rewriteTopLevel(out))
      guard += 1
    }
    out
  }

  /** Fold one depth-0 `SELECT DISTINCT ON (keys) list ... ORDER BY o` —
    * the host/Postgres dialect for "first row per key" — into the
    * row_number window form:
    *
    * {{{
    * SELECT * EXCEPT (__graft_rn) FROM (
    *   SELECT list, row_number() OVER (PARTITION BY keys ORDER BY o)
    *     AS __graft_rn FROM ...
    * ) WHERE __graft_rn = 1 ORDER BY o
    * }}}
    *
    * The statement's ORDER BY does double duty exactly as in the host
    * engine: it picks the surviving row per key AND orders the output — so
    * it must reference columns that survive the select list (the window
    * spec evaluates inside the subquery, the final sort outside). Without
    * an ORDER BY the keys themselves order the pick (the host engine's
    * "arbitrary row" becomes deterministic here).
    */
  private def rewriteDistinctOnTop(s: String): String = {
    val (words, groups) = scan(s)
    val top = words.filter(_._4 == 0)
    // SELECT immediately followed by DISTINCT then ON (whitespace only
    // between the three), then a paren group holding the keys
    val hit = top.sliding(3).collectFirst {
      case Seq(sel, ("DISTINCT", dSt, dEn, _), ("ON", oSt, oEn, _))
          if sel._1 == "SELECT" &&
            s.substring(sel._3, dSt).isBlank && s.substring(dEn, oSt).isBlank =>
        (sel, oEn)
    }
    val (select, onEnd) = hit.getOrElse(return s)
    val grp = groups
      .find(g => g._1 >= onEnd && s.substring(onEnd, g._1).isBlank)
      .getOrElse(return s)
    val keys = s.substring(grp._1 + 1, grp._2).trim
    if (keys.isEmpty) return s
    val listStart = grp._2 + 1
    val from = top.find(w => w._1 == "FROM" && w._2 > listStart)
      .getOrElse(return s)
    val order = top.find(w => w._1 == "ORDER" && w._2 > from._2)
    val stoppers = Set("LIMIT", "OFFSET", "FETCH", "UNION", "INTERSECT", "EXCEPT")
    val tailStart = top.find(w => stoppers(w._1) && w._2 > from._2).map(_._2)
      .getOrElse(s.length)
    val windowOrder = order match {
      case Some(o) =>
        val by = top.find(w => w._1 == "BY" && w._2 >= o._3).getOrElse(return s)
        s.substring(by._3, tailStart).trim
      case None => keys
    }
    val pre = s.substring(0, select._2)
    val selList = s.substring(listStart, from._2)
    val mid = s.substring(from._2, order.map(_._2).getOrElse(tailStart))
    val tail = s.substring(order.map(_._2).getOrElse(tailStart))
    s"${pre}SELECT * EXCEPT (__graft_rn) FROM (SELECT$selList, " +
      s"row_number() OVER (PARTITION BY $keys ORDER BY $windowOrder) AS __graft_rn " +
      s"$mid) WHERE __graft_rn = 1 $tail"
  }

  /** One lexer pass: (words with positions+paren depth, top-level paren
    * groups). Strings ('' escape honored), quoted identifiers, backticks,
    * and both comment forms are skipped entirely.
    */
  private def scan(s: String): (Vector[(String, Int, Int, Int)], Vector[(Int, Int)]) = {
    val words = Vector.newBuilder[(String, Int, Int, Int)]
    val groups = Vector.newBuilder[(Int, Int)]
    val n = s.length
    var i = 0; var depth = 0; var open0 = -1
    while (i < n) {
      val c = s.charAt(i)
      if (c == '\'') {
        i += 1
        var done = false
        while (i < n && !done) {
          if (s.charAt(i) == '\'') {
            if (i + 1 < n && s.charAt(i + 1) == '\'') i += 2 else { done = true; i += 1 }
          } else i += 1
        }
      } else if (c == '"' || c == '`') {
        i += 1; while (i < n && s.charAt(i) != c) i += 1; i += 1
      } else if (c == '-' && i + 1 < n && s.charAt(i + 1) == '-') {
        while (i < n && s.charAt(i) != '\n') i += 1
      } else if (c == '/' && i + 1 < n && s.charAt(i + 1) == '*') {
        i += 2
        while (i + 1 < n && !(s.charAt(i) == '*' && s.charAt(i + 1) == '/')) i += 1
        i = math.min(n, i + 2)
      } else if (c == '(') {
        if (depth == 0) open0 = i
        depth += 1; i += 1
      } else if (c == ')') {
        depth -= 1
        if (depth == 0 && open0 >= 0) { groups += ((open0, i)); open0 = -1 }
        if (depth < 0) depth = 0
        i += 1
      } else if (c.isLetter || c == '_') {
        val st = i
        while (i < n && (s.charAt(i).isLetterOrDigit || s.charAt(i) == '_')) i += 1
        words += ((s.substring(st, i).toUpperCase, st, i, depth))
      } else i += 1
    }
    (words.result(), groups.result())
  }

  /** Rewrite the depth-0 QUALIFY of one (sub)query body, if present.
    * Paren groups have already been rewritten by the caller.
    */
  private def rewriteTopLevel(s: String): String = {
    val (words, _) = scan(s)
    val top = words.filter(_._4 == 0)
    val qualify = top.find(_._1 == "QUALIFY").getOrElse(return s)

    // the QUALIFY belongs to the nearest preceding depth-0 SELECT — in a
    // set-op compound that is the operand's own SELECT, so each operand
    // rewrites independently (the loop in rewrite() folds one per pass)
    val select = top.filter(w => w._1 == "SELECT" && w._2 < qualify._2).lastOption
      .getOrElse(throw new QualifyRewriteException("QUALIFY without a SELECT block"))
    // the token right after SELECT (any depth — adjacency is by position)
    words.find(_._2 >= select._3) match {
      case Some(w) if w._1 == "DISTINCT" && s.substring(select._3, w._2).isBlank =>
        throw new QualifyRewriteException(
          "QUALIFY on SELECT DISTINCT is unsupported — wrap the DISTINCT in a subquery")
      case _ =>
    }
    val from = top.find(w => w._1 == "FROM" && w._2 > select._3 && w._2 < qualify._2)
      .getOrElse(throw new QualifyRewriteException("QUALIFY without a FROM clause"))

    // predicate ends at the next depth-0 clause that follows QUALIFY
    val stoppers = Set("ORDER", "LIMIT", "OFFSET", "FETCH", "UNION", "INTERSECT", "EXCEPT")
    val tailStart = top.find(w => stoppers(w._1) && w._2 >= qualify._3)
      .map(_._2).getOrElse(s.length)
    val pred = s.substring(qualify._3, tailStart).trim
    if (pred.isEmpty) throw new QualifyRewriteException("empty QUALIFY predicate")

    val pre = s.substring(0, select._2) // WITH clause, or nothing
    val selList = s.substring(select._3, from._2)
    val fromPart = s.substring(from._2, qualify._2)
    val tail = s.substring(tailStart)
    s"${pre}SELECT * EXCEPT ($Marker) FROM (SELECT$selList, ($pred) AS $Marker " +
      s"$fromPart) WHERE $Marker $tail"
  }
}
