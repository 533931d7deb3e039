package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.expressions.{Cast, Concat, DateFormatClass, DayOfWeek, EvalMode, Expression, GetJsonObject, Literal, ParseUrl, Subtract, UnixTimestamp}
import org.apache.spark.sql.types._

/** The exosql scalar-function surface (SURVEY.md §2.7; reference
  * `lib/builtins.ex` [U]) re-expressed Spark-first.
  *
  * Most names map 1:1 to codegen'd `org.apache.spark.sql.functions`;
  * the Column helpers here cover only the exosql-specific semantics —
  * strftime %-verb translation (composed from `date_format` pieces, so it
  * stays inside whole-stage codegen), permissive casts, negative-index
  * substr, named-group regex, urlparse.
  *
  * `registerAll` additionally exposes the exosql names to SQL via the
  * session function registry (`strftime`, `jp`, `regex`, ...).
  */
object Builtins {

  // ── datetime ──────────────────────────────────────────────────────────

  /** C-strftime verb → java DateTimeFormatter pattern (for the verbs that
    * translate 1:1). %w (Sunday=0 weekday) and %s (epoch) need expression
    * composition, handled in [[strftime]]. */
  private val strftimeVerbs: Map[Char, String] = Map(
    'Y' -> "yyyy", 'y' -> "yy", 'm' -> "MM", 'd' -> "dd",
    'H' -> "HH", 'I' -> "hh", 'M' -> "mm", 'S' -> "ss",
    'j' -> "DDD", 'a' -> "EEE", 'A' -> "EEEE", 'b' -> "MMM",
    'B' -> "MMMM", 'p' -> "a", 'f' -> "SSSSSS", 'Z' -> "zz")

  /** exosql `strftime(dt, fmt)` — a concat of `date_format` chunks and
    * computed pieces, built directly as a Catalyst expression tree (shared
    * by the Column API and the SQL function registry); codegen-friendly,
    * no UDF. */
  /** strftime-style format → java DateTimeFormatter pattern (for parse
    * directions like 2-arg to_datetime; only 1:1 verbs supported). */
  def strftimeToJavaPattern(fmt: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < fmt.length) {
      val c = fmt.charAt(i)
      if (c == '%' && i + 1 < fmt.length) {
        val v = fmt.charAt(i + 1)
        if (v == '%') sb += '%'
        else sb ++= strftimeVerbs.getOrElse(v,
          throw new IllegalArgumentException(s"to_datetime: unsupported verb %$v"))
        i += 2
      } else {
        if (c.isLetter) { sb += '\''; sb += c; sb += '\'' } else sb += c
        i += 1
      }
    }
    sb.toString
  }

  def strftimeExpr(ts: Expression, fmt: String): Expression = {
    val chunks = scala.collection.mutable.ArrayBuffer[Expression]()
    def fmtChunk(p: String): Expression = DateFormatClass(ts, Literal(p))
    val sb = new StringBuilder // pending literal text, quoted for java fmt
    def flushLiteral(): Unit = if (sb.nonEmpty) {
      chunks += Literal(sb.toString)
      sb.clear()
    }
    var i = 0
    while (i < fmt.length) {
      val c = fmt.charAt(i)
      if (c == '%' && i + 1 < fmt.length) {
        val v = fmt.charAt(i + 1)
        v match {
          case '%' => sb += '%'
          case 'w' => // weekday, Sunday=0 — Spark dayofweek is Sunday=1
            flushLiteral()
            chunks += Cast(Subtract(DayOfWeek(ts), Literal(1)), StringType)
          case 's' => // epoch seconds
            flushLiteral()
            chunks += Cast(UnixTimestamp(ts, Literal("yyyy-MM-dd HH:mm:ss")), StringType)
          case verb if strftimeVerbs.contains(verb) =>
            flushLiteral(); chunks += fmtChunk(strftimeVerbs(verb))
          case other => sb += '%' += other // unknown verb: literal, like C
        }
        i += 2
      } else { sb += c; i += 1 }
    }
    flushLiteral()
    if (chunks.isEmpty) Literal("") else Concat(chunks.toSeq)
  }

  def strftime(ts: Column, fmt: String): Column = col(strftimeExpr(expression(ts), fmt))

  /** exosql `to_datetime(x)` — permissive to-timestamp (epoch numbers,
    * ISO strings, dates). */
  def to_datetime(c: Column): Column = col(ToDatetime(expression(c)))

  /** exosql `to_timestamp(dt)` → epoch seconds (NOT Spark's to_timestamp —
    * registered in SQL as `exo_to_timestamp` to avoid shadowing). */
  def exo_to_timestamp(c: Column): Column = unix_timestamp(c)

  // ── strings ───────────────────────────────────────────────────────────

  def exo_substr(s: Column, start: Column, len: Column): Column =
    col(ExoSubstr(expression(s), expression(start), expression(len)))
  def exo_substr(s: Column, start: Int): Column =
    exo_substr(s, lit(start), lit(Int.MaxValue))
  def exo_substr(s: Column, start: Int, len: Int): Column =
    exo_substr(s, lit(start), lit(len))

  /** exosql `join(list, sep)` (list → string). */
  def exo_join(list: Column, sep: String): Column = array_join(list, sep)

  /** exosql `to_string(x)` — permissive term → string. */
  def to_string(c: Column): Column = c.cast(StringType)

  /** exosql `to_number(x)` — permissive parse, null on failure. */
  def to_number(c: Column): Column = c.try_cast(DoubleType)

  /** exosql `format(fmt, args...)` — printf-style. */
  def format(fmt: String, args: Column*): Column = format_string(fmt, args: _*)

  // ── regex / json / url ────────────────────────────────────────────────

  /** exosql `regex(s, re)` — first full match ("" if none). */
  def regex(s: Column, re: String): Column = regexp_extract(s, re, 0)
  /** exosql `regex(s, re, group)` — capture group of first match. */
  def regex(s: Column, re: String, group: Int): Column = regexp_extract(s, re, group)
  /** exosql `regex(s, re)` named-group form → map(name → capture). */
  def regex_named(s: Column, re: Column): Column =
    col(RegexNamed(expression(s), expression(re)))
  /** exosql `regex_all(s, re)` — all matches (group 1 if present, else 0). */
  def regex_all(s: Column, re: String, group: Int = 0): Column =
    regexp_extract_all(s, lit(re), lit(group))

  /** exosql `jp(json, path)` — JSONPath extraction; bare keys get `$.`. */
  def jp(json: Column, path: String): Column = {
    val p = if (path.startsWith("$")) path else "$." + path
    get_json_object(json, p)
  }

  /** exosql `urlparse(url)` → map of components. */
  def urlparse(url: Column): Column = col(UrlParseMap(expression(url)))
  /** exosql `urlparse(url, part)` — single component (scheme/host/port/
    * path/query/fragment/user, or `query.<param>`). */
  def urlparse(url: Column, part: String): Column = part match {
    case p if p.startsWith("query.") => parse_url(url, lit("QUERY"), lit(p.drop(6)))
    case "scheme" => parse_url(url, lit("PROTOCOL"))
    case "user" => parse_url(url, lit("USERINFO"))
    case other => parse_url(url, lit(other.toUpperCase))
  }

  // ── numbers / misc ────────────────────────────────────────────────────

  /** exosql `trunc(x)` — truncate toward zero. */
  def exo_trunc(c: Column): Column = c.cast(LongType)

  /** exosql `randint(a, b)` — uniform int in [a, b). */
  def randint(a: Column, b: Column): Column = floor(rand() * (b - a) + a).cast(LongType)

  /** exosql `generate_series(a, b[, step])` as an array (explode for the
    * FROM-position table form, SURVEY §2.1 S6). */
  def generate_series(a: Column, b: Column, step: Column): Column = sequence(a, b, step)
  def generate_series(a: Column, b: Column): Column = sequence(a, b)

  // width_bucket, coalesce, nullif, round, now, datediff, split, concat,
  // lower, upper, trim: Spark built-ins of the same name — no wrapper.

  private def expression(c: Column): Expression =
    org.apache.spark.sql.GraftBridge.expression(c)

  private def col(e: Expression): Column =
    org.apache.spark.sql.GraftBridge.column(e)

  /** Sessions already registered — registerAll is called from every
    * SQL-surface query builder (safe to call per query), but re-running
    * `createOrReplaceTempFunction` emits a SimpleFunctionRegistry
    * "replaced a previously registered function" WARN per function per
    * call, flooding the bench/verify logs. Weak keys so dropped sessions
    * can be collected. */
  private val registeredSessions =
    java.util.Collections.synchronizedSet(
      java.util.Collections.newSetFromMap(
        new java.util.WeakHashMap[SparkSession, java.lang.Boolean]()))

  /** Expose exosql names to SQL. Spark-colliding names (`to_timestamp`)
    * get an `exo_` prefix rather than shadowing the standard function.
    * Idempotent per session: repeat calls are no-ops. */
  def registerAll(spark: SparkSession): Unit = {
    if (!registeredSessions.add(spark)) return
    val reg = spark.sessionState.functionRegistry
    def lit2str(e: Expression): String = e match {
      case Literal(v, _: StringType) if v != null => v.toString
      case other => throw new IllegalArgumentException(
        s"expected foldable string literal, got $other")
    }
    reg.createOrReplaceTempFunction("strftime", es =>
      strftimeExpr(es(0), lit2str(es(1))), "scala_udf")
    reg.createOrReplaceTempFunction("to_datetime", {
      case Seq(e) => ToDatetime(e)
      case Seq(e, fmt) => // exosql 2-arg form: strftime-style format
        new org.apache.spark.sql.catalyst.expressions.ParseToTimestamp(
          e, Literal(strftimeToJavaPattern(lit2str(fmt))))
      case es => throw new IllegalArgumentException(s"to_datetime arity ${es.size}")
    }, "scala_udf")
    reg.createOrReplaceTempFunction("json", es =>
      org.apache.spark.sql.catalyst.expressions.variant.ParseJson(es.head), "scala_udf")
    reg.createOrReplaceTempFunction("exo_to_timestamp", es =>
      UnixTimestamp(es.head, Literal("yyyy-MM-dd HH:mm:ss")), "scala_udf")
    reg.createOrReplaceTempFunction("exo_substr", {
      case Seq(s, st) => ExoSubstr(s, st, Literal(Int.MaxValue))
      case Seq(s, st, ln) => ExoSubstr(s, st, ln)
      case es => throw new IllegalArgumentException(s"exo_substr arity ${es.size}")
    }, "scala_udf")
    reg.createOrReplaceTempFunction("jp", { es =>
      val p = lit2str(es(1))
      GetJsonObject(es(0), Literal(if (p.startsWith("$")) p else "$." + p))
    }, "scala_udf")
    reg.createOrReplaceTempFunction("regex_named", es =>
      RegexNamed(es(0), es(1)), "scala_udf")
    reg.createOrReplaceTempFunction("urlparse", {
      case Seq(u) => UrlParseMap(u)
      case Seq(u, p) => lit2str(p) match {
        case q if q.startsWith("query.") =>
          ParseUrl(Seq(u, Literal("QUERY"), Literal(q.drop(6))))
        case "scheme" => ParseUrl(Seq(u, Literal("PROTOCOL")))
        case "user" => ParseUrl(Seq(u, Literal("USERINFO")))
        case other => ParseUrl(Seq(u, Literal(other.toUpperCase)))
      }
      case es => throw new IllegalArgumentException(s"urlparse arity ${es.size}")
    }, "scala_udf")
    reg.createOrReplaceTempFunction("to_number", es =>
      Cast(es.head, DoubleType, None, EvalMode.TRY), "scala_udf")
    reg.createOrReplaceTempFunction("to_string", es =>
      Cast(es.head, StringType), "scala_udf")
    reg.createOrReplaceTempFunction("generate_series", {
      case Seq(a, b) =>
        org.apache.spark.sql.catalyst.expressions.Sequence(a, b, None, None)
      case Seq(a, b, st) =>
        org.apache.spark.sql.catalyst.expressions.Sequence(a, b, Some(st), None)
      case es => throw new IllegalArgumentException(s"generate_series arity ${es.size}")
    }, "scala_udf")
    reg.createOrReplaceTempFunction("exo_trunc", es =>
      Cast(es.head, LongType), "scala_udf")
    // registry-injected expressions built from the Column API must be
    // FULLY converted (session converter) — the lazy ColumnNodeExpression
    // wrapper [[GraftBridge.expression]] returns survives to codegen when
    // it enters a plan through the function registry instead of the
    // DataFrame API (see GraftBridge.resolvedExpression)
    def resolved(c: Column): Expression =
      org.apache.spark.sql.GraftBridge.resolvedExpression(spark, c)
    reg.createOrReplaceTempFunction("randint", es =>
      resolved(randint(col(es(0)), col(es(1)))), "scala_udf")
    reg.createOrReplaceTempFunction("regex", {
      case Seq(s0, re) => resolved(regexp_extract(col(s0), lit2str(re), 0))
      case Seq(s0, re, g) => resolved(regexp_extract(col(s0), lit2str(re),
        g.eval().asInstanceOf[Number].intValue()))
      case es => throw new IllegalArgumentException(s"regex arity ${es.size}")
    }, "scala_udf")
    reg.createOrReplaceTempFunction("regex_all", {
      case Seq(s0, re) => resolved(regexp_extract_all(col(s0), col(re), lit(0)))
      case Seq(s0, re, g) => resolved(regexp_extract_all(col(s0), col(re), col(g)))
      case es => throw new IllegalArgumentException(s"regex_all arity ${es.size}")
    }, "scala_udf")
  }
}
