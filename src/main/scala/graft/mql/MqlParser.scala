package graft.mql

import scala.util.parsing.combinator.RegexParsers
import java.time.{LocalDate, LocalDateTime, OffsetDateTime, ZoneOffset}
import Ast._

final case class MqlSyntaxError(msg: String) extends RuntimeException(msg)

/** MQL concrete-syntax parser.
  *
  * Faithful to the reference Lark grammar
  * (`metacat/mql/grammar/{common,file_query,dataset_query,query_query}.py`)
  * plus the documented-but-dropped `with namespace = "x"` scoping
  * (docs/mql.rst:405-472). Context-free parse-time rewrites from
  * `metacat/mql/mql10.py` are applied while building the AST:
  *
  *  - `#` comments stripped to end-of-line (mql10.py:1360-1363)
  *  - `datetime(...)` folded to an epoch float constant (mql10.py:871-876)
  *  - `date(...)` comparisons expanded to 24h windows (mql10.py:1052-1082);
  *    ranges add 24h to the high end (mql10.py:1129-1163); dates rejected in
  *    sets (mql10.py:1165-1179)
  *  - `[all] P` converted to negated `[any]` with inverted operator
  *    (`_convert_array_all`, mql10.py:999-1027)
  *  - `!`/NOT pushed to the leaves: De Morgan on and/or, neg-flag toggle on
  *    cmp/in_set/in_range, present↔not-present (`_apply_not`,
  *    mql10.py:1210-1258)
  *  - `const in a.b` → `a.b[any] == const`, plus for string constants an
  *    OR'ed unanchored regex on the scalar (mql10.py:1094-1127)
  *  - and/or/union/join n-ary flattening (mql10.py:942-969)
  *  - `* ?` → `% _` in dataset `matching` patterns (mql10.py:1290-1299)
  *
  * Context-dependent rewrites (namespace resolution, named-query splicing,
  * skip/limit folding) live in [[Rewrites]].
  */
object MqlParser extends RegexParsers {

  override val whiteSpace = "\\s+".r

  // ---------- lexical ----------
  private val reserved = Set(
    "union", "join", "parents", "children", "filter", "files", "file",
    "fids", "fid", "datasets", "from", "where", "limit", "skip", "ordered",
    "selected", "by", "having", "matching", "regexp", "with", "subsets",
    "recursively", "present", "not", "in", "and", "or", "len", "queries",
    "namespace")

  private def kw(s: String): Parser[String] =
    (s + "(?![a-zA-Z0-9_])").r

  /** FNAME: LETTER ("_"|"-"|"."|LETTER|DIGIT|"/")* — minus reserved words
    * (in positions where a keyword could also start, e.g. a dataset list
    * element vs a following `limit`) */
  private val fname: Parser[String] =
    """[a-zA-Z][a-zA-Z0-9_\-./]*""".r.filter(!reserved(_)).withFailureMessage("name expected")
  /** after a `:` no keyword can appear, so reserved words are legal names
    * there (a dataset named `join` is fine — the reference's contextual
    * lexer accepts it too) */
  private val fnameRelaxed: Parser[String] = """[a-zA-Z][a-zA-Z0-9_\-./]*""".r
  /** FID: ("_"|"-"|"."|LETTER|DIGIT|"/")+ — keywords excluded so a
    * following list element (`fids a, b, files x:y`) terminates the list */
  private val fidTok: Parser[String] =
    """[a-zA-Z0-9_\-./]+""".r.filter(!reserved(_))
  /** WORD ("." WORD)+ — dotted metadata key */
  private val metaName: Parser[String] =
    """[a-zA-Z][a-zA-Z0-9_]*(\.[a-zA-Z][a-zA-Z0-9_]*)+""".r
  /** dot-less names bind to fixed columns; whitelist per
    * `metacat/common/attributes.py` (+ dataset/query attributes). */
  private val objectAttrNames = Set(
    "creator", "created_timestamp", "updated_timestamp", "updated_by",
    "name", "namespace", "size", "retired",
    "description", "frozen", "monotonic", "source")
  private val word: Parser[String] =
    """[a-zA-Z][a-zA-Z0-9_]*""".r.filter(objectAttrNames)
  private val quoted: Parser[String] =
    ("\"[^\"]*\"".r | "'[^']*'".r) ^^ (s => s.substring(1, s.length - 1))
  private val unquoted: Parser[String] = """[a-zA-Z0-9$@_.\-]+""".r
  /** PATTERN: SAFE_CHARACTER | [*?^%] */
  private val patternTok: Parser[String] = """[a-zA-Z0-9$@_.\-*?^%]+""".r
  // numeric tokens must not be a prefix of a longer unquoted string
  // (`1-URGENT` is a string constant, not IntC(1) + garbage)
  private val signedInt: Parser[Long] =
    """[+-]?\d+(?![a-zA-Z0-9$@_.\-])""".r ^^ (_.toLong)
  private val signedFloat: Parser[Double] =
    """[+-]?(\d+\.\d*([eE][+-]?\d+)?|\.\d+([eE][+-]?\d+)?|\d+[eE][+-]?\d+)(?![a-zA-Z0-9$@_.\-])""".r ^^ (_.toDouble)
  private val cmpop: Parser[String] =
    ("<=" | ">=" | "<" | ">" | "!==" | "!=" | "==" | "=" | "!~*" | "!~" | "~*" | "~") ^^ {
      case "=" | "==" => "=="
      case "!=" | "!==" => "!="
      case op => op
    }

  // ---------- constants ----------
  private def unpackString(s: String): String = {
    if (s.contains("\"") || s.contains("'"))
      throw MqlSyntaxError(s"Unsafe string constant containing quote: $s")
    s
  }

  private val datetimeConst: Parser[Const] =
    kw("datetime") ~> "(" ~> (quoted | unquoted) <~ ")" ^^ { s =>
      FloatC(parseDatetimeEpoch(unpackString(s)))
    }
  private val dateConst: Parser[Const] =
    kw("date") ~> "(" ~> (quoted | unquoted) ~ opt("," ~> (quoted | unquoted)) <~ ")" ^^ {
      case d ~ tz => DateC(parseDateEpoch(unpackString(d), tz.map(unpackString)))
    }
  /** boolean must win over unquoted-string */
  private val boolConst: Parser[Const] =
    ("(?i)true(?![a-zA-Z0-9_])".r ^^^ BoolC(true)) | ("(?i)false(?![a-zA-Z0-9_])".r ^^^ BoolC(false))

  val constant: Parser[Const] =
    datetimeConst | dateConst |
      (signedFloat ^^ FloatC.apply) |
      (quoted ^^ (s => StringC(unpackString(s)))) |
      (signedInt ^^ IntC.apply) |
      boolConst |
      (unquoted ^^ (s => StringC(unpackString(s))))

  private val constantList: Parser[List[Const]] = rep1sep(constant, ",")

  def parseDatetimeEpoch(s: String): Double = {
    val t = s.trim.replace(" ", "T")
    val dt =
      try OffsetDateTime.parse(t)
      catch {
        case _: Exception =>
          LocalDateTime.parse(if (t.contains("T")) t else t + "T00:00:00").atOffset(ZoneOffset.UTC)
      }
    dt.toInstant.toEpochMilli / 1000.0
  }

  def parseDateEpoch(d: String, tzshift: Option[String]): Double = {
    val date = LocalDate.parse(d.trim)
    val shift = tzshift.map(_.trim).filter(_.nonEmpty).map { raw =>
      val s = if (raw.head == '+' || raw.head == '-') raw else "+" + raw
      ZoneOffset.of(s)
    }.getOrElse(ZoneOffset.UTC)
    date.atStartOfDay(shift).toInstant.toEpochMilli / 1000.0
  }

  // ---------- scalars ----------
  private val scalar: Parser[Scalar] =
    (kw("len") ~> "(" ~> metaName <~ ")" ^^ ArrayLen.apply) |
      (metaName ~ ("[" ~> kw("all") <~ "]") ^^ { case n ~ _ => ArrayAll(n) }) |
      (metaName ~ ("[" ~> kw("any") <~ "]") ^^ { case n ~ _ => ArrayAny(n) }) |
      (metaName ~ ("[" ~> signedInt <~ "]") ^^ { case n ~ i => SubscriptInt(n, i.toInt) }) |
      (metaName ~ ("[" ~> quoted <~ "]") ^^ { case n ~ k => SubscriptKey(n, k) }) |
      (metaName ^^ MetaAttr.apply) |
      (word ^^ ObjectAttr.apply)

  // ---------- meta expressions ----------
  /** `_convert_array_all` (mql10.py:999-1027): `[all] P` ⇒ ¬`[any]` ¬P.
    * For cmp ops the element complement is the inverted operator (== and !=
    * are exact complements among present values in [[MetaCompiler]]); for
    * set/range membership it is the `elemInverted` flag — giving
    * `a[all] in S` ≡ ¬∃ elem ∉ S and `a[all] not in S` ≡ ¬∃ elem ∈ S. */
  private def convertArrayAll(e: MetaExp): MetaExp = e match {
    case c @ Cmp(ArrayAll(n), op, right, neg) =>
      c.copy(left = ArrayAny(n), op = invertOp(op), neg = !neg)
    case r @ InRange(ArrayAll(n), _, _, neg, _) =>
      r.copy(left = ArrayAny(n), neg = true, elemInverted = !neg)
    case s @ InSet(ArrayAll(n), _, neg, _) =>
      s.copy(left = ArrayAny(n), neg = true, elemInverted = !neg)
    case other => other
  }

  private val invertOp: Map[String, String] = Map(
    "~" -> "!~", "!~" -> "~", "~*" -> "!~*", "!~*" -> "~*",
    ">" -> "<=", "<" -> ">=", ">=" -> "<", "<=" -> ">",
    "==" -> "!=", "!=" -> "==")

  /** `_apply_not` (mql10.py:1210-1258) */
  def applyNot(e: MetaExp): MetaExp = e match {
    case MAnd(List(c)) => applyNot(c)
    case MOr(List(c)) => applyNot(c)
    case MAnd(cs) => MOr(cs.map(applyNot))
    case MOr(cs) => MAnd(cs.map(applyNot))
    case c: Cmp => c.copy(neg = !c.neg)
    case r: InRange => r.copy(neg = !r.neg)
    case s: InSet => s.copy(neg = !s.neg)
    case p: Present => p.copy(neg = !p.neg)
  }

  /** date-window expansion for `scalar CMP date(...)` (mql10.py:1052-1082) */
  private def dateCmp(left: Scalar, op: String, t: Double): MetaExp = {
    val day = 24 * 3600.0
    op match {
      case "==" => MAnd(List(
        Cmp(left, ">=", FloatC(t)), Cmp(left, "<", FloatC(t + day))))
      case "!=" => MOr(List(
        Cmp(left, "<", FloatC(t)), Cmp(left, ">=", FloatC(t + day))))
      case "<" => Cmp(left, "<", FloatC(t))
      case "<=" => Cmp(left, "<", FloatC(t + day))
      case ">" => Cmp(left, ">=", FloatC(t + day))
      case ">=" => Cmp(left, ">=", FloatC(t))
      case other => throw MqlSyntaxError(s"Unsupported comparison for date constant: $other")
    }
  }

  private val cmpTerm: Parser[MetaExp] = scalar ~ cmpop ~ constant ^^ {
    // `[all] CMP date(...)`: the window expansion produces an and/or whose
    // leaves can't individually carry the [all] (∀ doesn't distribute over
    // ∨), so go through ∀P ≡ ¬∃¬P directly. (The reference errors out on
    // this combination — mql10.py:1052-1082 runs before _convert_array_all
    // can see the array_all leaf.)
    case ArrayAll(n) ~ op ~ DateC(t) => applyNot(dateCmp(ArrayAny(n), invertOp(op), t))
    case l ~ op ~ DateC(t) => dateCmp(l, op, t)
    case l ~ op ~ c => convertArrayAll(Cmp(l, op, c))
  }

  private val inRangeTerm: Parser[MetaExp] =
    scalar ~ (kw("not") ~> kw("in")) ~ constant ~ (":" ~> constant) ^^ {
      case l ~ _ ~ lo ~ hi => convertArrayAll(buildRange(l, lo, hi, neg = true))
    } |
      scalar ~ kw("in") ~ constant ~ (":" ~> constant) ^^ {
        case l ~ _ ~ lo ~ hi => convertArrayAll(buildRange(l, lo, hi, neg = false))
      }

  private def sameType(a: Const, b: Const): Boolean = (a, b) match {
    case (IntC(_), IntC(_)) | (FloatC(_), FloatC(_)) | (StringC(_), StringC(_)) |
        (DateC(_), DateC(_)) => true
    case _ => false
  }

  private def buildRange(l: Scalar, lo: Const, hi: Const, neg: Boolean): MetaExp = {
    if (!sameType(lo, hi)) throw MqlSyntaxError("Range ends must be of the same type")
    (lo, hi) match {
      case (DateC(t0), DateC(t1)) =>
        val high = t1 + 24 * 3600.0
        if (neg)
          MOr(List(Cmp(l, "<", FloatC(t0)), Cmp(l, ">=", FloatC(high))))
        else
          MAnd(List(Cmp(l, ">=", FloatC(t0)), Cmp(l, "<", FloatC(high))))
      case _ => InRange(l, lo, hi, neg)
    }
  }

  private val inSetTerm: Parser[MetaExp] =
    scalar ~ (kw("not") ~> kw("in")) ~ ("(" ~> constantList <~ ")") ^^ {
      case l ~ _ ~ vs => convertArrayAll(buildSet(l, vs, neg = true))
    } |
      scalar ~ kw("in") ~ ("(" ~> constantList <~ ")") ^^ {
        case l ~ _ ~ vs => convertArrayAll(buildSet(l, vs, neg = false))
      }

  private def buildSet(l: Scalar, vs: List[Const], neg: Boolean): MetaExp = {
    if (vs.exists(_.isInstanceOf[DateC]))
      throw MqlSyntaxError("in_set operation is not supported for date()")
    InSet(l, vs, neg)
  }

  private val presentTerm: Parser[MetaExp] =
    (metaName <~ kw("not") <~ kw("present")) ^^ (n => Present(n, neg = true)) |
      (metaName <~ kw("present")) ^^ (n => Present(n, neg = false))

  /** `const in a.b` / `const not in a.b` (mql10.py:1094-1127) */
  private val constInTerm: Parser[MetaExp] =
    constant ~ (kw("not") ~> kw("in")) ~ metaName ^^ { case c ~ _ ~ n => constIn(c, n, neg = true) } |
      constant ~ kw("in") ~ metaName ^^ { case c ~ _ ~ n => constIn(c, n, neg = false) }

  private def constIn(c: Const, name: String, neg: Boolean): MetaExp = {
    val arrayIn = Cmp(ArrayAny(name), "==", c, neg = neg)
    c match {
      case StringC(s) =>
        // neg carries the regex leg too (op stays "~", mql10.py:1114-1127):
        // on an array/missing value the raw regex is false, so the negated
        // leg is vacuously true and the array-containment leg decides.
        val re = Cmp(MetaAttr(name), "~", StringC(s".*$s.*"), neg = neg)
        if (neg) MAnd(List(arrayIn, re)) else MOr(List(arrayIn, re))
      case _ => arrayIn
    }
  }

  private lazy val termMeta: Parser[MetaExp] =
    ("(" ~> metaOr <~ ")") |
      ("!" ~> termMeta ^^ applyNot) |
      cmpTerm | inRangeTerm | inSetTerm | presentTerm | constInTerm

  private lazy val metaAnd: Parser[MetaExp] = rep1sep(termMeta, kw("and")) ^^ {
    case List(one) => one
    case many => MAnd(many.flatMap { case MAnd(cs) => cs; case e => List(e) })
  }

  private lazy val metaOr: Parser[MetaExp] = rep1sep(metaAnd, kw("or")) ^^ {
    case List(one) => one
    case many => MOr(many.flatMap { case MOr(cs) => cs; case e => List(e) })
  }

  lazy val metaExp: Parser[MetaExp] = metaOr

  // ---------- dataset selectors ----------
  private val qualifiedName: Parser[(Option[String], String)] =
    (fname ~ (":" ~> fnameRelaxed) ^^ { case ns ~ n => (Some(ns), n) }) |
      (fname ^^ (n => (None, n)))

  private def globToLike(p: String): String =
    p.replace("*", "%").replace("?", "_")

  private val datasetSpec: Parser[DsSpec] =
    (kw("matching") ~> kw("regexp") ~> ((fname <~ ":") ~ quoted) ^^ {
      case ns ~ re => DsRegexp(Some(ns), re)
    }) |
      (kw("matching") ~> kw("regexp") ~> quoted ^^ (re => DsRegexp(None, re))) |
      (kw("matching") ~> ((fname <~ ":") ~ patternTok) ^^ {
        case ns ~ p => DsPattern(Some(ns), globToLike(p))
      }) |
      (kw("matching") ~> patternTok ^^ (p => DsPattern(None, globToLike(p)))) |
      (qualifiedName ^^ { case (ns, n) => DsExact(ns, n) })

  private val datasetQuery: Parser[DatasetSel] =
    datasetSpec ~ opt(kw("with") ~> kw("subsets") ~> opt(kw("recursively"))) ~
      opt(kw("having") ~> metaExp) ^^ {
        case spec ~ subs ~ hav =>
          DatasetSel(spec, withSubsets = subs.isDefined,
            recursively = subs.exists(_.isDefined), having = hav)
      }

  private val datasetQueryList: Parser[List[DatasetSel]] = rep1sep(datasetQuery, ",")

  // ---------- file queries ----------
  private lazy val fileQueryList: Parser[List[FileQ]] = rep1sep(fileQuery, ",")

  private val filterParams: Parser[(List[Const], Map[String, Const])] = {
    val paramDef: Parser[(String, Const)] = fname ~ ("=" ~> constant) ^^ { case k ~ v => (k, v) }
    val kwList: Parser[Map[String, Const]] = rep1sep(paramDef, ",") ^^ (_.toMap)
    (rep1sep(not(paramDef) ~> constant, ",") ~ opt("," ~> kwList) ^^ {
      case ps ~ kw => (ps, kw.getOrElse(Map.empty))
    }) |
      (kwList ^^ (m => (List.empty[Const], m))) |
      success((List.empty[Const], Map.empty[String, Const]))
  }

  private lazy val fileQueryTerm: Parser[FileQ] =
    // filter names may collide with keywords (the reference ships a
    // `limit` filter), so use the raw identifier token here
    (kw("filter") ~> """[a-zA-Z][a-zA-Z0-9_\-./]*""".r ~ ("(" ~> filterParams <~ ")") ~ ("(" ~> fileQueryList <~ ")") ^^ {
      case name ~ params ~ qs => FilterQ(name, params._1, params._2, qs)
    }) |
      ((kw("files") | kw("file")) ~> kw("selected") ~> opt(kw("by")) ~> qualifiedName ^^ {
        case (ns, n) => NamedQ(ns, n)
      }) |
      (kw("files") ~> kw("from") ~> opt(kw("datasets")) ~> datasetQueryList ^^ {
        sels => Bfq(sels)
      }) |
      ((kw("fids") | kw("fid")) ~> rep1sep(fidTok, ",") ^^ {
        fids => FileListQ(Nil, fids)
      }) |
      ((kw("files") | kw("file")) ~> rep1sep(qualifiedName, ",") ^^ {
        dids => FileListQ(dids, Nil)
      }) |
      (kw("files") ^^^ Bfq(Nil))

  private lazy val fileQueryExpr: Parser[FileQ] =
    (kw("union") ~> "(" ~> fileQueryList <~ ")" ^^ (qs => UnionQ(qs))) |
      ("[" ~> fileQueryList <~ "]" ^^ (qs => UnionQ(qs))) |
      (kw("join") ~> "(" ~> fileQueryList <~ ")" ^^ (qs => JoinQ(qs))) |
      ("{" ~> fileQueryList <~ "}" ^^ (qs => JoinQ(qs))) |
      (kw("parents") ~> "(" ~> fileQuery <~ ")" ^^ ParentsOf.apply) |
      (kw("children") ~> "(" ~> fileQuery <~ ")" ^^ ChildrenOf.apply) |
      // binds ONE postfixed query only: `with namespace="s" files from A -
      // files from B` leaves B unscoped, exactly as documented invalid
      // (docs/mql.rst:425-441); parenthesize to widen the scope
      (kw("with") ~> kw("namespace") ~> "=" ~> (quoted | fname) ~ postfixedQuery ^^ {
        case ns ~ q => WithNsQ(ns, q)
      }) |
      ("(" ~> fileQuery <~ ")") |
      fileQueryTerm

  private sealed trait Postfix
  private case class PWhere(e: MetaExp) extends Postfix
  private case class PLimit(n: Long) extends Postfix
  private case class PSkip(n: Long) extends Postfix
  private case object POrdered extends Postfix

  private val postfix: Parser[Postfix] =
    (kw("where") ~> metaExp ^^ PWhere.apply) |
      (kw("limit") ~> signedInt ^^ PLimit.apply) |
      (kw("skip") ~> signedInt ^^ PSkip.apply) |
      (kw("ordered") ^^^ POrdered)

  private lazy val postfixedQuery: Parser[FileQ] =
    fileQueryExpr ~ rep(postfix) ^^ { case base ~ ops =>
      ops.foldLeft(base) {
        case (q, PWhere(e)) => WhereQ(q, e)
        case (q, PLimit(n)) => SkipLimitQ(q, 0, Some(n))
        case (q, PSkip(n)) => SkipLimitQ(q, n, None)
        case (q, POrdered) => OrderedQ(q)
      }
    }

  /** minus is left-associative; its RHS binds one postfixed expression
    * (`file_query "-" meta_filter`, grammar/file_query.py:6). */
  lazy val fileQuery: Parser[FileQ] =
    postfixedQuery ~ rep("-" ~> postfixedQuery) ^^ { case h ~ t =>
      t.foldLeft(h)(MinusQ.apply)
    }

  // ---------- top level ----------
  private val topDatasetQuery: Parser[TopQ] =
    kw("datasets") ~> datasetQueryList ^^ TopDatasetQ.apply

  private val queryNameMatch: Parser[Either[DsPattern, DsRegexp]] = {
    val reWithNs = (fname <~ ":") ~ quoted ^^ { case ns ~ re => Right(DsRegexp(Some(ns), re)) }
    val reNoNs = quoted ^^ ((re: String) => Right(DsRegexp(None, re)))
    val patWithNs = (fname <~ ":") ~ patternTok ^^ { case ns ~ p => Left(DsPattern(Some(ns), globToLike(p))) }
    val patNoNs = patternTok ^^ ((p: String) => Left(DsPattern(None, globToLike(p))))
    (kw("regexp") ~> (reWithNs | reNoNs)) | patWithNs | patNoNs
  }

  private val topQueryQuery: Parser[TopQ] =
    kw("queries") ~> opt(kw("matching") ~> queryNameMatch) ~
      opt(kw("where") ~> metaExp) ^^ { case pat ~ w => TopQueryQ(pat, w) }

  private val topQuery: Parser[TopQ] =
    topDatasetQuery | topQueryQuery | (fileQuery ^^ TopFileQ.apply)

  /** Strip `#` comments (mql10.py:1360-1363) and parse. */
  def parseTop(text: String): TopQ = {
    val stripped = text.linesIterator.map(_.split("#", 2)(0)).mkString("\n")
    parseAll(topQuery, stripped) match {
      case Success(q, _) => q
      case NoSuccess(msg, next) =>
        throw MqlSyntaxError(s"MQL syntax error at line ${next.pos.line}, col ${next.pos.column}: $msg")
      case other => throw MqlSyntaxError(other.toString)
    }
  }
}
