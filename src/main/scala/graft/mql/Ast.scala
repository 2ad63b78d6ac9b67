package graft.mql

/** MQL abstract syntax.
  *
  * Mirrors the reference language semantics (grammar:
  * `metacat/mql/grammar/{common,file_query,dataset_query,query_query}.py`;
  * converter: `metacat/mql/mql10.py`). Parse-time rewrites that need no
  * context (datetime folding, date-window expansion, `[all]`→`[any]`
  * inversion, NOT push-down) are applied while building this AST; rewrites
  * that need context (namespace resolution via `with namespace=`, named-query
  * inlining, skip/limit sequential fold, union/join flattening, where→BFQ
  * merge) run in [[Rewrites.resolve]].
  */
object Ast {

  // ---- constants (grammar `constant`; mql10.py:840-890) ----
  sealed trait Const { def value: Any }
  case class IntC(v: Long) extends Const { def value: Any = v }
  case class FloatC(v: Double) extends Const { def value: Any = v }
  case class StringC(v: String) extends Const { def value: Any = v }
  case class BoolC(v: Boolean) extends Const { def value: Any = v }
  /** `date("Y-M-D")` — epoch seconds of midnight; comparisons expand to a
    * 24h window at parse time (mql10.py:1052-1082), so this never reaches
    * the planner. */
  case class DateC(epoch: Double) extends Const { def value: Any = epoch }

  // ---- scalars: the LHS of a predicate (grammar `scalar`) ----
  sealed trait Scalar { def name: String }
  /** dotted metadata key, e.g. `core.runs` (top-level key, dots included) */
  case class MetaAttr(name: String) extends Scalar
  /** dot-less fixed attribute (whitelist `metacat/common/attributes.py`) */
  case class ObjectAttr(name: String) extends Scalar
  /** `a.b[any]` — ∃ element (array elements or dict values) */
  case class ArrayAny(name: String) extends Scalar
  /** `a.b[all]` — eliminated at parse time via ¬∃¬ (mql10.py:999-1027);
    * never reaches the planner. */
  case class ArrayAll(name: String) extends Scalar
  case class SubscriptInt(name: String, i: Int) extends Scalar
  case class SubscriptKey(name: String, key: String) extends Scalar
  /** `len(a.b)` */
  case class ArrayLen(name: String) extends Scalar

  // ---- meta expressions (grammar `meta_exp`) ----
  // Truth table (meta_evaluator.py:107-160 + docs/mql.rst:515-538): each
  // atom evaluates RAW (missing key / type mismatch / bad subscript => false)
  // and the `neg` flag applies AFTER: result = raw XOR neg.
  sealed trait MetaExp
  case class MAnd(cs: List[MetaExp]) extends MetaExp
  case class MOr(cs: List[MetaExp]) extends MetaExp
  /** op ∈ < <= > >= == != ~ ~* !~ !~* (=/!== canonicalized) */
  case class Cmp(left: Scalar, op: String, right: Const, neg: Boolean = false) extends MetaExp
  /** `elemInverted` (only with an ArrayAny left, produced by the `[all]`
    * conversion): the per-ELEMENT predicate is complemented before the ∃,
    * so `a[all] in S` ≡ ¬∃ elem ∉ S is representable — the reference's
    * backends disagree here (`meta_dnf.py` not_in_set vs
    * `meta_evaluator.py`); we implement the set-algebraic reading. */
  case class InRange(left: Scalar, lo: Const, hi: Const, neg: Boolean = false,
      elemInverted: Boolean = false) extends MetaExp
  case class InSet(left: Scalar, vals: List[Const], neg: Boolean = false,
      elemInverted: Boolean = false) extends MetaExp
  case class Present(name: String, neg: Boolean = false) extends MetaExp

  // ---- dataset specs (grammar `dataset_spec`) ----
  // `namespace` is None until [[Rewrites.resolve]] applies the `with
  // namespace=` scope / default namespace.
  sealed trait DsSpec { def namespace: Option[String]; def withNs(ns: String): DsSpec }
  case class DsExact(namespace: Option[String], name: String) extends DsSpec {
    def withNs(ns: String): DsSpec = copy(namespace = Some(ns))
  }
  /** `matching ns:pat` with `* ?` translated to SQL `% _` (mql10.py:1290-1299) */
  case class DsPattern(namespace: Option[String], like: String) extends DsSpec {
    def withNs(ns: String): DsSpec = copy(namespace = Some(ns))
  }
  /** `matching regexp ns:"re"` — unanchored regex on name */
  case class DsRegexp(namespace: Option[String], re: String) extends DsSpec {
    def withNs(ns: String): DsSpec = copy(namespace = Some(ns))
  }

  /** one element of a dataset_query_list */
  case class DatasetSel(
      spec: DsSpec,
      withSubsets: Boolean = false,
      recursively: Boolean = false,
      having: Option[MetaExp] = None)

  // ---- file queries (grammar `file_query`) ----
  sealed trait FileQ
  /** `files [from ds,…]` + where/skip/limit/ordered merged in by
    * [[Rewrites.resolve]] (dbobjects2.py:239-303). Empty `datasets` = full
    * scan. */
  case class Bfq(
      datasets: List[DatasetSel],
      where: Option[MetaExp] = None,
      skip: Long = 0,
      limit: Option[Long] = None,
      ordered: Boolean = false) extends FileQ
  /** `files ns:n,…` / `fids id,…` — point lookups, always id-ordered
    * (dbobjects2.py:306-345). `dids` xor `fids` populated. */
  case class FileListQ(
      dids: List[(Option[String], String)],
      fids: List[String],
      skip: Long = 0,
      limit: Option[Long] = None) extends FileQ
  /** `files selected by ns:name` — spliced by [[Rewrites.resolve]]
    * (mql10.py:907-923); never reaches the planner. */
  case class NamedQ(namespace: Option[String], name: String) extends FileQ
  /** `with namespace="x" q` (docs/mql.rst:405-472) — consumed by resolve. */
  case class WithNsQ(ns: String, q: FileQ) extends FileQ
  case class UnionQ(qs: List[FileQ]) extends FileQ
  /** `join(...)` = set intersection by fid */
  case class JoinQ(qs: List[FileQ]) extends FileQ
  case class MinusQ(l: FileQ, r: FileQ) extends FileQ
  case class ParentsOf(q: FileQ) extends FileQ
  case class ChildrenOf(q: FileQ) extends FileQ
  /** `where` that was not merged into a BFQ (e.g. above skip/limit) */
  case class WhereQ(q: FileQ, exp: MetaExp) extends FileQ
  case class SkipLimitQ(q: FileQ, skip: Long, limit: Option[Long]) extends FileQ
  case class OrderedQ(q: FileQ) extends FileQ
  /** `filter name(params)(queries)` — server-side stream transform
    * (filters.py:27-199) */
  case class FilterQ(
      name: String,
      params: List[Const],
      kw: Map[String, Const],
      qs: List[FileQ]) extends FileQ
  case object EmptyQ extends FileQ

  // ---- top-level queries ----
  sealed trait TopQ
  case class TopFileQ(q: FileQ) extends TopQ
  case class TopDatasetQ(sels: List[DatasetSel]) extends TopQ
  /** `queries [matching pat] [where meta]`; Left=like-pattern, Right=regexp */
  case class TopQueryQ(pattern: Option[Either[DsPattern, DsRegexp]],
      where: Option[MetaExp]) extends TopQ

  /** skip/limit sequential-composition fold — `_merge_skip_limit`
    * (mql10.py:39-45): applied in WRITTEN order, so `limit 50 skip 50` ⇒
    * empty (docs/mql.rst:749-804). */
  def mergeSkipLimit(existingSkip: Long, existingLimit: Option[Long],
      skip: Long = 0, limit: Option[Long] = None): (Long, Option[Long]) =
    existingLimit match {
      case None => (existingSkip + skip, limit)
      case Some(el) =>
        val reduced = math.max(0L, el - skip)
        (existingSkip + skip, Some(limit.fold(reduced)(l => math.min(reduced, l))))
    }
}
