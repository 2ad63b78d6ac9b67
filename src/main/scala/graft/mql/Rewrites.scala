package graft.mql

import Ast._

/** Context-dependent front-end rewrites, run after [[MqlParser]] and before
  * [[Planner]]:
  *
  *  - `with namespace=` scope application + default-namespace resolution
  *    (docs/mql.rst:405-472; mql10.py default_namespace threading)
  *  - named-query splicing with cycle detection (mql10.py:907-923 — the
  *    reference has no cycle check; we add one)
  *  - union/join n-ary flattening across splices (mql10.py:942-969)
  *  - `where` merge into BFQ, chained wheres AND-ed (mql10.py:806-814;
  *    docs/mql.rst:104-114) — blocked when the BFQ already carries
  *    skip/limit (filter-after-pagination must not commute)
  *  - sequential skip/limit fold in written order (`_merge_skip_limit`,
  *    mql10.py:39-45; `_SkipLimitApplier` mql10.py:244-346); `skip` forces
  *    `ordered` on the child (docs/mql.rst:832-850); `limit 0` ⇒ empty
  *  - empty-relation propagation (`_RemoveEmpty`, mql10.py:348-377)
  *
  * The relational pushdown the reference does in `_MetaExpPusher`
  * (mql10.py:427-475) is intentionally NOT done here: the planner emits
  * declarative DataFrame filters and Catalyst's PushDownPredicates performs
  * the same motion (SURVEY.md §4.1).
  */
object Rewrites {

  final case class MqlResolveError(msg: String) extends RuntimeException(msg)

  def resolve(top: TopQ, loader: (String, String) => Option[String],
      defaultNs: Option[String]): TopQ = top match {
    case TopFileQ(q) => TopFileQ(resolveFile(q, loader, defaultNs, Set.empty))
    case TopDatasetQ(sels) => TopDatasetQ(sels.map(resolveSel(_, defaultNs)))
    case q: TopQueryQ => q
  }

  private def resolveSel(sel: DatasetSel, ns: Option[String]): DatasetSel = {
    val spec = sel.spec.namespace match {
      case Some(_) => sel.spec
      case None => ns match {
        case Some(n) => sel.spec.withNs(n)
        case None => throw MqlResolveError(
          s"No namespace given for dataset ${sel.spec} and no default namespace set")
      }
    }
    sel.copy(spec = spec)
  }

  private def resolveFile(q: FileQ, loader: (String, String) => Option[String],
      ns: Option[String], inFlight: Set[(String, String)]): FileQ = {

    def go(q: FileQ, ns: Option[String]): FileQ = q match {
      case WithNsQ(n, child) => go(child, Some(n))

      case NamedQ(ons, name) =>
        val qns = ons.orElse(ns).getOrElse(
          throw MqlResolveError(s"No namespace given for named query $name"))
        if (inFlight((qns, name)))
          throw MqlResolveError(s"Recursive named query $qns:$name")
        val src = loader(qns, name).getOrElse(
          throw MqlResolveError(s"Named query $qns:$name not found"))
        MqlParser.parseTop(src) match {
          case TopFileQ(inner) =>
            // named queries resolve in their own scope, not the caller's
            resolveFile(inner, loader, None, inFlight + ((qns, name)))
          case _ => throw MqlResolveError(s"Named query $qns:$name must be a file query")
        }

      case b: Bfq => b.copy(datasets = b.datasets.map(resolveSel(_, ns)))

      case fl: FileListQ =>
        fl.copy(dids = fl.dids.map { case (ons, n) =>
          val rns = ons.orElse(ns).getOrElse(
            throw MqlResolveError(s"No namespace given for file $n"))
          (Some(rns), n)
        })

      case UnionQ(qs) =>
        val rs = qs.map(go(_, ns)).flatMap {
          case UnionQ(inner) => inner
          case EmptyQ => Nil
          case other => List(other)
        }
        rs match {
          case Nil => EmptyQ
          case List(one) => one
          case many => UnionQ(many)
        }

      case JoinQ(qs) =>
        val rs = qs.map(go(_, ns)).flatMap {
          case JoinQ(inner) => inner
          case other => List(other)
        }
        if (rs.contains(EmptyQ)) EmptyQ
        else rs match {
          case List(one) => one
          case many => JoinQ(many)
        }

      case MinusQ(l, r) =>
        (go(l, ns), go(r, ns)) match {
          case (EmptyQ, _) => EmptyQ
          case (lr, EmptyQ) => lr
          case (lr, rr) => MinusQ(lr, rr)
        }

      case ParentsOf(c) => go(c, ns) match {
        case EmptyQ => EmptyQ
        case rc => ParentsOf(rc)
      }
      case ChildrenOf(c) => go(c, ns) match {
        case EmptyQ => EmptyQ
        case rc => ChildrenOf(rc)
      }

      case WhereQ(c, e) => go(c, ns) match {
        case EmptyQ => EmptyQ
        case b: Bfq if b.skip == 0 && b.limit.isEmpty =>
          b.copy(where = Some(b.where.fold(e)(w => MAnd(List(w, e)))))
        case rc => WhereQ(rc, e)
      }

      case SkipLimitQ(c, s, l) => go(c, ns) match {
        case EmptyQ => EmptyQ
        case rc =>
          // fold with anything the child already carries, in written order
          val (cs, cl, inner) = rc match {
            case SkipLimitQ(i, s0, l0) => (s0, l0, i)
            case b: Bfq if b.skip != 0 || b.limit.isDefined =>
              (b.skip, b.limit, b.copy(skip = 0, limit = None))
            case fl: FileListQ if fl.skip != 0 || fl.limit.isDefined =>
              (fl.skip, fl.limit, fl.copy(skip = 0, limit = None))
            case i => (0L, None: Option[Long], i)
          }
          val (ms, ml) = mergeSkipLimit(cs, cl, s, l)
          if (ml.contains(0L)) EmptyQ
          else {
            val ordered = ms > 0 // skip forces deterministic order
            inner match {
              case b: Bfq =>
                b.copy(skip = ms, limit = ml, ordered = b.ordered || ordered)
              case fl: FileListQ => fl.copy(skip = ms, limit = ml)
              case other =>
                val base = if (ordered) forceOrdered(other) else other
                SkipLimitQ(base, ms, ml)
            }
          }
      }

      case OrderedQ(c) => go(c, ns) match {
        case EmptyQ => EmptyQ
        case b: Bfq => b.copy(ordered = true)
        case o: OrderedQ => o
        case fl: FileListQ => fl // always id-ordered (dbobjects2.py:306-345)
        case rc => OrderedQ(rc)
      }

      case FilterQ(name, params, kw, qs) =>
        FilterQ(name, params, kw, qs.map(go(_, ns)))

      case EmptyQ => EmptyQ
    }

    go(q, ns)
  }

  private def forceOrdered(q: FileQ): FileQ = q match {
    case b: Bfq => b.copy(ordered = true)
    case o: OrderedQ => o
    case fl: FileListQ => fl
    case other => OrderedQ(other)
  }
}
