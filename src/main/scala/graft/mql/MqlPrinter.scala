package graft.mql

import Ast._

/** Prints a (normalized) MQL AST back to concrete syntax. Used by tests
  * for print→parse→resolve round-trip fuzzing, and handy for logging the
  * resolved form of a query. Inverse of parse+resolve for ASTs in the
  * normalized forms the resolver produces. */
object MqlPrinter {

  def print(top: TopQ): String = top match {
    case TopFileQ(q) => file(q)
    case TopDatasetQ(sels) => "datasets " + sels.map(sel).mkString(", ")
    case TopQueryQ(pat, where) =>
      "queries" + pat.map {
        case Left(DsPattern(ns, p)) =>
          s" matching ${ns.fold("")(_ + ":")}${p.replace("%", "*").replace("_", "?")}"
        case Right(DsRegexp(ns, re)) => s""" matching regexp ${ns.fold("")(_ + ":")}"$re""""
      }.getOrElse("") + where.map(w => s" where ${meta(w)}").getOrElse("")
  }

  def file(q: FileQ): String = q match {
    case Bfq(ds, where, skip, limit, ordered) =>
      val base = if (ds.isEmpty) "files" else "files from " + ds.map(sel).mkString(", ")
      base +
        where.map(w => s" where ${meta(w)}").getOrElse("") +
        (if (ordered) " ordered" else "") +
        (if (skip > 0) s" skip $skip" else "") +
        limit.map(l => s" limit $l").getOrElse("")
    case FileListQ(dids, fids, skip, limit) =>
      val base =
        if (fids.nonEmpty) "fids " + fids.mkString(", ")
        else "files " + dids.map { case (ns, n) => s"${ns.fold("")(_ + ":")}$n" }.mkString(", ")
      base + (if (skip > 0) s" skip $skip" else "") + limit.map(l => s" limit $l").getOrElse("")
    case NamedQ(ns, n) => s"files selected by ${ns.fold("")(_ + ":")}$n"
    case WithNsQ(ns, c) => s"""with namespace = "$ns" (${file(c)})"""
    case UnionQ(qs) => "union(" + qs.map(file).mkString(", ") + ")"
    case JoinQ(qs) => "join(" + qs.map(file).mkString(", ") + ")"
    case MinusQ(l, r) => s"(${file(l)}) - (${file(r)})"
    case ParentsOf(c) => s"parents(${file(c)})"
    case ChildrenOf(c) => s"children(${file(c)})"
    case WhereQ(c, e) => s"(${file(c)}) where ${meta(e)}"
    case SkipLimitQ(c, s, l) =>
      s"(${file(c)})" + (if (s > 0) s" skip $s" else "") + l.map(v => s" limit $v").getOrElse("")
    case OrderedQ(c) => s"(${file(c)}) ordered"
    case FilterQ(name, params, kw, qs) =>
      val ps = params.map(const) ++ kw.toSeq.sortBy(_._1).map { case (k, v) => s"$k=${const(v)}" }
      s"filter $name(${ps.mkString(", ")})(${qs.map(file).mkString(", ")})"
    case EmptyQ => "files from __empty__:__empty__ limit 0"
  }

  private def sel(s: DatasetSel): String = {
    val spec = s.spec match {
      case DsExact(ns, n) => s"${ns.fold("")(_ + ":")}$n"
      case DsPattern(ns, p) =>
        s"matching ${ns.fold("")(_ + ":")}${p.replace("%", "*").replace("_", "?")}"
      case DsRegexp(ns, re) => s"""matching regexp ${ns.fold("")(_ + ":")}"$re""""
    }
    spec +
      (if (s.withSubsets && s.recursively) " with subsets recursively"
      else if (s.withSubsets) " with subsets" else "") +
      s.having.map(h => s" having ${meta(h)}").getOrElse("")
  }

  def meta(e: MetaExp): String = e match {
    case MAnd(cs) => cs.map(c => s"(${meta(c)})").mkString(" and ")
    case MOr(cs) => cs.map(c => s"(${meta(c)})").mkString(" or ")
    case Cmp(l, op, c, neg) =>
      val base = s"${scalar(l)} $op ${const(c)}"
      if (neg) s"!($base)" else base
    case InRange(l, lo, hi, neg, inv) =>
      // elemInverted forms print as the [all] sugar they came from
      (l, inv) match {
        case (ArrayAny(n), true) if neg => s"$n[all] in ${const(lo)}:${const(hi)}"
        case (ArrayAny(n), false) if neg => s"${scalar(l)} not in ${const(lo)}:${const(hi)}"
        case _ =>
          val base = s"${scalar(l)} ${if (neg) "not in" else "in"} ${const(lo)}:${const(hi)}"
          base
      }
    case InSet(l, vs, neg, inv) =>
      (l, inv) match {
        case (ArrayAny(n), true) if neg => s"$n[all] in (${vs.map(const).mkString(", ")})"
        case _ => s"${scalar(l)} ${if (neg) "not in" else "in"} (${vs.map(const).mkString(", ")})"
      }
    case Present(n, neg) => if (neg) s"$n not present" else s"$n present"
  }

  private def scalar(s: Scalar): String = s match {
    case MetaAttr(n) => n
    case ObjectAttr(n) => n
    case ArrayAny(n) => s"$n[any]"
    case ArrayAll(n) => s"$n[all]"
    case SubscriptInt(n, i) => s"$n[$i]"
    case SubscriptKey(n, k) => s"""$n["$k"]"""
    case ArrayLen(n) => s"len($n)"
  }

  def const(c: Const): String = c match {
    case IntC(v) => v.toString
    case FloatC(v) => {
      val s = v.toString
      if (s.contains(".") || s.contains("e") || s.contains("E")) s else s + ".0"
    }
    case StringC(v) => s""""$v""""
    case BoolC(v) => v.toString
    case DateC(_) => throw new IllegalStateException("date constants never survive parsing")
  }
}
