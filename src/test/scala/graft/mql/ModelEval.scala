package graft.mql

import Ast._

/** Clean-room model of the engine's semantics for differential testing:
  * metadata truth table + file-set algebra, in pure Scala over model rows.
  * Deliberately written from the semantics documentation, not from the
  * engine code. */
object ModelEval {

  // ---- metadata predicate truth table ----

  private def num(v: Any): Option[Double] = v match {
    case i: Long => Some(i.toDouble)
    case i: Int => Some(i.toDouble)
    case d: Double => Some(d)
    case _ => None
  }
  private def str(v: Any): Option[String] = v match {
    case s: String => Some(s); case _ => None
  }

  def cmpRaw(v: Any, op: String, c: Const): Boolean = (op, c) match {
    case ("!=", _) => !cmpRaw(v, "==", c) // complement among present values
    case (_, IntC(i)) => cmpNum(v, op, i.toDouble)
    case (_, FloatC(d)) => cmpNum(v, op, d)
    case (_, DateC(d)) => cmpNum(v, op, d)
    case (_, StringC(s)) => cmpStr(v, op, s)
    case (_, BoolC(b)) => op == "==" && (v match { case x: Boolean => x == b; case _ => false })
  }

  private def cmpNum(v: Any, op: String, d: Double): Boolean = num(v) match {
    case Some(x) => op match {
      case "==" => x == d
      case "<" => x < d
      case "<=" => x <= d
      case ">" => x > d
      case ">=" => x >= d
      case _ => false
    }
    case None => false
  }

  private def cmpStr(v: Any, op: String, s: String): Boolean = str(v) match {
    case Some(x) =>
      def re(flags: Int) = java.util.regex.Pattern.compile(s, flags).matcher(x).find()
      op match {
        case "==" => x == s
        case "<" => x < s
        case "<=" => x <= s
        case ">" => x > s
        case ">=" => x >= s
        case "~" => re(0)
        case "~*" => re(java.util.regex.Pattern.CASE_INSENSITIVE)
        case "!~" => !re(0)
        case "!~*" => !re(java.util.regex.Pattern.CASE_INSENSITIVE)
        case _ => false
      }
    case None => false
  }

  private def elems(v: Any): Option[Seq[Any]] = v match {
    case s: Seq[_] => Some(s)
    case m: Map[_, _] => Some(m.values.toSeq)
    case _ => None
  }

  def inSetRaw(v: Any, vs: List[Const]): Boolean = vs.exists(c => cmpRaw(v, "==", c))

  def inRangeRaw(v: Any, lo: Const, hi: Const): Boolean = (lo, hi) match {
    case (IntC(a), IntC(b)) => num(v).exists(x => x >= a && x <= b)
    case (FloatC(a), FloatC(b)) => num(v).exists(x => x >= a && x <= b)
    case (StringC(a), StringC(b)) => str(v).exists(x => x >= a && x <= b)
    case _ => false
  }

  def evalScalarPred(m: Map[String, Any], l: Scalar, raw: Any => Boolean): Boolean = l match {
    case MetaAttr(n) => m.get(n).exists(raw)
    // object attributes live under "@"-prefixed model keys (no metadata
    // key can start with '@' — META_NAME requires a letter)
    case ObjectAttr(n) => m.get("@" + n).exists(raw)
    case ArrayAny(n) => m.get(n).flatMap(elems).exists(_.exists(raw))
    // int subscript applies to ARRAYS only — on a dict the reference's
    // evaluator hits KeyError => false (meta_evaluator.py:143-150)
    case SubscriptInt(n, i) => m.get(n) match {
      case Some(s: Seq[_]) => s.lift(i).exists(raw)
      case _ => false
    }
    case SubscriptKey(n, k) => m.get(n) match {
      case Some(mm: Map[_, _]) => mm.asInstanceOf[Map[String, Any]].get(k).exists(raw)
      case _ => false
    }
    case ArrayLen(n) => m.get(n) match {
      case Some(s: Seq[_]) => raw(s.length.toLong)
      case _ => false
    }
    case ArrayAll(_) => throw new IllegalStateException("normalized away")
  }

  def evalMeta(m: Map[String, Any], e: MetaExp): Boolean = e match {
    case MAnd(cs) => cs.forall(evalMeta(m, _))
    case MOr(cs) => cs.exists(evalMeta(m, _))
    case Present(n, neg) => m.contains(n) ^ neg
    case Cmp(l, op, c, neg) => evalScalarPred(m, l, v => cmpRaw(v, op, c)) ^ neg
    case InRange(l, lo, hi, neg, inv) =>
      val raw: Any => Boolean =
        if (inv) v => !inRangeRaw(v, lo, hi) else v => inRangeRaw(v, lo, hi)
      evalScalarPred(m, l, raw) ^ neg
    case InSet(l, vs, neg, inv) =>
      val raw: Any => Boolean =
        if (inv) v => !inSetRaw(v, vs) else v => inSetRaw(v, vs)
      evalScalarPred(m, l, raw) ^ neg
  }

  // ---- file-set algebra over model rows keyed by fid ----

  /** one model file: fid plus its metadata dict and dataset names */
  final case class MFile(fid: String, meta: Map[String, Any], datasets: Set[String])

  def adler32(s: String): Long = {
    val a = new java.util.zip.Adler32()
    a.update(s.getBytes("UTF-8"))
    a.getValue
  }

  /** evaluate a resolved FileQ to the ordered-by-fid list of fids.
    * `all` = live files (BFQ excludes retired); `everyone` = including
    * retired (provenance hops do NOT filter retired on the hop result,
    * sql_converter.py:165-221); `parentOf` encodes the heap edges. */
  def evalFile(q: FileQ, all: Seq[MFile], everyone: Seq[MFile],
      parentOf: String => Option[String]): List[String] = {

    def byFid(fids: Iterable[String]): List[String] = fids.toList.distinct.sorted

    def go(q: FileQ): List[String] = q match {
      case Bfq(sels, where, skip, limit, ordered) =>
        val dsNames = sels.map(_.spec).collect { case DsExact(_, n) => n }.toSet
        val base = all.filter(f => sels.isEmpty || f.datasets.exists(dsNames))
        val filtered = where match {
          case Some(w) => base.filter(f => evalMeta(f.meta, w))
          case None => base
        }
        val sorted = byFid(filtered.map(_.fid))
        val paged = sorted.drop(skip.toInt)
        limit.fold(paged)(l => paged.take(l.toInt))
      case FileListQ(dids, fids, skip, limit) =>
        val hit =
          if (fids.nonEmpty) all.filter(f => fids.contains(f.fid))
          else all.filter(f => dids.exists { case (_, n) => f.meta.get("__name").contains(n) })
        val sorted = byFid(hit.map(_.fid))
        limit.fold(sorted.drop(skip.toInt))(l => sorted.drop(skip.toInt).take(l.toInt))
      case UnionQ(qs) => byFid(qs.flatMap(go))
      case JoinQ(qs) =>
        val sets = qs.map(go(_).toSet)
        byFid(sets.reduce(_ intersect _))
      case MinusQ(l, r) => byFid(go(l).toSet -- go(r).toSet)
      case ParentsOf(c) =>
        val children = go(c).toSet
        byFid(everyone.filter(f => children.exists(ch => parentOf(ch).contains(f.fid))).map(_.fid))
      case ChildrenOf(c) =>
        val parents = go(c).toSet
        byFid(everyone.filter(f => parentOf(f.fid).exists(parents)).map(_.fid))
      case WhereQ(c, e) => go(c).filter { fid =>
        everyone.find(_.fid == fid).exists(f => evalMeta(f.meta, e))
      }
      case SkipLimitQ(c, s, l) =>
        val sorted = go(c) // already fid-sorted in this model
        l.fold(sorted.drop(s.toInt))(v => sorted.drop(s.toInt).take(v.toInt))
      case OrderedQ(c) => go(c)
      case FilterQ("hash", List(IntC(m), IntC(r)), _, List(c)) =>
        go(c).filter(fid => adler32(fid) % m == r)
      case FilterQ("stride", List(IntC(m), IntC(r)), _, List(c)) =>
        go(c).zipWithIndex.filter(_._2 % m == r).map(_._1)
      case FilterQ("limit", List(IntC(n)), _, List(c)) => go(c).take(n.toInt)
      case EmptyQ => Nil
      case other => throw new IllegalStateException(s"model can't evaluate $other")
    }
    go(q)
  }
}
