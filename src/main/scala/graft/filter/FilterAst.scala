package graft.filter

/** Filter-language AST (reference: src/ribfilter.rs:108-217 `FilterItem`,
  * `FilterASPath`, `FilterExtComm`, `FilterTerm`). */

final case class V4Net(addr: Long, plen: Int) {
  def firstAddr: Long = addr & netMask
  def lastAddr: Long = firstAddr | (~netMask & 0xFFFFFFFFL)
  def netMask: Long = if (plen <= 0) 0L else (0xFFFFFFFFL << (32 - plen)) & 0xFFFFFFFFL
  override def toString: String = graft.model.Model.v4Str(addr, plen)
}

final case class V6Net(hi: Long, lo: Long, plen: Int)

sealed trait AsPathMatch
object AsPathMatch {
  case object Empty extends AsPathMatch
  final case class Contains(asns: Seq[Long]) extends AsPathMatch
  final case class StartsWith(asns: Seq[Long]) extends AsPathMatch
  final case class EndsWith(asns: Seq[Long]) extends AsPathMatch
  final case class FullMatch(asns: Seq[Long]) extends AsPathMatch
}

sealed trait ExtCommMatch
object ExtCommMatch {
  final case class Num(n: Long) extends ExtCommMatch
  final case class PairNum(a: Long, b: Long) extends ExtCommMatch
  final case class IPv4(net: V4Net) extends ExtCommMatch
  final case class PairNumIP(net: V4Net, n: Long) extends ExtCommMatch
}

sealed trait FilterItem
object FilterItem {
  /** v4/v6 route prefix; `multicast` mirrors the parse-time MCV4/MCV6
    * auto-classification (reference: src/ribfilter.rs:1000-1009). */
  final case class V4(net: V4Net, multicast: Boolean) extends FilterItem
  final case class V6(net: V6Net, multicast: Boolean) extends FilterItem
  final case class NhV4(net: V4Net) extends FilterItem
  final case class NhV6(net: V6Net) extends FilterItem
  final case class RdEq(rdh: Long, rdl: Long) extends FilterItem
  final case class AsPath(m: AsPathMatch) extends FilterItem
  final case class Comm(a: Int, b: Int) extends FilterItem
  final case class Num(n: Long) extends FilterItem
  final case class Regexp(re: String) extends FilterItem
  final case class ExtComm(m: ExtCommMatch) extends FilterItem
}

/** Term kind drives the conjunction bookkeeping (reference:
  * src/ribfilter.rs:156-198): only plain V4/V6 prefix terms are
  * route-kind; everything else (incl. MCV4/MCV6) counts as attr-kind. */
sealed trait ItemKind
object ItemKind {
  case object Net extends ItemKind
  case object Host extends ItemKind
  case object Attr extends ItemKind

  def of(item: FilterItem): ItemKind = item match {
    case FilterItem.V4(n, false) => if (n.plen < 32) Net else Host
    case FilterItem.V6(n, false) => if (n.plen < 128) Net else Host
    case _ => Attr
  }
}

/** Polarity: None = soft/auto, Plus = must-match, Minus = must-not
  * (reference: `FilterTerm.predicate`, src/ribfilter.rs:1516-1546). */
sealed trait Polarity
object Polarity {
  case object Auto extends Polarity
  case object Plus extends Polarity
  case object Minus extends Polarity
}

final case class FilterTerm(item: FilterItem, polarity: Polarity)

final case class RouteFilter(terms: Seq[FilterTerm]) {
  def isEmpty: Boolean = terms.isEmpty

  /** Most-specific positive v4/v6 prefix term, used for range pruning
    * (reference: `find_least_subnet`, src/ribfilter.rs:830-865). */
  def leastSubnet: Option[FilterItem] = {
    var ret: Option[FilterItem] = None
    terms.foreach { t =>
      if (t.polarity != Polarity.Minus) t.item match {
        case v @ FilterItem.V4(r, false) => ret match {
          case None => ret = Some(v)
          case Some(FilterItem.V4(lv, _)) => if (r.plen > lv.plen) ret = Some(v)
          case _ => ()
        }
        case v @ FilterItem.V6(r, false) => ret match {
          case None => ret = Some(v)
          case Some(FilterItem.V6(lv, _)) => if (r.plen > lv.plen) ret = Some(v)
          case _ => ret = Some(v)
        }
        case _ => ()
      }
    }
    ret
  }
}
