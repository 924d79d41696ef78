package graft.core

/** Distance metric inventory of the reference engine, re-expressed as plain
  * JVM functions over `Array[Float]` with double accumulation.
  *
  * Metric list mirrors `cuvs/distance/distance.hpp:19-67` (23 entries; the
  * Expanded/Unexpanded pairs are execution strategies with identical
  * semantics, collapsed here — see SURVEY.md §2.2). Definitions follow the
  * public scipy.spatial.distance conventions the reference tests against.
  *
  * `isMinClose` mirrors `distance.hpp:72-85`: every metric is
  * smaller-is-closer except InnerProduct (larger-is-closer).
  */
sealed abstract class Metric(val name: String) extends Serializable
object Metric {
  case object L2        extends Metric("l2")         // squared euclidean (L2Expanded)
  case object L2Sqrt    extends Metric("l2sqrt")     // euclidean (L2SqrtExpanded)
  case object InnerProduct extends Metric("ip")
  case object Cosine    extends Metric("cosine")
  case object L1        extends Metric("l1")
  case object Linf      extends Metric("linf")
  case object Canberra  extends Metric("canberra")
  case object Lp        extends Metric("lp")         // Minkowski; power via metricArg
  case object Correlation extends Metric("correlation")
  case object Jaccard   extends Metric("jaccard")    // weighted: 1 - sum(min)/sum(max)
  case object Hellinger extends Metric("hellinger")
  case object Haversine extends Metric("haversine")  // 2-d (lat, lon) radians
  case object BrayCurtis extends Metric("braycurtis")
  case object JensenShannon extends Metric("jensenshannon")
  case object Hamming   extends Metric("hamming")    // fraction of unequal dims
  case object KLDivergence extends Metric("kl")
  case object RusselRao extends Metric("russelrao")
  case object Dice      extends Metric("dice")
  case object BitwiseHamming extends Metric("bitwisehamming") // over packed bytes

  val all: Seq[Metric] = Seq(L2, L2Sqrt, InnerProduct, Cosine, L1, Linf,
    Canberra, Lp, Correlation, Jaccard, Hellinger, Haversine, BrayCurtis,
    JensenShannon, Hamming, KLDivergence, RusselRao, Dice, BitwiseHamming)

  def fromName(n: String): Metric =
    all.find(_.name == n).getOrElse(throw new IllegalArgumentException(s"unknown metric $n"))

  /** distance.hpp:72-85 — sort direction of "closer". */
  def isMinClose(m: Metric): Boolean = m != InnerProduct
}

object Distance extends Serializable {

  /** Dispatch once, returning a reusable binary function (hot loops should
    * call the specialized functions below directly). */
  def fn(m: Metric, metricArg: Double = 2.0): (Array[Float], Array[Float]) => Double = m match {
    case Metric.L2           => l2
    case Metric.L2Sqrt       => l2Sqrt
    case Metric.InnerProduct => innerProduct
    case Metric.Cosine       => cosine
    case Metric.L1           => l1
    case Metric.Linf         => linf
    case Metric.Canberra     => canberra
    case Metric.Lp           => (a, b) => lp(a, b, metricArg)
    case Metric.Correlation  => correlation
    case Metric.Jaccard      => jaccard
    case Metric.Hellinger    => hellinger
    case Metric.Haversine    => haversine
    case Metric.BrayCurtis   => brayCurtis
    case Metric.JensenShannon => jensenShannon
    case Metric.Hamming      => hamming
    case Metric.KLDivergence => klDivergence
    case Metric.RusselRao    => russelRao
    case Metric.Dice         => dice
    case Metric.BitwiseHamming =>
      throw new IllegalArgumentException("bitwisehamming operates on packed BinaryType; use Distance.bitwiseHamming")
  }

  // -- hot four ---------------------------------------------------------

  /** Squared euclidean. */
  def l2(a: Array[Float], b: Array[Float]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { val d = a(i).toDouble - b(i); s += d * d; i += 1 }
    s
  }

  def l2Sqrt(a: Array[Float], b: Array[Float]): Double = math.sqrt(l2(a, b))

  /** Squared-L2 partial sum with early abort once strictly past `bnd`:
    * the sum is monotone, so any return > bnd proves the true distance is
    * too — callers treat that as a rejection and must not use the
    * truncated value as a distance. Ties (== bnd) complete exactly, so
    * the (dist, id) tiebreak downstream still sees them. */
  def l2UpTo(a: Array[Float], b: Array[Float], bnd: Double): Double = {
    var s = 0.0
    var i = 0
    val len = a.length
    while (i < len) {
      val d = a(i).toDouble - b(i)
      s += d * d
      if (s > bnd) return s
      i += 1
    }
    s
  }

  def innerProduct(a: Array[Float], b: Array[Float]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { s += a(i).toDouble * b(i); i += 1 }
    s
  }

  /** 1 - cos(a, b); 1.0 if either norm is zero (scipy convention would be
    * NaN; we pin a total value for deterministic top-k). */
  def cosine(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) {
      val x = a(i).toDouble; val y = b(i).toDouble
      dot += x * y; na += x * x; nb += y * y; i += 1
    }
    if (na == 0.0 || nb == 0.0) 1.0 else 1.0 - dot / math.sqrt(na * nb)
  }

  // -- the rest ---------------------------------------------------------

  def l1(a: Array[Float], b: Array[Float]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { s += math.abs(a(i).toDouble - b(i)); i += 1 }
    s
  }

  def linf(a: Array[Float], b: Array[Float]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { val d = math.abs(a(i).toDouble - b(i)); if (d > s) s = d; i += 1 }
    s
  }

  def canberra(a: Array[Float], b: Array[Float]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) {
      val num = math.abs(a(i).toDouble - b(i))
      val den = math.abs(a(i).toDouble) + math.abs(b(i).toDouble)
      if (den != 0.0) s += num / den
      i += 1
    }
    s
  }

  def lp(a: Array[Float], b: Array[Float], p: Double): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { s += math.pow(math.abs(a(i).toDouble - b(i)), p); i += 1 }
    math.pow(s, 1.0 / p)
  }

  /** 1 - Pearson correlation of the two vectors. */
  def correlation(a: Array[Float], b: Array[Float]): Double = {
    val n = a.length
    var ma = 0.0; var mb = 0.0; var i = 0
    while (i < n) { ma += a(i); mb += b(i); i += 1 }
    ma /= n; mb /= n
    var dot = 0.0; var na = 0.0; var nb = 0.0
    i = 0
    while (i < n) {
      val x = a(i) - ma; val y = b(i) - mb
      dot += x * y; na += x * x; nb += y * y; i += 1
    }
    if (na == 0.0 || nb == 0.0) 1.0 else 1.0 - dot / math.sqrt(na * nb)
  }

  /** Weighted Jaccard distance: 1 - sum(min)/sum(max) (for nonneg data). */
  def jaccard(a: Array[Float], b: Array[Float]): Double = {
    var smin = 0.0; var smax = 0.0; var i = 0
    while (i < a.length) {
      val x = a(i).toDouble; val y = b(i).toDouble
      smin += math.min(x, y); smax += math.max(x, y); i += 1
    }
    if (smax == 0.0) 0.0 else 1.0 - smin / smax
  }

  /** sqrt(1 - sum(sqrt(a_i * b_i))) clamped at 0, for distributions. */
  def hellinger(a: Array[Float], b: Array[Float]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { s += math.sqrt(a(i).toDouble * b(i)); i += 1 }
    math.sqrt(math.max(0.0, 1.0 - s))
  }

  /** Great-circle distance; vectors are (lat, lon) in radians, unit sphere. */
  def haversine(a: Array[Float], b: Array[Float]): Double = {
    require(a.length == 2 && b.length == 2, "haversine requires 2-d (lat, lon)")
    // widen BEFORE subtracting: float subtraction here loses ~1e-8 relative
    // precision, enough to flip a 4dp-rounded output against the oracle
    val dlat = (a(0).toDouble - b(0).toDouble) / 2
    val dlon = (a(1).toDouble - b(1).toDouble) / 2
    val h = math.pow(math.sin(dlat), 2) +
      math.cos(a(0).toDouble) * math.cos(b(0).toDouble) * math.pow(math.sin(dlon), 2)
    2 * math.asin(math.sqrt(math.min(1.0, h)))
  }

  def brayCurtis(a: Array[Float], b: Array[Float]): Double = {
    var num = 0.0; var den = 0.0; var i = 0
    while (i < a.length) {
      num += math.abs(a(i).toDouble - b(i))
      den += math.abs(a(i).toDouble + b(i))
      i += 1
    }
    if (den == 0.0) 0.0 else num / den
  }

  /** sqrt(JS divergence), natural log. */
  def jensenShannon(a: Array[Float], b: Array[Float]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) {
      val x = a(i).toDouble; val y = b(i).toDouble
      val m = (x + y) / 2
      if (x > 0.0 && m > 0.0) s += x * math.log(x / m) / 2
      if (y > 0.0 && m > 0.0) s += y * math.log(y / m) / 2
      i += 1
    }
    math.sqrt(math.max(0.0, s))
  }

  /** Fraction of positions that differ. */
  def hamming(a: Array[Float], b: Array[Float]): Double = {
    var c = 0; var i = 0
    while (i < a.length) { if (a(i) != b(i)) c += 1; i += 1 }
    c.toDouble / a.length
  }

  /** sum(a * log(a/b)); terms with a=0 contribute 0. */
  def klDivergence(a: Array[Float], b: Array[Float]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) {
      val x = a(i).toDouble; val y = b(i).toDouble
      if (x > 0.0 && y > 0.0) s += x * math.log(x / y)
      i += 1
    }
    s
  }

  /** Boolean Russell-Rao: (n - ntt)/n with truthiness = nonzero. */
  def russelRao(a: Array[Float], b: Array[Float]): Double = {
    var ntt = 0; var i = 0
    while (i < a.length) { if (a(i) != 0f && b(i) != 0f) ntt += 1; i += 1 }
    (a.length - ntt).toDouble / a.length
  }

  /** Boolean Dice dissimilarity. */
  def dice(a: Array[Float], b: Array[Float]): Double = {
    var ntt = 0; var nta = 0; var ntb = 0; var i = 0
    while (i < a.length) {
      val x = a(i) != 0f; val y = b(i) != 0f
      if (x && y) ntt += 1
      if (x) nta += 1
      if (y) ntb += 1
      i += 1
    }
    val den = nta + ntb
    if (den == 0) 0.0 else (den - 2.0 * ntt) / den
  }

  /** Hamming popcount over bit-packed byte arrays (BitwiseHamming,
    * distance.hpp:61-62). */
  def bitwiseHamming(a: Array[Byte], b: Array[Byte]): Double = {
    var c = 0; var i = 0
    while (i < a.length) {
      c += java.lang.Integer.bitCount((a(i) ^ b(i)) & 0xff); i += 1
    }
    c.toDouble
  }

  /** L2 norm of a vector (materialized `norm` column at index build,
    * brute_force.hpp:59-70 analog). */
  def norm(a: Array[Float]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { s += a(i).toDouble * a(i); i += 1 }
    math.sqrt(s)
  }
}
