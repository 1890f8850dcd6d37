package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.model.{IpPfx, Model}

/** Property-based pinning of the prefix math (SURVEY §5 plan): the native
  * IpContains expression ≡ the composed-builtins IpFns.contains on random
  * prefixes; containment is reflexive and transitive; the O2 prune
  * invariant holds. Deterministic seed, plain ScalaCheck generators. */
class IpFnsSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  private val genV4: Gen[IpPfx] = for {
    plen <- Gen.choose(0, 32)
    addr <- Gen.choose(0L, 0xFFFFFFFFL)
  } yield IpPfx(4, 0L,
    addr & (if (plen == 0) 0L else (-1L << (32 - plen)) & 0xFFFFFFFFL), plen)

  private val genV6: Gen[IpPfx] = for {
    plen <- Gen.choose(0, 128)
    hi <- Gen.choose(Long.MinValue, Long.MaxValue)
    lo <- Gen.choose(Long.MinValue, Long.MaxValue)
  } yield {
    val mh = if (plen <= 0) 0L else if (plen >= 64) -1L else -1L << (64 - plen)
    val ml = if (plen <= 64) 0L else if (plen >= 128) -1L else -1L << (128 - plen)
    IpPfx(6, hi & mh, lo & ml, plen)
  }

  private val genPfx: Gen[IpPfx] = Gen.oneOf(genV4, genV6)

  /** Scala-side oracle (the expression's own kernel — independently checked
    * against hand values below, then used to cross-check Spark eval). */
  private def containsRef(net: IpPfx, route: IpPfx): Boolean =
    IpContains.contains(net.version, net.ip_hi, net.ip_lo, net.prefix_len,
      route.version, route.ip_hi, route.ip_lo, route.prefix_len)

  test("kernel hand-value goldens") {
    def v4(s: String, p: Int) = Model.v4(s, p)
    assert(containsRef(v4("10.0.0.0", 8), v4("10.1.2.3", 32)))
    assert(!containsRef(v4("10.0.0.0", 8), v4("11.0.0.0", 8)))
    assert(!containsRef(v4("10.0.0.0", 24), v4("10.0.0.0", 8)))
    assert(containsRef(v4("0.0.0.0", 0), v4("255.255.255.255", 32)))
    assert(containsRef(Model.v6(0x2001000000000000L, 0L, 48),
      Model.v6(0x2001000000001234L, 5L, 128)))
    assert(!containsRef(Model.v6(0x2001000000000000L, 0L, 48),
      Model.v6(0x2002000000000000L, 0L, 64)))
  }

  test("native expression equals composed builtins on random prefix pairs") {
    val s = spark
    import s.implicits._
    val pairs = samples(Gen.zip(genPfx, genPfx), 300)
    val df = pairs.toDF("net", "route")
    val got = df.select(
      IpContains(col("net"), col("route")).as("native"),
      IpFns.contains(col("net"), col("route")).as("composed")).collect()
    got.zip(pairs).foreach { case (r, (net, route)) =>
      assert(r.getBoolean(0) == r.getBoolean(1),
        s"native != composed for $net ⊇ $route")
      assert(r.getBoolean(0) == containsRef(net, route),
        s"spark != scala oracle for $net ⊇ $route")
    }
  }

  test("containment is reflexive and transitive (a⊇b ∧ b⊇c ⇒ a⊇c)") {
    samples(genPfx, 200).foreach(p => assert(containsRef(p, p)))
    // bias towards related prefixes so the premise fires: derive b,c by
    // lengthening a's prefix
    samples(Gen.zip(genV4, Gen.choose(0, 8), Gen.choose(0, 8)), 300)
      .foreach { case (a, d1, d2) =>
        val b = IpPfx(4, 0L, a.ip_lo, math.min(32, a.prefix_len + d1))
        val c = IpPfx(4, 0L, b.ip_lo, math.min(32, b.prefix_len + d1 + d2))
        if (containsRef(a, b) && containsRef(b, c)) assert(containsRef(a, c))
      }
  }

  test("O2 prune invariant: contained routes lie within the subnet range") {
    val nets = samples(genV4, 100)
    val routes = samples(genV4, 100)
    for (net <- nets; r <- routes if containsRef(net, r)) {
      val mask = if (net.prefix_len == 0) 0L else (-1L << (32 - net.prefix_len)) & 0xFFFFFFFFL
      val first = net.ip_lo & mask
      val last = first | (~mask & 0xFFFFFFFFL)
      assert(r.ip_lo >= first && r.ip_lo <= last)
    }
  }

  test("family mismatch never contains") {
    samples(Gen.zip(genV4, genV6), 100).foreach { case (a, b) =>
      assert(!containsRef(a, b) && !containsRef(b, a))
    }
  }

  test("v6 display is RFC-5952 compressed (reference Display goldens)") {
    val s = spark
    import s.implicits._
    // longest run of ≥2 zero groups → '::', leftmost on tie, no single-zero
    // compression (reference renders Rust Ipv6Addr Display,
    // src/ribfilter.rs:1655-1758 exercises the compressed forms)
    val cases = Seq(
      (graft.model.Model.v6(0x20010db800000000L, 1L, 128), "2001:db8::1/128"),
      (graft.model.Model.v6(0L, 0L, 0), "::/0"),
      (graft.model.Model.v6(0L, 1L, 128), "::1/128"),
      (graft.model.Model.v6(0x2c0aL << 48, 0L, 16), "2c0a::/16"),
      (graft.model.Model.v6(0x2001000000000001L, 1L, 128), "2001:0:0:1::1/128"),
      (graft.model.Model.v6(0x2001000000000001L, 0x0001000000000001L, 128),
        "2001::1:1:0:0:1/128"),
      (graft.model.Model.v6(0x2001000000010001L, 0x0001000100010001L, 128),
        "2001:0:1:1:1:1:1:1/128"))
    cases.foreach { case (p, want) =>
      assert(graft.model.Model.pfxStr(p) == want, s"model form of $p")
    }
    val got = cases.map(c => Tuple1(c._1)).toDF("p")
      .select(IpFns.pfxStr(col("p"))).as[String].collect().toSeq
    assert(got == cases.map(_._2), "column form")
  }

  test("display strings match the canonical model form") {
    val s = spark
    import s.implicits._
    val ps = samples(genPfx, 50)
    val got = ps.map(Tuple1(_)).toDF("p").select(IpFns.pfxStr(col("p"))).as[String].collect()
    got.zip(ps).foreach { case (str, p) => assert(str == Model.pfxStr(p)) }
  }

  test("native display kernel equals the composed-builtins form") {
    val s = spark
    import s.implicits._
    // three independent implementations agree: the native PfxDisplay kernel
    // (codegen + interpreted eval), the unrolled when-chain column form, and
    // the Scala model renderer
    val ps = samples(genPfx, 400)
    val rows = ps.map(Tuple1(_)).toDF("p")
      .select(IpFns.addrStr(col("p")).as("native"),
        IpFns.addrStrComposed(col("p")).as("composed"))
      .collect()
    rows.zip(ps).foreach { case (r, p) =>
      assert(r.getString(0) == r.getString(1), s"native != composed for $p")
    }
    // interpreted path (eval without codegen) agrees with the model form
    ps.foreach { p =>
      val got = PfxDisplay.render(p.version.toByte, p.ip_hi, p.ip_lo,
        p.prefix_len, withLen = true).toString
      assert(got == Model.pfxStr(p), s"interpreted eval of $p")
    }
  }
}
