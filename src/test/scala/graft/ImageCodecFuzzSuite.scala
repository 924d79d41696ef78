package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import graft.multimodal.ImageCodec._

/** ScalaCheck fuzz of the codec contract. The Int-overflow class of bug
  * (crafted "P6 100000 100000" headers, BMP widths like 0x40000000) was
  * found live once already and fixed by hand-picked cases; this suite
  * generalizes those to generated inputs: for ANY payload — random bytes,
  * valid encodings, and byte-mutated/truncated valid encodings — decode
  * must never throw, and `grayEmbedding` must return the fixed-dim vector
  * with every value in [0, 1] (the zero vector whenever decode rejects).
  * Seeded generation keeps failures reproducible.
  */
class ImageCodecFuzzSuite extends org.scalatest.funsuite.AnyFunSuite {

  private val params = SCTest.Parameters.default
    .withMinSuccessfulTests(500)
    .withInitialSeed(org.scalacheck.rng.Seed(42L))

  private def run(name: String, prop: Prop): Unit = {
    val res = SCTest.check(params, prop)
    assert(res.passed, s"$name: $res")
  }

  private val genImage: Gen[Image] = for {
    w <- Gen.choose(1, 24)
    h <- Gen.choose(1, 24)
    seed <- Gen.choose(0, 1000)
  } yield Image(w, h,
    Array.tabulate(w * h * 3)(i => ((i * 31 + seed * 17) % 256).toByte))

  private val genValid: Gen[Array[Byte]] = for {
    img <- genImage
    ppm <- Gen.oneOf(true, false)
  } yield if (ppm) encodePpm(img) else encodeBmp(img)

  /** Valid encoding with 1-8 random byte overwrites, then truncated to a
    * random prefix — the header/bounds corruption space. */
  private val genMutated: Gen[Array[Byte]] = for {
    base <- genValid
    nMut <- Gen.choose(1, 8)
    muts <- Gen.listOfN(nMut,
      Gen.zip(Gen.choose(0, base.length - 1), Gen.choose(-128, 127)))
    trunc <- Gen.choose(0, base.length)
  } yield {
    val b = java.util.Arrays.copyOf(base, base.length)
    muts.foreach { case (i, v) => b(i) = v.toByte }
    java.util.Arrays.copyOf(b, trunc)
  }

  private val genRandom: Gen[Array[Byte]] = Gen.choose(0, 4096)
    .flatMap(n => Gen.listOfN(n, Gen.choose(-128, 127)))
    .map(_.map(_.toByte).toArray)

  private val codec = grayEmbedding(4)

  /** Never throws; fixed dim; every value in [0,1] (NaN fails the range). */
  private def contractHolds(bytes: Array[Byte]): Prop = {
    val v = codec(bytes)
    Prop(v.length == 16 && v.forall(x => x >= 0.0f && x <= 1.0f))
  }

  test("contract holds on arbitrary random byte payloads") {
    run("random", Prop.forAll(genRandom)(contractHolds))
  }

  test("contract holds on byte-mutated / truncated valid encodings") {
    run("mutated", Prop.forAll(genMutated)(contractHolds))
  }

  test("valid encodings roundtrip pixel-exact through both containers") {
    run("roundtrip", Prop.forAll(genImage) { img =>
      val p = decode(encodePpm(img)).get
      val b = decode(encodeBmp(img)).get
      Prop(p.width == img.width && p.height == img.height &&
        p.rgb.sameElements(img.rgb) &&
        b.width == img.width && b.height == img.height &&
        b.rgb.sameElements(img.rgb))
    })
  }

  test("decode rejection and the zero-vector contract agree on every input") {
    run("zero-contract", Prop.forAll(genMutated) { bytes =>
      decode(bytes) match {
        case None => Prop(codec(bytes).forall(_ == 0.0f))
        case Some(img) => Prop(img.width > 0 && img.height > 0 &&
          img.rgb.length.toLong == img.width.toLong * img.height * 3)
      }
    })
  }
}
