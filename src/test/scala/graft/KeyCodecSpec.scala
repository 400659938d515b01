package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.core.KeyCodec

/** Order-preserving tuple codec properties. The reference's compound-key
  * tests (/root/reference/test/compound-keys.js) require element-wise
  * ordering; here we additionally require the byte encoding to agree with
  * the typed tuple order under unsigned lexicographic compare — that is
  * what makes `list()` a parquet-prunable binary range at scale.
  * Property-style via a seeded generator (scalatestplus isn't in the
  * offline cache).
  */
class KeyCodecSpec extends AnyFunSuite {

  private val rnd = new scala.util.Random(42)

  private def randElem(): Any = rnd.nextInt(6) match {
    case 0 => null
    case 1 => rnd.nextBoolean()
    case 2 => (rnd.nextDouble() - 0.5) * 2e12
    case 3 => rnd.nextInt(2000001) - 1000000
    case 4 => rnd.alphanumeric.take(rnd.nextInt(8)).mkString
    case 5 => Seq.fill(rnd.nextInt(6))("ab zé".charAt(rnd.nextInt(5))).mkString
  }

  private def randKey(): Seq[Any] = Seq.fill(1 + rnd.nextInt(4))(randElem())

  /** Reference typed order: null < false < true < number < string. */
  private def typeRank(v: Any): Int = v match {
    case null => 0
    case false => 1
    case true => 2
    case _: Double => 3
    case _: String => 4
    case other => throw new IllegalArgumentException(other.toString)
  }

  private def cmpElem(a: Any, b: Any): Int = {
    val r = typeRank(a).compareTo(typeRank(b))
    if (r != 0) r
    else (a, b) match {
      case (x: Double, y: Double) => java.lang.Double.compare(x, y)
      case (x: String, y: String) =>
        // UTF-8 byte (codepoint) order, not UTF-16 char order
        java.util.Arrays.compareUnsigned(x.getBytes("UTF-8"), y.getBytes("UTF-8"))
      case _ => 0
    }
  }

  private def cmpKey(a: Seq[Any], b: Seq[Any]): Int = {
    a.zip(b).foreach { case (x, y) =>
      val r = cmpElem(norm(x), norm(y)); if (r != 0) return r
    }
    a.size.compareTo(b.size)
  }

  private def norm(v: Any): Any = v match {
    case n: Int => n.toDouble
    case n: Long => n.toDouble
    case other => other
  }

  test("roundtrip: decode(encode(k)) == normalized k (1000 random keys)") {
    (1 to 1000).foreach { _ =>
      val k = randKey()
      assert(KeyCodec.decode(KeyCodec.encode(k)) == k.map(norm).toVector, s"k=$k")
    }
  }

  test("byte order == typed tuple order (2000 random pairs)") {
    (1 to 2000).foreach { _ =>
      val a = randKey(); val b = randKey()
      val byBytes = Integer.signum(KeyCodec.compare(KeyCodec.encode(a), KeyCodec.encode(b)))
      val byTuple = Integer.signum(cmpKey(a, b))
      assert(byBytes == byTuple, s"a=$a b=$b bytes=$byBytes tuple=$byTuple")
    }
  }

  test("prefix keys sort before their extensions") {
    assert(KeyCodec.compare(
      KeyCodec.encode(Seq("a")), KeyCodec.encode(Seq("a", 0.0))) < 0)
    assert(KeyCodec.compare(
      KeyCodec.encode(Seq("ford", 1.0)), KeyCodec.encode(Seq("ford", 2.0))) < 0)
    assert(KeyCodec.compare(
      KeyCodec.encode(Seq("chevy", 99.0)), KeyCodec.encode(Seq("ford", 1.0))) < 0)
  }

  test("numbers order numerically, not lexicographically") {
    assert(KeyCodec.compare(
      KeyCodec.encode(Seq(2.0)), KeyCodec.encode(Seq(10.0))) < 0)
    assert(KeyCodec.compare(
      KeyCodec.encode(Seq(-3.0)), KeyCodec.encode(Seq(2.0))) < 0)
    assert(KeyCodec.compare(
      KeyCodec.encode(Seq(-10.5)), KeyCodec.encode(Seq(-2.5))) < 0)
  }

  test("strings with embedded NUL roundtrip and order correctly") {
    val a = "a\u0000b"
    val b = "a\u0000c"
    assert(KeyCodec.decode(KeyCodec.encode(Seq(a))) == Vector(a))
    assert(KeyCodec.compare(KeyCodec.encode(Seq(a)), KeyCodec.encode(Seq(b))) < 0)
    // "a" (terminator) sorts before "a\0b" (escaped NUL = 0x00 0xFF)
    assert(KeyCodec.compare(KeyCodec.encode(Seq("a")), KeyCodec.encode(Seq(a))) < 0)
  }

  test("scalar key json renders bare; compound renders as array") {
    assert(KeyCodec.json(Seq("x")) == "\"x\"")
    assert(KeyCodec.json(Seq(5)) == "5")
    assert(KeyCodec.json(Seq("ford", 2)) == "[\"ford\",2]")
  }
}
