package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.core.{Json, ViewDef}

/** Unit coverage for the two small pure-Scala codecs the engine leans on:
  * the JSON value codec (reference stores LevelDB values with JSON
  * encoding) and the path-glob → regex translation (reference uses
  * anymatch over pathnames).
  */
class JsonGlobSpec extends AnyFunSuite {

  test("json roundtrip: scalars, arrays, nested objects") {
    val cases: Seq[String] = Seq(
      "null", "true", "false", "42", "-3.5", "\"hi\"",
      "[1,2,3]", "[]", "{}",
      """{"a":1,"b":[true,null,"x"],"c":{"d":-2.25}}""")
    cases.foreach { c =>
      assert(Json.render(Json.parse(c)) == c, s"roundtrip of $c")
    }
  }

  test("json renders integral doubles without .0 (JS semantics)") {
    assert(Json.render(5.0) == "5")
    assert(Json.render(5.5) == "5.5")
    assert(Json.render(-0.0) == "0")
    // JSON.stringify renders integral doubles plainly up to 1e21 —
    // nanosecond-epoch ids (~1e18) must not switch to exponent form
    assert(Json.render(1.0e15) == "1000000000000000")
    assert(Json.render(1.7e18) == "1700000000000000000")
    assert(Json.render(1.0e20) == "100000000000000000000")
    assert(Json.render(1.0e21) == "1.0E21") // JS switches to 1e+21 here too
  }

  test("json string escapes roundtrip") {
    val s = "a\"b\\c\nd\te\u0001f"
    assert(Json.parse(Json.render(s)) == s)
    assert(Json.render(s).contains("\\u0001"))
  }

  test("json parse: whitespace, unicode escapes, nested arrays") {
    assert(Json.parse(""" { "k" : [ 1 , 2 ] } """) == Map("k" -> Vector(1.0, 2.0)))
    assert(Json.parse("\"\\u0041\"") == "A")
    assert(Json.parse("[[1],[2,[3]]]") == Vector(Vector(1.0), Vector(2.0, Vector(3.0))))
  }

  test("json parse rejects trailing garbage") {
    intercept[IllegalArgumentException](Json.parse("1 2"))
  }

  test("json parse: truncated input is a parse error, not a StringIndexOutOfBounds") {
    Seq("""{"a":1""", """[1, 2""", "\"abc", "{\"a\":1,", "[1,", "\"\\u12",
        "{", "[", "{\"a\"", "\"abc\\").foreach { bad =>
      intercept[IllegalArgumentException](Json.parse(bad))
    }
  }

  test("json renders spark Rows as objects; non-finite doubles as null") {
    import org.apache.spark.sql.catalyst.expressions.GenericRowWithSchema
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("a", LongType), StructField("b", StringType)))
    val row = new GenericRowWithSchema(Array(1L, "x"), schema)
    assert(Json.render(row) == """{"a":1,"b":"x"}""")
    assert(Json.render(Double.NaN) == "null")
    assert(Json.render(Double.PositiveInfinity) == "null")
    assert(Json.render(Map("n" -> Double.NegativeInfinity)) == """{"n":null}""")
  }

  test("json parse preserves object key insertion order past 4 keys") {
    val text = """{"z":1,"y":2,"x":3,"w":4,"v":5,"u":6,"t":7}"""
    assert(Json.render(Json.parse(text)) == text)
    assert(Json.parse(text).asInstanceOf[Map[String, Any]].keys.toSeq ==
      Seq("z", "y", "x", "w", "v", "u", "t"))
  }

  test("json property: render∘parse == identity on 500 random nested values") {
    val rnd = new scala.util.Random(7)
    def randValue(depth: Int): Any = rnd.nextInt(if (depth > 2) 5 else 7) match {
      case 0 => null
      case 1 => rnd.nextBoolean()
      case 2 => rnd.nextInt(200001) - 100000
      case 3 => math.round((rnd.nextDouble() - 0.5) * 2e6) / 100.0
      case 4 => rnd.alphanumeric.take(rnd.nextInt(10)).mkString + (if (rnd.nextBoolean()) "\"\\\n" else "")
      case 5 => Vector.fill(rnd.nextInt(4))(randValue(depth + 1))
      case 6 => Seq.fill(rnd.nextInt(4))(
        rnd.alphanumeric.take(3).mkString -> randValue(depth + 1)).toMap
    }
    (1 to 500).foreach { _ =>
      val v = randValue(0)
      val text = Json.render(v)
      assert(Json.render(Json.parse(text)) == text, s"via $text")
    }
  }

  test("glob: * stays within a path segment, ** crosses, ? is one char") {
    def m(glob: String, path: String): Boolean =
      path.matches(ViewDef.globToRegex(glob))
    assert(m("/multi/*.json", "/multi/1.json"))
    assert(!m("/multi/*.json", "/multi/sub/1.json"))
    assert(m("/multi/**", "/multi/sub/deep/1.json"))
    assert(m("/file?.txt", "/file1.txt"))
    assert(!m("/file?.txt", "/file10.txt"))
    assert(m("/a/**/b.json", "/a/x/y/b.json"))
    assert(!m("/single.json", "/Xsingle.json"))
    // regex metachars in the glob are literal
    assert(m("/a+b(c).json", "/a+b(c).json"))
    assert(!m("/a+b(c).json", "/ab(c).json"))
  }
}
