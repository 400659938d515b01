package graft.core

import scala.collection.mutable

/** Minimal JSON render/parse for view entry values and keys.
  *
  * The reference stores LevelDB values with `valueEncoding: 'json'`
  * (/root/reference/index.js:48); emitted values and keys are arbitrary
  * JSON. This codec covers that surface (null, boolean, number, string,
  * array, object) with JS number semantics: all numbers are doubles,
  * rendered without a trailing `.0` when integral (matching
  * JSON.stringify), so cross-checking against the DuckDB oracle's text
  * output stays stable.
  */
object Json {

  def render(v: Any): String = v match {
    case null => "null"
    case b: Boolean => if (b) "true" else "false"
    case s: String => renderString(s)
    case d: Double => renderNum(d)
    case f: Float => renderNum(f.toDouble)
    case n: Int => n.toString
    case n: Long => n.toString
    case n: Short => n.toString
    case n: Byte => n.toString
    case m: collection.Map[_, _] =>
      m.map { case (k, x) => renderString(k.toString) + ":" + render(x) }
        .mkString("{", ",", "}")
    case r: org.apache.spark.sql.Row =>
      // struct-typed view values arrive as Rows (GraftFunctions.valueJson
      // walks any shape) — render as an object when the schema names
      // fields, else as an array
      Option(r.schema).map(_.fieldNames) match {
        case Some(names) =>
          names.zipWithIndex
            .map { case (n, i) => renderString(n) + ":" + render(r.get(i)) }
            .mkString("{", ",", "}")
        case None => r.toSeq.map(render).mkString("[", ",", "]")
      }
    case xs: Iterable[_] => xs.map(render).mkString("[", ",", "]")
    case xs: Array[_] => xs.map(render).mkString("[", ",", "]")
    case other => renderString(other.toString)
  }

  def renderNum(d: Double): String =
    // JSON has no non-finite literals; JSON.stringify emits null (the
    // reference's behavior) — "Infinity" would make the stored state
    // unparseable on read. Integral doubles render without an exponent
    // up to 1e21, matching JSON.stringify (nanosecond-epoch ids live in
    // [1e15, 1e19) — an exponent form there breaks text parity).
    if (d.isNaN || d.isInfinite) "null"
    else if (d.isWhole && math.abs(d) < 1e18) d.toLong.toString
    else if (d.isWhole && math.abs(d) < 1e21)
      java.math.BigDecimal.valueOf(d).toBigInteger.toString
    else d.toString

  def renderString(s: String): String = {
    val sb = new StringBuilder("\"")
    s.foreach {
      case '"' => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c)
    }
    sb.append('"').toString
  }

  /** Parse JSON text. Numbers come back as Double (JS semantics),
    * objects as Map[String, Any], arrays as Vector[Any].
    */
  def parse(text: String): Any = {
    val p = new Parser(text)
    val v = p.value()
    p.skipWs()
    require(p.eof, s"trailing characters at ${p.pos} in: $text")
    v
  }

  private final class Parser(s: String) {
    var pos = 0
    def eof: Boolean = pos >= s.length
    def skipWs(): Unit = while (!eof && s.charAt(pos).isWhitespace) pos += 1
    private def expect(c: Char): Unit = {
      require(!eof && s.charAt(pos) == c, s"expected '$c' at $pos in: $s")
      pos += 1
    }
    def value(): Any = {
      skipWs()
      require(!eof, "unexpected end of input")
      s.charAt(pos) match {
        case '{' => obj()
        case '[' => arr()
        case '"' => str()
        case 't' => lit("true", true)
        case 'f' => lit("false", false)
        case 'n' => lit("null", null)
        case _ => num()
      }
    }
    private def lit(word: String, v: Any): Any = {
      require(s.regionMatches(pos, word, 0, word.length), s"bad literal at $pos")
      pos += word.length; v
    }
    private def obj(): Map[String, Any] = {
      expect('{'); skipWs()
      // VectorMap, not LinkedHashMap.toMap: toMap degrades to HashMap past
      // 4 keys, so re-rendered value_json key order would diverge from the
      // input's (JSON.stringify preserves insertion order)
      val m = mutable.LinkedHashMap.empty[String, Any]
      def result = scala.collection.immutable.VectorMap.from(m)
      if (!eof && s.charAt(pos) == '}') { pos += 1; return result }
      while (true) {
        skipWs()
        val k = str(); skipWs(); expect(':')
        m(k) = value(); skipWs()
        require(!eof, s"unterminated object at $pos in: $s")
        if (s.charAt(pos) == ',') pos += 1
        else { expect('}'); return result }
      }
      result
    }
    private def arr(): Vector[Any] = {
      expect('['); skipWs()
      val b = Vector.newBuilder[Any]
      if (!eof && s.charAt(pos) == ']') { pos += 1; return b.result() }
      while (true) {
        b += value(); skipWs()
        require(!eof, s"unterminated array at $pos in: $s")
        if (s.charAt(pos) == ',') pos += 1
        else { expect(']'); return b.result() }
      }
      b.result()
    }
    private def str(): String = {
      expect('"')
      val sb = new StringBuilder
      while ({ require(!eof, s"unterminated string at $pos in: $s")
               s.charAt(pos) != '"' }) {
        val c = s.charAt(pos)
        if (c == '\\') {
          pos += 1
          require(!eof, s"unterminated escape at $pos in: $s")
          s.charAt(pos) match {
            case '"' => sb.append('"')
            case '\\' => sb.append('\\')
            case '/' => sb.append('/')
            case 'b' => sb.append('\b')
            case 'f' => sb.append('\f')
            case 'n' => sb.append('\n')
            case 'r' => sb.append('\r')
            case 't' => sb.append('\t')
            case 'u' =>
              require(pos + 5 <= s.length, s"truncated \\u escape at $pos")
              sb.append(Integer.parseInt(s.substring(pos + 1, pos + 5), 16).toChar)
              pos += 4
            case other => throw new IllegalArgumentException(s"bad escape \\$other")
          }
        } else sb.append(c)
        pos += 1
      }
      pos += 1
      sb.toString
    }
    private def num(): Double = {
      val start = pos
      while (!eof && "+-0123456789.eE".indexOf(s.charAt(pos)) >= 0) pos += 1
      s.substring(start, pos).toDouble
    }
  }
}
