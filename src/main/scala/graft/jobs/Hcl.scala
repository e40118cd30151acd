package graft.jobs

/** Minimal HCL (v1) reader covering the reference's config grammar —
  * `osm.LoadConfig` parses configs with hashicorp/hcl and decodes them into
  * `Config{InputConfigs, OutputConfigs}` (`/root/reference/osm/LoadConfig.go:15-45`,
  * struct tags in InputConfig.go/OutputConfig.go/Filter.go). The subset
  * implemented is what those structs can absorb:
  *
  *  - `key = value` assignments (string / number / bool / list)
  *  - `key { ... }` blocks; REPEATED blocks of one name accumulate into a
  *    list (hcl's DecodeObject-into-slice behavior), as does the
  *    `key = [ { ... }, ... ]` spelling
  *  - line comments (hash and double-slash) and block comments
  *
  * Values keep declaration order; repeated keys are preserved (callers see
  * every occurrence via [[HObj.all]]).
  */
object Hcl {

  sealed trait HVal
  case class HStr(v: String) extends HVal
  case class HNum(v: Double) extends HVal
  case class HBool(v: Boolean) extends HVal
  case class HList(vs: Seq[HVal]) extends HVal
  case class HObj(fields: Seq[(String, HVal)]) extends HVal {
    def all(key: String): Seq[HVal] = fields.collect { case (`key`, v) => v }
    def one(key: String): Option[HVal] = all(key).headOption
    def str(key: String): Option[String] = one(key).collect { case HStr(s) => s }
    def bool(key: String): Boolean = one(key).collect { case HBool(b) => b }.getOrElse(false)
    def strs(key: String): Seq[String] =
      one(key).collect { case HList(vs) => vs.collect { case HStr(s) => s } }.getOrElse(Nil)
    def nums(key: String): Seq[Double] =
      one(key).collect { case HList(vs) => vs.collect { case HNum(d) => d } }.getOrElse(Nil)
  }

  def parse(text: String): HObj = new Parser(text).document()

  private final class Parser(text: String) {
    private var pos = 0

    private def err(msg: String): Nothing = {
      val line = text.take(pos).count(_ == '\n') + 1
      throw new IllegalArgumentException(s"HCL parse error at line $line: $msg")
    }

    private def peek: Char = if (pos < text.length) text.charAt(pos) else '\u0000'

    private def skipWs(): Unit = {
      var go = true
      while (go) {
        go = false
        while (pos < text.length && text.charAt(pos).isWhitespace) pos += 1
        if (peek == '#' || (peek == '/' && pos + 1 < text.length && text.charAt(pos + 1) == '/')) {
          while (pos < text.length && text.charAt(pos) != '\n') pos += 1
          go = true
        } else if (peek == '/' && pos + 1 < text.length && text.charAt(pos + 1) == '*') {
          pos += 2
          while (pos + 1 < text.length &&
            !(text.charAt(pos) == '*' && text.charAt(pos + 1) == '/')) pos += 1
          if (pos + 1 >= text.length) err("unterminated block comment")
          pos += 2
          go = true
        }
      }
    }

    private def ident(): String = {
      skipWs()
      if (peek == '"') return string()
      val start = pos
      while (pos < text.length && (text.charAt(pos).isLetterOrDigit ||
        text.charAt(pos) == '_' || text.charAt(pos) == '-' || text.charAt(pos) == '.')) pos += 1
      if (pos == start) err(s"expected identifier, found '$peek'")
      text.substring(start, pos)
    }

    private def string(): String = {
      if (peek != '"') err("expected string")
      pos += 1
      val sb = new StringBuilder
      while (pos < text.length && text.charAt(pos) != '"') {
        val c = text.charAt(pos)
        if (c == '\\' && pos + 1 < text.length) {
          pos += 1
          sb += (text.charAt(pos) match {
            case 'n' => '\n'
            case 't' => '\t'
            case 'r' => '\r'
            case other => other // \" \\ \/ and friends
          })
        } else sb += c
        pos += 1
      }
      if (pos >= text.length) err("unterminated string")
      pos += 1
      sb.result()
    }

    // bound recursion: config files are user-authored, and a few thousand
    // nested braces/brackets would otherwise overflow the parse stack
    // with StackOverflowError instead of a parse error (HclFuzzSpec)
    private var depth = 0
    private def push(): Unit = {
      depth += 1
      if (depth > 256) err("nested deeper than 256")
    }

    private def value(): HVal = {
      push()
      try valueInner()
      finally depth -= 1
    }

    private def valueInner(): HVal = {
      skipWs()
      peek match {
        case '"' => HStr(string())
        case '[' =>
          pos += 1
          val vs = Seq.newBuilder[HVal]
          skipWs()
          while (peek != ']') {
            vs += value()
            skipWs()
            if (peek == ',') { pos += 1; skipWs() }
          }
          pos += 1
          HList(vs.result())
        case '{' => objInner() // value() already pushed for this level
        case c if c == '-' || c.isDigit =>
          val start = pos
          pos += 1
          while (pos < text.length && (text.charAt(pos).isDigit ||
            text.charAt(pos) == '.' || text.charAt(pos) == 'e' ||
            text.charAt(pos) == 'E' || text.charAt(pos) == '+' ||
            text.charAt(pos) == '-')) pos += 1
          val numText = text.substring(start, pos)
          // the greedy scan accepts shapes toDouble rejects ("1.2.3", "-"):
          // surface them as a located parse error like every other
          // malformed construct, not a bare NumberFormatException
          numText.toDoubleOption match {
            case Some(d) => HNum(d)
            case None => err(s"malformed number '$numText'")
          }
        case _ =>
          ident() match {
            case "true" => HBool(true)
            case "false" => HBool(false)
            case other => err(s"unexpected value '$other'")
          }
      }
    }

    private def obj(): HObj = {
      // blocks arrive here straight from body() (not via value()), so this
      // entry point guards itself; `= {` assignments take objInner because
      // value() already counted the level — one push per nesting level
      // either way, so the 256 cap means the same depth for both syntaxes
      push()
      try objInner()
      finally depth -= 1
    }

    private def objInner(): HObj = {
      skipWs()
      if (peek != '{') err("expected '{'")
      pos += 1
      val fields = body(inBraces = true)
      if (peek != '}') err("expected '}'")
      pos += 1
      HObj(fields)
    }

    private def body(inBraces: Boolean): Seq[(String, HVal)] = {
      val fields = Seq.newBuilder[(String, HVal)]
      skipWs()
      while (pos < text.length && !(inBraces && peek == '}')) {
        val key = ident()
        skipWs()
        peek match {
          case '=' => pos += 1; fields += (key -> value())
          case '{' => fields += (key -> obj())
          case '"' => // `key "label" { ... }` block labels: flatten into the object
            val label = string()
            val o = obj()
            fields += (key -> HObj(("__label" -> HStr(label)) +: o.fields))
          case other => err(s"expected '=' or '{' after '$key', found '$other'")
        }
        skipWs()
        if (peek == ',') { pos += 1; skipWs() } // object-style separators
      }
      fields.result()
    }

    def document(): HObj = {
      val fields = body(inBraces = false)
      skipWs()
      if (pos < text.length) err(s"trailing content '$peek'")
      HObj(fields)
    }
  }
}
