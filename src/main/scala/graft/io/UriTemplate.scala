package graft.io

/** X9 — resource-URI template rendering (reference
  * `/root/reference/osm/RenderTemplate.go:16-87`, applied to input/output
  * URIs at `Resource.go:48`): Go-template `{{ … }}` actions over a context
  * map, with the reference's five helpers (`lower`, `upper`, `replace`,
  * `float64`, `json`) and Go pipe semantics — the piped value becomes the
  * LAST argument of the next stage.
  *
  * Driver-side string work (URIs, not data), so plain Scala; `json`
  * serializes with sorted map keys exactly like Go's `json.Marshal`.
  */
object UriTemplate {

  private val Action = "\\{\\{(.*?)\\}\\}".r

  def render(template: String, ctx: Map[String, Any]): String =
    Action.replaceAllIn(template, m =>
      java.util.regex.Matcher.quoteReplacement(stringify(evalAction(m.group(1).trim, ctx))))

  private def evalAction(body: String, ctx: Map[String, Any]): Any = {
    val stages = splitTop(body, '|').map(_.trim).filter(_.nonEmpty)
    require(stages.nonEmpty, s"empty template action in {{$body}}")
    var value = evalStage(tokens(stages.head), None, ctx)
    stages.tail.foreach { st => value = evalStage(tokens(st), Some(value), ctx) }
    value
  }

  /** split on a char, respecting double quotes */
  private def splitTop(s: String, sep: Char): Seq[String] = {
    val out = Seq.newBuilder[String]
    val cur = new StringBuilder
    var inQ = false
    s.foreach {
      case '"' => inQ = !inQ; cur += '"'
      case c if c == sep && !inQ => out += cur.toString(); cur.clear()
      case c => cur += c
    }
    out += cur.toString()
    out.result()
  }

  private def tokens(stage: String): Seq[String] =
    splitTop(stage, ' ').map(_.trim).filter(_.nonEmpty)

  private def evalStage(toks: Seq[String], piped: Option[Any], ctx: Map[String, Any]): Any =
    toks.head match {
      case path if path.startsWith(".") =>
        require(piped.isEmpty && toks.size == 1, s"path $path takes no arguments")
        lookup(path, ctx)
      // literal-only actions render the literal, like Go's text/template:
      // {{ "v1" }}, {{ 5 }}, {{ -2.5 | float64 }} — a bare literal is not
      // a function name
      case lit if lit.startsWith("\"") ||
        lit.headOption.exists(c => c.isDigit || c == '-') =>
        require(piped.isEmpty && toks.size == 1, s"literal $lit takes no arguments")
        atom(lit, ctx)
      case fn =>
        val args = toks.tail.map(t => atom(t, ctx)) ++ piped.toSeq
        applyFn(fn, args)
    }

  private def atom(tok: String, ctx: Map[String, Any]): Any =
    if (tok.startsWith("\"") && tok.endsWith("\"") && tok.length >= 2)
      tok.substring(1, tok.length - 1)
    else if (tok.startsWith(".")) lookup(tok, ctx)
    // integer tokens parse exactly (no double round-trip: 2^53+1 must stay
    // 2^53+1); scientific/decimal forms take the double path
    else tok.toLongOption.map(l => l: Any)
      .orElse(tok.toDoubleOption.map(d => d: Any))
      .getOrElse(throw new IllegalArgumentException(s"bad template token: $tok"))

  private def lookup(path: String, ctx: Map[String, Any]): Any = {
    val rest = path.stripPrefix(".")
    if (rest.isEmpty) ctx // {{ . }} is the whole context (pipe it to json)
    else rest.split('.').foldLeft(ctx: Any) {
      case (m: Map[_, _], k) =>
        m.asInstanceOf[Map[String, Any]].getOrElse(k,
          throw new NoSuchElementException(s"template key $path not in context"))
      case (other, k) =>
        throw new IllegalArgumentException(s"cannot descend into $other with .$k")
    }
  }

  private def applyFn(name: String, args: Seq[Any]): Any = (name, args) match {
    case ("lower", Seq(v)) => stringify(v).toLowerCase
    case ("upper", Seq(v)) => stringify(v).toUpperCase
    case ("replace", Seq(oldS, newS, v)) =>
      stringify(v).replace(stringify(oldS), stringify(newS))
    case ("float64", Seq(v)) => // reference renders via %f (6 decimals)
      val d = v match {
        case s: String => if (s.isEmpty) 0.0 else s.toDoubleOption.getOrElse(0.0)
        case n: Int => n.toDouble
        case n: Long => n.toDouble
        case n: Double => n
        case _ => 0.0
      }
      // Locale.ROOT: the f-interpolator honors the JVM default locale and
      // would render comma decimals into URIs on comma-locale hosts
      String.format(java.util.Locale.ROOT, "%f", java.lang.Double.valueOf(d))
    case ("json", Seq(v)) => json(v)
    case _ =>
      throw new IllegalArgumentException(
        s"unknown template function $name/${args.size} (have lower, upper, replace, float64, json)")
  }

  /** compact JSON with sorted map keys — Go json.Marshal parity */
  private def json(v: Any): String = v match {
    case null => "null"
    case s: String => "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    case b: Boolean => b.toString
    case n: Int => n.toString
    case n: Long => n.toString
    case d: Double => if (d.isWhole) d.toLong.toString else d.toString
    case m: Map[_, _] =>
      m.asInstanceOf[Map[String, Any]].toSeq.sortBy(_._1)
        .map { case (k, x) => json(k) + ":" + json(x) }
        .mkString("{", ",", "}")
    case xs: Seq[_] => xs.map(json).mkString("[", ",", "]")
    case other => json(other.toString)
  }

  private def stringify(v: Any): String = v match {
    case s: String => s
    case d: Double => if (d.isWhole) d.toLong.toString else d.toString
    case other => String.valueOf(other)
  }
}
