package graft.dfl

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dynamic Filter Language → Catalyst `Column` compiler.
  *
  * The reference parses + interprets DFL boolean expressions row-by-row with
  * a memo cache (`/root/reference/osm/Filter.go:27-47`,
  * `EvaluateExpression.go:19-42`, examples `/root/reference/README.md:105`:
  * `@craft like brewery`). We compile the same surface language to built-in
  * Catalyst expressions instead — whole-stage codegen replaces the
  * interpreter and the memo cache (SURVEY.md §2.2 F5/F6).
  *
  * Grammar (case-insensitive keywords):
  * {{{
  *   expr   := and ( 'or' and )*
  *   and    := not ( 'and' not )*
  *   not    := 'not' not | primary
  *   primary:= '(' expr ')' | cmp
  *   cmp    := operand ('like'|'in'|'=='|'!='|'<'|'<='|'>'|'>=') operand
  *            | boolfunc                      (prefix/suffix used standalone)
  *   operand:= func '(' operand (',' operand)* ')'
  *            | '@'ident | number | quoted | bareword | '[' list ']'
  * }}}
  *
  * Function map (the reference plugs `dfl.NewFuntionMapWithDefaults()` at
  * `cmd/osm/main.go:252`; go-dfl is an external dependency not vendored in
  * the reference checkout, so this is the engine's default map providing
  * the same capability class): `len`, `lower`, `upper`, `trim`, `ltrim`,
  * `rtrim`, `prefix`, `suffix`, `abs`, `ceil`, `floor`, `round`, `min`,
  * `max`, `replace`, `split`. `prefix`/`suffix` are boolean and may stand
  * alone; `in` also accepts an array-valued right side (`x in split(@a, ';')`
  * — multi-value tags).
  *
  * `@x` resolves through the caller-supplied attribute resolver (e.g.
  * `element_at(tags, "x")` for tag maps, or a direct column). `like` with a
  * `%` wildcard is SQL LIKE; without one it is equality (go-dfl semantics on
  * plain words). Missing attributes evaluate to null, so comparisons are
  * false — matching the reference's behavior on absent tags.
  */
object Dfl {

  sealed trait Node
  case class Attr(name: String) extends Node
  case class Lit(value: Any) extends Node
  case class ListLit(values: Seq[Any]) extends Node
  case class Func(name: String, args: Seq[Node]) extends Node
  case class Cmp(op: String, l: Node, r: Node) extends Node
  case class And(l: Node, r: Node) extends Node
  case class Or(l: Node, r: Node) extends Node
  case class Not(c: Node) extends Node

  /** Compile a DFL expression to a boolean Column. */
  def compile(dfl: String, resolve: String => Column): Column =
    toColumn(parse(dfl), resolve)

  /** Attribute names referenced by the expression (reference
    * Filter.go:35 `Attributes()` — used for projection pushdown).
    */
  def attributes(dfl: String): Seq[String] = {
    def walk(n: Node): Seq[String] = n match {
      case Attr(a) => Seq(a)
      case Func(_, args) => args.flatMap(walk)
      case Cmp(_, l, r) => walk(l) ++ walk(r)
      case And(l, r) => walk(l) ++ walk(r)
      case Or(l, r) => walk(l) ++ walk(r)
      case Not(c) => walk(c)
      case _ => Nil
    }
    walk(parse(dfl)).distinct
  }

  def toColumn(n: Node, resolve: String => Column): Column = n match {
    case And(l, r) => toColumn(l, resolve) && toColumn(r, resolve)
    case Or(l, r) => toColumn(l, resolve) || toColumn(r, resolve)
    case Not(c) => !toColumn(c, resolve)
    case Cmp(op, l, r) =>
      // two-valued logic like the reference interpreter: a comparison on a
      // missing attribute is FALSE (so `not` of it is TRUE), not SQL NULL
      coalesce(cmpColumn(op, l, r, resolve), lit(false))
    case f @ Func(name, _) if BoolFuncs(name.toLowerCase) =>
      coalesce(operand(f, resolve), lit(false))
    case _ => throw new IllegalArgumentException(s"not a boolean expression: $n")
  }

  /** Functions returning booleans — usable as standalone predicates. */
  private val BoolFuncs = Set("prefix", "suffix", "contains")

  private def operand(n: Node, resolve: String => Column): Column = n match {
    case Attr(a) => resolve(a)
    case Lit(v) => lit(v)
    case Func(name, args) =>
      def a(i: Int) = operand(args(i), resolve)
      def arity(n0: Int): Unit = require(args.length == n0,
        s"$name takes $n0 argument(s), got " + args.length)
      name.toLowerCase match {
        case "len" | "length" => arity(1); length(a(0).cast("string"))
        case "lower" => arity(1); lower(a(0).cast("string"))
        case "upper" => arity(1); upper(a(0).cast("string"))
        case "trim" => arity(1); trim(a(0).cast("string"))
        case "ltrim" => arity(1); ltrim(a(0).cast("string"))
        case "rtrim" => arity(1); rtrim(a(0).cast("string"))
        case "prefix" => arity(2); a(0).cast("string").startsWith(a(1).cast("string"))
        case "suffix" => arity(2); a(0).cast("string").endsWith(a(1).cast("string"))
        case "abs" => arity(1); abs(a(0).cast("double"))
        case "ceil" => arity(1); ceil(a(0).cast("double")).cast("double")
        case "floor" => arity(1); floor(a(0).cast("double")).cast("double")
        case "round" => arity(1); round(a(0).cast("double"), 0)
        case "min" =>
          require(args.nonEmpty, "min takes at least one argument")
          if (args.length == 1) a(0).cast("double")
          else least(args.indices.map(i => a(i).cast("double")): _*)
        case "max" =>
          require(args.nonEmpty, "max takes at least one argument")
          if (args.length == 1) a(0).cast("double")
          else greatest(args.indices.map(i => a(i).cast("double")): _*)
        case "replace" => arity(3) // go-dfl replace is PLAIN string replace:
          // both search and replacement are literal (quoted against regex
          // and Matcher group-reference interpretation respectively)
          regexp_replace(a(0).cast("string"),
            args(1) match {
              case Lit(v) => lit(java.util.regex.Pattern.quote(String.valueOf(v)))
              case _ => throw new IllegalArgumentException("replace: literal search string required")
            },
            args(2) match {
              case Lit(v) => lit(java.util.regex.Matcher.quoteReplacement(String.valueOf(v)))
              case _ => throw new IllegalArgumentException("replace: literal replacement string required")
            })
        case "split" => arity(2); split(a(0).cast("string"),
            args(1) match {
              case Lit(v) => java.util.regex.Pattern.quote(String.valueOf(v))
              case _ => throw new IllegalArgumentException("split: literal separator required")
            })
        // ---- long-tail functions. go-dfl's default map reaches the
        // reference only through an unvendored library
        // (/root/reference/cmd/osm/main.go:252 NewFuntionMapWithDefaults),
        // so beyond the documented core above these are engine additions
        // with SQL semantics, all compiled to codegen'd built-ins.
        case "substr" | "substring" => arity(3) // 1-based start, SQL-style
          a(0).cast("string").substr(a(1).cast("int"), a(2).cast("int"))
        case "contains" => arity(2)
          a(0).cast("string").contains(a(1).cast("string"))
        case "pow" | "power" => arity(2); pow(a(0).cast("double"), a(1).cast("double"))
        case "sqrt" => arity(1); sqrt(a(0).cast("double"))
        case "mod" => arity(2) // truncated remainder, Go/SQL % semantics
          a(0).cast("double") % a(1).cast("double")
        case "first" => arity(1); element_at(a(0), 1)
        case "last" => arity(1); element_at(a(0), -1)
        case "join" => arity(2); array_join(a(0),
            args(1) match {
              case Lit(v) => String.valueOf(v)
              case _ => throw new IllegalArgumentException("join: literal separator required")
            })
        case other => throw new IllegalArgumentException(
          s"unknown DFL function: $other (have len, lower, upper, trim, ltrim, rtrim, " +
            "prefix, suffix, abs, ceil, floor, round, min, max, replace, split, " +
            "substr, contains, pow, sqrt, mod, first, last, join)")
      }
    case other => throw new IllegalArgumentException(s"unexpected operand: $other")
  }

  /** go-dfl's like wildcard is '%' ONLY — SQL LIKE additionally treats
    * '_' as any-one-character and '\' as the escape, so both must be
    * escaped or `@name like %beer_garden%` would match 'beerXgarden'
    * here and not in the reference. */
  private def likePattern(s: String): String =
    s.replace("\\", "\\\\").replace("_", "\\_")

  private def cmpColumn(op: String, l: Node, r: Node, resolve: String => Column): Column = {
    op match {
      case "in" =>
        r match {
          case ListLit(vs) => operand(l, resolve).isin(vs: _*)
          case Lit(v) => operand(l, resolve).isin(v)
          // array-valued right side, e.g. `brewery in split(@craft, ';')`
          case o => array_contains(operand(o, resolve), operand(l, resolve).cast("string"))
        }
      case "like" =>
        r match {
          case Lit(s: String) if s.contains("%") =>
            operand(l, resolve).like(likePattern(s))
          case Lit(v) => operand(l, resolve) === lit(v)
          case other => throw new IllegalArgumentException(
            s"like: pattern must be a literal (quoted or bareword), got $other")
        }
      case "ilike" =>
        r match {
          case Lit(s: String) if s.contains("%") =>
            operand(l, resolve).ilike(likePattern(s))
          case Lit(v) => lower(operand(l, resolve)) === lower(lit(v))
          case other => throw new IllegalArgumentException(
            s"ilike: pattern must be a literal (quoted or bareword), got $other")
        }
      case "==" | "=" => operand(l, resolve) === operand(r, resolve)
      case "!=" => operand(l, resolve) =!= operand(r, resolve)
      case "<" => castNum(operand(l, resolve), l) < castNum(operand(r, resolve), r)
      case "<=" => castNum(operand(l, resolve), l) <= castNum(operand(r, resolve), r)
      case ">" => castNum(operand(l, resolve), l) > castNum(operand(r, resolve), r)
      case ">=" => castNum(operand(l, resolve), l) >= castNum(operand(r, resolve), r)
      case o => throw new IllegalArgumentException(s"unknown operator: $o")
    }
  }

  /** Numeric comparisons on attrs cast to double (tag values are strings). */
  private def castNum(c: Column, n: Node): Column = n match {
    case Attr(_) => c.cast("double")
    case _ => c
  }

  // ---- parser ---------------------------------------------------------------

  /** Max parenthesis/NOT nesting the recursive-descent parser accepts.
    * DFL strings are user-typed CLI input — without a bound, a few
    * thousand open parens overflow the parse stack and kill the driver
    * with StackOverflowError instead of a parse error (found by
    * DflFuzzSpec). 256 is orders of magnitude past any real filter.
    */
  val MaxDepth = 256

  private case class P(tokens: Vector[String], var pos: Int = 0,
                       var depth: Int = 0) {
    def push(): Unit = {
      depth += 1
      require(depth <= MaxDepth, s"expression nested deeper than $MaxDepth")
    }
    def pop(): Unit = depth -= 1
    def peek: Option[String] = if (pos < tokens.length) Some(tokens(pos)) else None
    def next(): String = {
      require(pos < tokens.length, "unexpected end of expression")
      val t = tokens(pos); pos += 1; t
    }
    def expect(t: String): Unit = {
      val g = next()
      require(g.equalsIgnoreCase(t), s"expected '$t', got '$g'")
    }
  }

  def parse(s: String): Node = {
    val p = P(tokenize(s))
    val n = parseOr(p)
    require(p.pos == p.tokens.length, s"trailing tokens: ${p.tokens.drop(p.pos).mkString(" ")}")
    n
  }

  private def parseOr(p: P): Node = {
    var l = parseAnd(p)
    while (p.peek.exists(_.equalsIgnoreCase("or"))) { p.next(); l = Or(l, parseAnd(p)) }
    l
  }

  private def parseAnd(p: P): Node = {
    var l = parseNot(p)
    while (p.peek.exists(_.equalsIgnoreCase("and"))) { p.next(); l = And(l, parseNot(p)) }
    l
  }

  private def parseNot(p: P): Node =
    if (p.peek.exists(_.equalsIgnoreCase("not"))) {
      p.next(); p.push()
      val n = Not(parseNot(p))
      p.pop(); n
    } else parsePrimary(p)

  private def parsePrimary(p: P): Node = {
    if (p.peek.contains("(")) {
      p.next(); p.push()
      val n = parseOr(p)
      p.expect(")"); p.pop(); n
    } else {
      val l = parseOperand(p)
      p.peek match {
        case Some(t) if CmpOps(t.toLowerCase) =>
          val op = p.next().toLowerCase
          Cmp(op, l, parseOperand(p))
        case _ =>
          l match {
            case f @ Func(name, _) if BoolFuncs(name.toLowerCase) => f
            case o => throw new IllegalArgumentException(
              s"expected a comparison operator after $o")
          }
      }
    }
  }

  private val CmpOps =
    Set("like", "ilike", "in", "==", "=", "!=", "<", "<=", ">", ">=")

  private def parseOperand(p: P): Node = p.next() match {
    case "[" =>
      val vs = scala.collection.mutable.ArrayBuffer.empty[Any]
      var done = false
      while (!done) {
        p.peek match {
          case Some("]") => p.next(); done = true
          case Some(",") => p.next()
          case Some(_) => vs += litValue(p.next())
          case None => throw new IllegalArgumentException("unterminated list")
        }
      }
      ListLit(vs.toSeq)
    case t if t.startsWith("@") => Attr(t.drop(1))
    case t if p.peek.contains("(") && t.matches("[A-Za-z_][A-Za-z0-9_]*") =>
      p.next() // consume '('
      p.push() // function args recurse through parseOperand: bound it too
      val args = scala.collection.mutable.ArrayBuffer.empty[Node]
      var done = p.peek.contains(")")
      if (done) p.next()
      while (!done) {
        args += parseOperand(p)
        p.next() match {
          case ")" => done = true
          case "," =>
          case o => throw new IllegalArgumentException(s"expected ',' or ')', got $o")
        }
      }
      p.pop()
      Func(t, args.toSeq)
    case t => Lit(litValue(t))
  }

  private def litValue(t: String): Any = {
    if (t.length >= 2 && ((t.head == '\'' && t.last == '\'') || (t.head == '"' && t.last == '"')))
      t.substring(1, t.length - 1)
    else if (t.matches("[+-]?\\d+")) t.toLong
    else if (t.matches("[+-]?\\d*\\.\\d+([eE][+-]?\\d+)?")) t.toDouble
    else t // bareword string
  }

  private def tokenize(s: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c.isWhitespace) i += 1
      else if ("()[],".indexOf(c) >= 0) { out += c.toString; i += 1 }
      else if (c == '\'' || c == '"') {
        // doubled quote = one literal quote char ('O''Brien' -> O'Brien)
        val sb = new StringBuilder
        sb += c
        var j = i + 1
        var closed = false
        while (!closed) {
          require(j < s.length, s"unterminated string at $i")
          val cj = s.charAt(j)
          if (cj == c) {
            if (j + 1 < s.length && s.charAt(j + 1) == c) { sb += c; j += 2 }
            else { sb += c; j += 1; closed = true }
          } else { sb += cj; j += 1 }
        }
        out += sb.result(); i = j
      } else if ("<>!=".indexOf(c) >= 0) {
        val two = s.substring(i, math.min(i + 2, s.length))
        if (two == "<=" || two == ">=" || two == "==" || two == "!=") { out += two; i += 2 }
        else { out += c.toString; i += 1 }
      } else {
        var j = i
        // quotes stop barewords: a mid-word quote (it's) is a syntax error,
        // not a silent single token that can never match
        while (j < s.length && !s.charAt(j).isWhitespace &&
          "()[],<>!='\"".indexOf(s.charAt(j)) < 0) j += 1
        out += s.substring(i, j); i = j
      }
    }
    out.result()
  }
}
