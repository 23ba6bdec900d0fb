package graft.html

/** CSS selector subset matching the reference's usage
  * (/root/reference/src/webscrapers.py:129-151, :408-417;
  * /root/reference/src/downloaders.py:215-230):
  * tag, `.class`, `#id`, compound (`tag.class#id`), descendant (space),
  * child (`>`), `:nth-child(n)`. `cssFirst` = first match in document
  * order, like selectolax `css_first`.
  */
object Selectors {

  final case class Simple(
      tag: Option[String],
      id: Option[String],
      classes: Set[String],
      nthChild: Option[Int]) {
    def matches(e: HElem): Boolean =
      tag.forall(_ == e.tag) &&
        id.forall(i => e.id.contains(i)) &&
        classes.subsetOf(e.classes) &&
        nthChild.forall(_ == e.nthChildIndex)
  }

  sealed trait Combinator
  case object Descendant extends Combinator
  case object Child extends Combinator

  /** A compiled selector: first simple selector + (combinator, simple)* */
  final case class Selector(head: Simple, rest: List[(Combinator, Simple)])

  def compile(selector: String): Selector = {
    // split on combinators, preserving '>' tokens
    val tokens = selector.trim
      .replace(">", " > ")
      .split("\\s+").filter(_.nonEmpty).toList
    def parseParts(parts: List[String], acc: List[(Combinator, Simple)]): List[(Combinator, Simple)] =
      parts match {
        case Nil => acc.reverse
        case ">" :: simple :: tail => parseParts(tail, (Child, parseSimple(simple)) :: acc)
        case simple :: tail        => parseParts(tail, (Descendant, parseSimple(simple)) :: acc)
      }
    tokens match {
      case Nil => Selector(Simple(None, None, Set.empty, None), Nil)
      case headTok :: tail =>
        Selector(parseSimple(headTok), parseParts(tail, Nil))
    }
  }

  private val NthChild = """:nth-child\((\d+)\)""".r

  private def parseSimple(token: String): Simple = {
    var rest = token
    var nth: Option[Int] = None
    NthChild.findFirstMatchIn(rest).foreach { m =>
      nth = Some(m.group(1).toInt)
      rest = rest.substring(0, m.start) + rest.substring(m.end)
    }
    var tag: Option[String] = None
    var id: Option[String] = None
    val classes = scala.collection.mutable.Set.empty[String]
    var i = 0
    while (i < rest.length) {
      val kind = rest.charAt(i) match {
        case '.' => i += 1; 'c'
        case '#' => i += 1; 'i'
        case '*' => i += 1; '*'
        case _   => 't'
      }
      val start = i
      while (i < rest.length && rest.charAt(i) != '.' && rest.charAt(i) != '#' &&
             rest.charAt(i) != ':') i += 1
      val name = rest.substring(start, i)
      kind match {
        case 'c' => classes += name
        case 'i' => id = Some(name)
        case 't' if name.nonEmpty => tag = Some(name.toLowerCase(java.util.Locale.ROOT))
        case _   => ()
      }
      if (i < rest.length && rest.charAt(i) == ':') i = rest.length // ignore other pseudos
    }
    Simple(tag, id, classes.toSet, nth)
  }

  /** All matches in document order. */
  def css(root: HElem, selector: String): Iterator[HElem] = {
    val sel = compile(selector)
    root.descendants.filter(e => matchesChain(e, sel))
  }

  def cssFirst(root: HElem, selector: String): Option[HElem] = {
    val it = css(root, selector)
    if (it.hasNext) Some(it.next()) else None
  }

  /** Match by walking ancestors right-to-left through the chain. */
  private def matchesChain(e: HElem, sel: Selector): Boolean = {
    val simples = (sel.head :: sel.rest.map(_._2)).toArray
    val combs = sel.rest.map(_._1).toArray // combs(i) links simples(i) -> simples(i+1)
    if (!simples.last.matches(e)) return false

    // recursive ancestor search over the remaining chain
    def up(node: HElem, idx: Int): Boolean = {
      if (idx < 0) return true
      val comb = combs(idx)
      val want = simples(idx)
      comb match {
        case Child =>
          val p = node.parent
          p != null && p.tag != "#root" && want.matches(p) && up(p, idx - 1)
        case Descendant =>
          var p = node.parent
          while (p != null && p.tag != "#root") {
            if (want.matches(p) && up(p, idx - 1)) return true
            p = p.parent
          }
          false
      }
    }
    up(e, combs.length - 1)
  }
}
