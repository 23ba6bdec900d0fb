package graft.html

import scala.collection.mutable

/** Minimal DOM for the from-scratch HTML engine (no jsoup offline; the
  * north rule mandates a from-scratch DOM + heuristics).
  *
  * Capability target: the selector-and-text surface the reference uses —
  * `css_first("h3.gs_rt").text(strip=True)`, attribute reads, descendant
  * scans (/root/reference/src/webscrapers.py:129-151, :408-417;
  * /root/reference/src/downloaders.py:215-230) — plus whole-tree traversal
  * for the boilerplate classifier.
  */
sealed trait HNode {
  var parent: HElem = _
}

final class HText(val data: String) extends HNode

final class HComment(val data: String) extends HNode

final class HElem(
    val tag: String,
    val attrs: Map[String, String]) extends HNode {
  val children: mutable.ArrayBuffer[HNode] = mutable.ArrayBuffer.empty

  def append(n: HNode): Unit = { n.parent = this; children += n }

  def id: Option[String] = attrs.get("id")
  def classes: Set[String] =
    attrs.get("class").map(c => HElem.Ws.split(c).filter(_.nonEmpty).toSet).getOrElse(Set.empty)
  def attr(name: String): Option[String] = attrs.get(name)

  /** Element children only (what :nth-child counts). Cached after first
    * read — the tree is parse-then-read (the parser never appends to a
    * node after any consumer has queried it). */
  private var _elemChildren: Seq[HElem] = _
  def elemChildren: Seq[HElem] = {
    if (_elemChildren == null)
      _elemChildren = children.collect { case e: HElem => e }.toSeq
    _elemChildren
  }

  /** 1-based position among parent's ELEMENT children. */
  def nthChildIndex: Int =
    if (parent == null) 1 else parent.elemChildren.indexWhere(_ eq this) + 1

  /** Depth-first pre-order over descendant elements, self excluded. */
  def descendants: Iterator[HElem] = new Iterator[HElem] {
    private val stack = mutable.Stack[HNode]()
    stack.pushAll(children.reverseIterator)
    private var nextElem: HElem = advance()
    private def advance(): HElem = {
      while (stack.nonEmpty) {
        stack.pop() match {
          case e: HElem =>
            stack.pushAll(e.children.reverseIterator)
            return e
          case _ => ()
        }
      }
      null
    }
    def hasNext: Boolean = nextElem != null
    def next(): HElem = { val e = nextElem; nextElem = advance(); e }
  }

  /** Concatenated descendant text, selectolax-style: with strip=true each
    * text node is stripped before concatenation; otherwise raw. */
  def text(strip: Boolean = false): String = {
    val sb = new StringBuilder
    def walk(n: HNode): Unit = n match {
      case t: HText => sb.append(if (strip) t.data.strip() else t.data)
      case e: HElem => e.children.foreach(walk)
      case _        => ()
    }
    children.foreach(walk)
    sb.toString
  }

  /** Own + descendant text with runs of whitespace collapsed to single
    * spaces and trimmed — the normalized form the extraction pipeline
    * emits per block. Hand-rolled collapse, byte-identical to
    * `split("\\s+").filter(_.nonEmpty).mkString(" ")` (Java regex \s is
    * exactly [ \t\n\x0B\f\r]) without the per-call Pattern compile —
    * this runs once per block of every page in the corpus. */
  def normalizedText: String = {
    val sb = new java.lang.StringBuilder
    def walk(n: HNode): Unit = n match {
      case t: HText => sb.append(t.data).append(' ')
      case e: HElem => e.children.foreach(walk)
      case _        => ()
    }
    children.foreach(walk)
    HElem.collapseWs(sb)
  }
}

object HElem {
  private[html] val Ws = java.util.regex.Pattern.compile("\\s+")

  /** Collapse runs of Java-regex \s chars to single spaces and trim both
    * ends — byte-identical to split("\\s+").filter(_.nonEmpty)
    * .mkString(" ") without the per-call Pattern compile. */
  private[html] def collapseWs(sb: CharSequence): String = {
    val out = new java.lang.StringBuilder(sb.length)
    var pendingSpace = false
    var i = 0
    while (i < sb.length) {
      val c = sb.charAt(i)
      val ws = c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'
      if (ws) { if (out.length > 0) pendingSpace = true }
      else {
        if (pendingSpace) { out.append(' '); pendingSpace = false }
        out.append(c)
      }
      i += 1
    }
    out.toString
  }

  def apply(tag: String, attrs: Map[String, String] = Map.empty): HElem =
    new HElem(tag, attrs)
}
