package graft.functions

import scala.collection.mutable.ArrayBuffer

/** Tolerant HTML DOM extraction — the S6/P8/P9 surface
  * (reference: news/elimparcial.js:29 `querySelectorAll('.news--box')`,
  * :31-38 `button.dataset` attribute reads, :49-60 recursive selector
  * fallback, :75-85 descendant selectors `.newsfull__body p`).
  *
  * The reference uses a real DOM (jsdom); a regex extractor matches
  * clean fixtures but mis-parses reordered attributes, nested
  * same-class tags, unquoted/single-quoted values — the first messy
  * real page breaks it. This is a ~150-line dependency-free tag
  * tokenizer + element tree + the querySelectorAll subset the
  * reference exercises:
  *
  *   - attributes in ANY order, double-/single-/un-quoted, bare
  *     (value-less) — names lowercased, entities decoded
  *   - nesting, including same-class/same-tag nesting (spans come
  *     from a real open/close stack, not a lazy regex)
  *   - tolerance: implied closes (`</ul>` closing open `<li>`s),
  *     stray closers ignored, unclosed elements closed at EOF,
  *     comments skipped, `<script>`/`<style>` treated as raw text
  *   - selectors: `tag`, `.class`, `#id`, compounds (`h1.title`),
  *     and the descendant combinator (`.newsfull__body p`)
  *   - per-match reads: innerText (tags stripped, entities decoded —
  *     textContent semantics, no whitespace collapsing) and any
  *     attribute (so `button.dataset.image` = attr `data-image`)
  *
  * Everything is a pure function of the input string — deterministic,
  * partitioning-independent — and runs per row inside a UDF
  * (extraction is an ingest-side map, never a shuffle key; the
  * downstream analytics stay in codegen).
  */
object HtmlDom {

  final class Node(
      val tag: String,
      val attrs: Map[String, String],
      val parent: Int) {
    var innerStart: Int = -1
    var innerEnd: Int = -1
  }

  private val voidTags = Set("area", "base", "br", "col", "embed", "hr",
    "img", "input", "link", "meta", "param", "source", "track", "wbr")

  /** HTML5 implied end tags on SIBLING OPENS, with the spec's SCOPED
    * SEARCH (r13 — closes the long-documented top-of-stack-only gap):
    * an opening tag in this map runs its close rules IN ORDER; each
    * scans the open-element stack downward for a tag in its `targets`
    * set, STOPPING at its scope-boundary set, and closes everything
    * above and including the match; the loop form handles cascades
    * (`<tr>` closes an open `td` AND the `tr` above it — each
    * iteration pops at least one element). So `<ul><li>a<li>b</ul>`
    * yields sibling `li`s ('a','b' like jsdom), `<ul><li>a<div>b<li>c`
    * closes the first li THROUGH the open div (div is exempt from the
    * li abort set), `<p><b>x<div>` closes the p through the open
    * inline wrapper (button scope), and `<p>a<button><p>b` does NOT
    * close the outer p (button IS its scope boundary) — all as jsdom
    * parses them. li/dt/dd carry TWO rules, per spec (ADVICE r13):
    * the sibling-item search aborts at any SPECIAL element except
    * address/div/p ([[liAbort]] — so `<ul><li>a<section><li>b` nests
    * the second li inside the section, and button, being special,
    * blocks the item search too), while their p-closing step runs
    * separately under button scope. `boundaries = None` means
    * top-of-stack only (`option`, per spec). */
  private val closesP = Set("address", "article", "aside", "blockquote",
    "details", "div", "dl", "fieldset", "figcaption", "figure", "footer",
    "form", "h1", "h2", "h3", "h4", "h5", "h6", "header", "hgroup", "hr",
    "main", "menu", "nav", "ol", "p", "pre", "section", "table", "ul")

  /** The base "in scope" boundary set (HTML5 §13.2.4.2, the elements
    * every scope variant stops at); variants extend it. td/th stay
    * listed even where they are also TARGETS — the scan checks
    * targets before boundaries, so a match at the boundary tag still
    * closes. */
  private val inScopeBase = Set("html", "table", "template", "caption",
    "td", "th", "applet", "object", "marquee")

  /** HTML5 §13.2 "special" category — the abort set of the li/dt/dd
    * sibling-item search is this minus the spec's address/div/p
    * exceptions ([[liAbort]]). */
  private val specialTags = Set("address", "applet", "area", "article",
    "aside", "base", "basefont", "bgsound", "blockquote", "body", "br",
    "button", "caption", "center", "col", "colgroup", "dd", "details",
    "dir", "div", "dl", "dt", "embed", "fieldset", "figcaption",
    "figure", "footer", "form", "frame", "frameset", "h1", "h2", "h3",
    "h4", "h5", "h6", "head", "header", "hgroup", "hr", "html",
    "iframe", "img", "input", "keygen", "li", "link", "listing", "main",
    "marquee", "menu", "meta", "nav", "noembed", "noframes", "noscript",
    "object", "ol", "p", "param", "plaintext", "pre", "script",
    "section", "select", "source", "style", "summary", "table", "tbody",
    "td", "template", "textarea", "tfoot", "th", "thead", "title", "tr",
    "track", "ul", "wbr", "xmp")

  private val liAbort = specialTags -- Set("address", "div", "p")

  private final case class CloseRule(targets: Set[String],
      boundaries: Option[Set[String]])

  /** HTML5 active-formatting elements (§13.2.4.3), kept as a real
    * ACTIVE LIST (r14 — replaces r13's reopen-at-implied-close buffer
    * and closes both of its documented gaps): a formatting element
    * popped by ANY close that is not its own end tag — an implied
    * close, an ancestor's explicit close (`<p><b>x</p>y`), a cascade —
    * stays on the list and is RECONSTRUCTED, in list (= document)
    * order so nesting can never invert, the next time content is
    * inserted: any text character, or any start tag outside
    * [[noReconstructOpens]] (the spec's block/table/metadata rules
    * that insert without reconstructing — their inner text triggers
    * the rebuild instead, which lands the clones in the same places).
    * Its own end tag removes the entry even when the element is no
    * longer on the stack (`<p><b>x</p></b>y` leaves 'y' bare, per the
    * adoption agency's simple case). Remaining simplifications, by
    * choice: no Noah's-ark duplicate cap and no mid-tree adoption-
    * agency reparenting of the FIRST instance — both need markup that
    * interleaves misnested formatting the reference's pages never
    * produce. */
  private val formattingTags = Set("a", "b", "big", "code", "em",
    "font", "i", "nobr", "s", "small", "strike", "strong", "tt", "u")

  /** Start tags that do NOT reconstruct active formatting before
    * inserting (HTML5 "in body": the block/list/table/metadata rules
    * that insert directly; everything else — phrasing content, voids
    * like img/br/input, and the "any other start tag" rule —
    * reconstructs first). ADVICE r14: option/optgroup are NOT here —
    * the spec's "in body" option rule pops a current option, THEN
    * reconstructs, then inserts (matching this parser's implied-close
    * → reconstruct → insert order). Note on clone spans: a
    * tag-triggered reconstruct opens the clone at the trigger's '<',
    * which is innerHTML-correct — the triggering element is the
    * clone's CHILD, so its markup belongs inside the clone's span
    * (innerText strips it; raw-span consumers see the child markup
    * exactly as a never-popped parent would show it). */
  private val noReconstructOpens: Set[String] = closesP ++ Set("li",
    "dt", "dd", "tr", "td", "th", "tbody", "thead", "tfoot", "caption",
    "colgroup", "col", "html", "head", "body", "script", "style",
    "title", "meta", "link", "base", "frameset",
    "frame", "param", "source", "track")

  private val impliedClosedBy: Map[String, Seq[CloseRule]] = {
    val button = inScopeBase + "button" // button scope (p), ~"special"
    val sibling = Map(
      "li" -> Seq(CloseRule(Set("li"), Some(liAbort)),
        CloseRule(Set("p"), Some(button))),
      "dt" -> Seq(CloseRule(Set("dt", "dd"), Some(liAbort)),
        CloseRule(Set("p"), Some(button))),
      "dd" -> Seq(CloseRule(Set("dt", "dd"), Some(liAbort)),
        CloseRule(Set("p"), Some(button))),
      "option" -> Seq(CloseRule(Set("option"), None)),
      "tr" -> Seq(CloseRule(Set("td", "th", "tr"), Some(inScopeBase))),
      "td" -> Seq(CloseRule(Set("td", "th"), Some(inScopeBase))),
      "th" -> Seq(CloseRule(Set("td", "th"), Some(inScopeBase))))
    closesP.foldLeft(sibling) { (m, t) =>
      if (m.contains(t)) m
      else m.updated(t, Seq(CloseRule(Set("p"), Some(button))))
    }
  }

  private def isNameChar(c: Char): Boolean =
    c.isLetterOrDigit || c == '-' || c == '_' || c == ':'

  /** Decode the entity set the extraction paths meet: the five named
    * XML entities plus decimal/hex numeric references. Unknown
    * entities pass through verbatim (tolerance, not validation). */
  def decodeEntities(s: String): String = {
    if (s.indexOf('&') < 0) return s
    val out = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '&') {
        val semi = s.indexOf(';', i + 1)
        val decoded: Option[String] =
          if (semi < 0 || semi - i > 10) None
          else s.substring(i + 1, semi) match {
            case "amp" => Some("&")
            case "lt" => Some("<")
            case "gt" => Some(">")
            case "quot" => Some("\"")
            case "apos" => Some("'")
            case "nbsp" => Some(" ")
            case e if e.startsWith("#x") || e.startsWith("#X") =>
              try Some(Character.toChars(Integer.parseInt(e.drop(2), 16)).mkString)
              catch { case _: Exception => None }
            case e if e.startsWith("#") =>
              try Some(Character.toChars(Integer.parseInt(e.drop(1))).mkString)
              catch { case _: Exception => None }
            case _ => None
          }
        decoded match {
          case Some(d) => out.append(d); i = semi + 1
          case None => out.append(c); i += 1
        }
      } else { out.append(c); i += 1 }
    }
    out.toString
  }

  /** An active-formatting-list entry: `open` is the index in the
    * node list of the currently-open instance (original or latest
    * clone), or -1 while the element is popped and awaiting
    * reconstruction. */
  private final class ActiveFmt(val tag: String,
      val attrs: Map[String, String], var open: Int)

  /** Tokenize into an element list in document order, each with its
    * attribute map, parent link, and inner-content span. */
  def parse(html: String): IndexedSeq[Node] = {
    val lower = html.toLowerCase
    val nodes = ArrayBuffer.empty[Node]
    val stack = ArrayBuffer.empty[Int]
    val active = ArrayBuffer.empty[ActiveFmt]
    var pending = 0 // active entries with open == -1 (awaiting rebuild)
    val n = html.length

    // pop the stack down to and including index k; formatting
    // elements leaving the stack this way stay on the active list
    // (they reconstruct at the next insertion) — only their own end
    // tag removes them (handled at the close-tag site)
    def popTo(k: Int, endPos: Int): Unit = {
      var t = stack.length - 1
      while (t >= k) {
        val ix = stack(t)
        nodes(ix).innerEnd = endPos
        var a = 0
        while (a < active.length) {
          if (active(a).open == ix) { active(a).open = -1; pending += 1 }
          a += 1
        }
        stack.remove(t)
        t -= 1
      }
    }

    // reopen every popped active entry, in LIST (= document) order —
    // outermost first by construction, so nesting can never invert
    def reconstruct(pos: Int): Unit = {
      var a = 0
      while (a < active.length) {
        val e = active(a)
        if (e.open == -1) {
          val clone = new Node(e.tag, e.attrs,
            if (stack.isEmpty) -1 else stack.last)
          clone.innerStart = pos
          clone.innerEnd = -1
          nodes += clone
          stack += nodes.length - 1
          e.open = nodes.length - 1
        }
        a += 1
      }
      pending = 0
    }

    var i = 0
    while (i < n) {
      if (html.charAt(i) == '<') {
        if (html.startsWith("<!--", i)) {
          val e = html.indexOf("-->", i + 4)
          i = if (e < 0) n else e + 3
        } else if (i + 1 < n && html.charAt(i + 1) == '/') {
          var j = i + 2
          val ts = j
          while (j < n && isNameChar(html.charAt(j))) j += 1
          val tag = lower.substring(ts, j)
          val gt = html.indexOf('>', j)
          val after = if (gt < 0) n else gt + 1
          val k = stack.lastIndexWhere(ix => nodes(ix).tag == tag)
          if (k >= 0) {
            // the element's OWN end tag: drop its active entry first
            // so it does not reconstruct (everything popped above it
            // stays active — the <p><b>x</p>y case reopens b at y)
            if (formattingTags(tag)) {
              val tgtIx = stack(k)
              val ai = active.lastIndexWhere(_.open == tgtIx)
              if (ai >= 0) active.remove(ai)
            }
            popTo(k, i)
          } else if (formattingTags(tag)) {
            // end tag for a formatting element that is no longer on
            // the stack (</p></b>y): remove the pending entry so the
            // following text stays bare — the adoption agency's
            // simple case
            val ai = active.lastIndexWhere(_.tag == tag)
            if (ai >= 0) {
              if (active(ai).open == -1) pending -= 1
              active.remove(ai)
            }
          } // other stray closers: ignored
          i = after
        } else if (i + 1 < n && html.charAt(i + 1).isLetter) {
          var j = i + 1
          val ts = j
          while (j < n && isNameChar(html.charAt(j))) j += 1
          val tag = lower.substring(ts, j)
          impliedClosedBy.get(tag).foreach { rules =>
            rules.foreach { rule =>
              var repeat = true
              while (repeat) {
                repeat = false
                rule.boundaries match {
                  case None => // top-of-stack only (option)
                    if (stack.nonEmpty &&
                        rule.targets(nodes(stack.last).tag)) {
                      popTo(stack.length - 1, i)
                      repeat = true
                    }
                  case Some(bounds) =>
                    var k = stack.length - 1
                    var found = -1
                    var stop = false
                    while (k >= 0 && !stop && found < 0) {
                      val t = nodes(stack(k)).tag
                      if (rule.targets(t)) found = k
                      else if (bounds(t)) stop = true
                      else k -= 1
                    }
                    if (found >= 0) {
                      popTo(found, i)
                      repeat = true
                    }
                }
              }
            }
          }
          // spec insertion order: reconstruct active formatting THEN
          // insert, so the clones become the new element's ancestors
          if (pending > 0 && !noReconstructOpens(tag)) reconstruct(i)
          val attrs = Map.newBuilder[String, String]
          var selfClose = false
          var done = false
          while (!done && j < n) {
            while (j < n && html.charAt(j).isWhitespace) j += 1
            if (j >= n) done = true
            else if (html.charAt(j) == '>') { j += 1; done = true }
            else if (html.charAt(j) == '/' && j + 1 < n &&
                html.charAt(j + 1) == '>') {
              j += 2; selfClose = true; done = true
            } else {
              val as = j
              while (j < n && !html.charAt(j).isWhitespace &&
                html.charAt(j) != '=' && html.charAt(j) != '>' &&
                html.charAt(j) != '/') j += 1
              val aname = lower.substring(as, j)
              var save = j
              while (save < n && html.charAt(save).isWhitespace) save += 1
              if (save < n && html.charAt(save) == '=') {
                j = save + 1
                while (j < n && html.charAt(j).isWhitespace) j += 1
                var avalue = ""
                if (j < n && (html.charAt(j) == '"' || html.charAt(j) == '\'')) {
                  val q = html.charAt(j); j += 1
                  val vs = j
                  while (j < n && html.charAt(j) != q) j += 1
                  avalue = html.substring(vs, j)
                  if (j < n) j += 1
                } else {
                  val vs = j
                  while (j < n && !html.charAt(j).isWhitespace &&
                    html.charAt(j) != '>') j += 1
                  avalue = html.substring(vs, j)
                }
                if (aname.nonEmpty) attrs += aname -> decodeEntities(avalue)
              } else if (aname.nonEmpty) attrs += aname -> "" // bare attr
              else j += 1 // lone '/', not a self-close: skip
            }
          }
          val node = new Node(tag, attrs.result(),
            if (stack.isEmpty) -1 else stack.last)
          node.innerStart = j
          node.innerEnd = j
          nodes += node
          if (!selfClose && !voidTags(tag)) {
            if (tag == "script" || tag == "style") {
              // raw-text elements: inner '<' is content, not markup
              val close = lower.indexOf("</" + tag, j)
              node.innerEnd = if (close < 0) n else close
              val gt2 = html.indexOf('>', node.innerEnd)
              j = if (gt2 < 0) n else gt2 + 1
            } else {
              node.innerEnd = -1 // open until its close tag / EOF
              stack += nodes.length - 1
              if (formattingTags(tag))
                active += new ActiveFmt(tag, node.attrs, nodes.length - 1)
            }
          }
          i = j
        } else {
          // stray '<' is text — a character token reconstructs
          if (pending > 0) reconstruct(i)
          i += 1
        }
      } else {
        // character token: reconstruct popped formatting before the
        // text lands (the <p><b>x</p>y case — VERDICT r13 item 6)
        if (pending > 0) reconstruct(i)
        i += 1
      }
    }
    stack.foreach(ix => nodes(ix).innerEnd = n) // unclosed at EOF
    nodes.toIndexedSeq
  }

  // --- selector engine -------------------------------------------------

  final case class Simple(tag: Option[String], id: Option[String],
      classes: Seq[String])

  /** `tag`, `.class`, `#id`, compounds (`h1.title`), descendant lists
    * (`.newsfull__body p`). */
  def parseSelector(sel: String): Seq[Simple] =
    sel.trim.split("\\s+").toSeq.filter(_.nonEmpty).map { part =>
      var tag: Option[String] = None
      var id: Option[String] = None
      val classes = ArrayBuffer.empty[String]
      var i = 0
      while (i < part.length) {
        val kind = part.charAt(i)
        val start = if (kind == '.' || kind == '#') i + 1 else i
        var j = start
        while (j < part.length && part.charAt(j) != '.' &&
          part.charAt(j) != '#') j += 1
        val name = part.substring(start, j)
        kind match {
          case '.' => classes += name
          case '#' => id = Some(name)
          case _ => tag = Some(name.toLowerCase)
        }
        i = j
      }
      Simple(tag, id, classes.toSeq)
    }

  private def matchesSimple(nd: Node, s: Simple): Boolean =
    s.tag.forall(_ == nd.tag) &&
      s.id.forall(v => nd.attrs.get("id").contains(v)) &&
      s.classes.forall(c =>
        nd.attrs.get("class").exists(_.split("\\s+").contains(c)))

  private def ancestorsMatch(nodes: IndexedSeq[Node], ix: Int,
      sims: Seq[Simple]): Boolean =
    if (sims.isEmpty) true
    else {
      var p = nodes(ix).parent
      while (p >= 0) {
        if (matchesSimple(nodes(p), sims.last) &&
          ancestorsMatch(nodes, p, sims.init)) return true
        p = nodes(p).parent
      }
      false
    }

  /** Indexes (document order) of elements matching the selector. */
  def select(nodes: IndexedSeq[Node], selector: String): Seq[Int] = {
    val sims = parseSelector(selector)
    if (sims.isEmpty) Seq.empty
    else nodes.indices.filter { ix =>
      matchesSimple(nodes(ix), sims.last) &&
        ancestorsMatch(nodes, ix, sims.init)
    }
  }

  /** textContent of a span: tags stripped, comments skipped, entities
    * decoded; whitespace left as-is (jsdom textContent semantics). */
  def innerText(html: String, from: Int, to: Int): String = {
    val out = new java.lang.StringBuilder(to - from)
    var i = from
    while (i < to) {
      val c = html.charAt(i)
      if (c == '<') {
        if (html.startsWith("<!--", i)) {
          val e = html.indexOf("-->", i + 4)
          i = if (e < 0 || e + 3 > to) to else e + 3
        } else if (i + 1 < to && (html.charAt(i + 1).isLetter ||
            html.charAt(i + 1) == '/')) {
          val gt = html.indexOf('>', i + 1)
          i = if (gt < 0 || gt >= to) to else gt + 1
        } else { out.append(c); i += 1 }
      } else { out.append(c); i += 1 }
    }
    decodeEntities(out.toString)
  }

  // --- row-level extraction API (UDF bodies) ---------------------------

  private def textOf(html: String, nd: Node): String =
    // raw-text elements: content is verbatim (no tags/entities inside)
    if (nd.tag == "script" || nd.tag == "style")
      html.substring(nd.innerStart, nd.innerEnd)
    else innerText(html, nd.innerStart, nd.innerEnd)

  /** innerText of every match, document order. */
  def selectTexts(html: String, selector: String): Seq[String] = {
    if (html == null) return Seq.empty
    val nodes = parse(html)
    select(nodes, selector).map(ix => textOf(html, nodes(ix)))
  }

  /** Raw inner-HTML of every match, document order — the reference's
    * `item.innerHTML` re-wrap pattern (eldolar.js:24: each table row's
    * fragment is re-parsed as its own document and sub-selected). */
  def selectHtmls(html: String, selector: String): Seq[String] = {
    if (html == null) return Seq.empty
    val nodes = parse(html)
    select(nodes, selector).map { ix =>
      html.substring(nodes(ix).innerStart, nodes(ix).innerEnd)
    }
  }

  /** Attribute value of every match (null where the match lacks the
    * attribute), document order. `data-*` names cover dataset reads. */
  def selectAttrs(html: String, selector: String, attr: String): Seq[String] = {
    if (html == null) return Seq.empty
    val nodes = parse(html)
    val a = attr.toLowerCase
    select(nodes, selector).map(ix => nodes(ix).attrs.getOrElse(a, null))
  }

  /** First selector in the list with ≥1 match wins; all its matches'
    * innerTexts return (reference getContentFromSelectors,
    * news/elimparcial.js:49-60). */
  def selectorFallbackTexts(html: String, selectors: Seq[String]): Seq[String] = {
    if (html == null) return Seq.empty
    val nodes = parse(html)
    selectors.iterator
      .map(sel => select(nodes, sel))
      .find(_.nonEmpty)
      .map(_.map(ix => textOf(html, nodes(ix))))
      .getOrElse(Seq.empty)
  }
}
