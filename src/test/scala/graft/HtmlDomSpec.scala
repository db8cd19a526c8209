package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.HtmlDom

/** Golden fixtures for the tolerant DOM engine — messy variants of the
  * reference's elimparcial shapes (news/elimparcial.js:29-60): attribute
  * reorder, single/un-quoted values, nested same-class tags, implied
  * closes, dataset reads, descendant selectors. The regex extractor
  * these shapes were built to break mis-parses every one of them. */
class HtmlDomSpec extends AnyFunSuite {

  test("querySelectorAll('.news--box') with reordered, mixed-quote attributes") {
    val html =
      """<div class="wrap">
        |<div data-x=1 class="news--box featured"><button data-url='/n/1'
        |  data-title="First &amp; Best" data-image=/static/1.jpg>Go</button></div>
        |<div class="news--box"><button data-image="https://cdn.x/2.jpg"
        |  data-url="/n/2" data-title='Second "quoted"'>Go</button></div>
        |</div>""".stripMargin
    val titles = HtmlDom.selectAttrs(html, ".news--box button", "data-title")
    assert(titles == Seq("First & Best", "Second \"quoted\""))
    val images = HtmlDom.selectAttrs(html, ".news--box button", "data-image")
    assert(images == Seq("/static/1.jpg", "https://cdn.x/2.jpg"))
    val urls = HtmlDom.selectAttrs(html, ".news--box button", "data-url")
    assert(urls == Seq("/n/1", "/n/2"))
  }

  test("nested same-class tags produce correct spans (regex killer #1)") {
    val html = """<div class="box">outer<div class="box">inner</div>tail</div>"""
    val texts = HtmlDom.selectTexts(html, ".box")
    assert(texts == Seq("outerinnertail", "inner"))
  }

  test("implied closes: sibling <li> opens close each other (jsdom parity); </ul> closes the tail; stray closer ignored") {
    val html = "<ul><li>a<li>b</ul></p><p>c</p>"
    // r9: HTML5 implied end tags on sibling opens — 'a' and 'b' are
    // SIBLINGS like querySelectorAll sees them, not nested ('ab','b')
    assert(HtmlDom.selectTexts(html, "li") == Seq("a", "b"))
    assert(HtmlDom.selectTexts(html, "p") == Seq("c"))
  }

  test("implied closes: unclosed p siblings, table cells/rows, options") {
    assert(HtmlDom.selectTexts("<div><p>one<p>two</div>", "p") ==
      Seq("one", "two"))
    val table = "<table><tr><td>a<td>b<tr><td>c</table>"
    assert(HtmlDom.selectTexts(table, "td") == Seq("a", "b", "c"))
    assert(HtmlDom.selectTexts(table, "tr") == Seq("ab", "c"))
    assert(HtmlDom.selectTexts(
      "<select><option>x<option>y</select>", "option") == Seq("x", "y"))
    // r13 (was the documented top-of-stack limitation): the second li
    // now closes its sibling THROUGH the open div — scoped search
    assert(HtmlDom.selectTexts("<li>a<div>w<li>b</div></li>", "li") ==
      Seq("aw", "b"))
  }

  test("unclosed element closes at EOF; comment and script are not markup") {
    val html =
      """<div class="body"><!-- <p>not me</p> --><script>if (a<b) x("<p>")</script><p>real"""
    assert(HtmlDom.selectTexts(html, "p") == Seq("real"))
    assert(HtmlDom.selectTexts(html, "script") == Seq("""if (a<b) x("<p>")"""))
  }

  test("descendant selectors: .newsfull__body p skips p outside the body") {
    val html =
      """<p>lede outside</p>
        |<div class="newsfull__body"><div><p>one</p></div><p>two</p></div>
        |<footer><p>legal</p></footer>""".stripMargin
    assert(HtmlDom.selectTexts(html, ".newsfull__body p") == Seq("one", "two"))
  }

  test("selector fallback: first selector with matches wins, all matches return") {
    val a = """<div class="newsfull__body"><p>x</p><p>y</p></div>
              |<div class="land-see-body-content"><p>z</p></div>""".stripMargin
    val b = """<div class="land-see-body-content"><p>z1</p><p>z2</p></div>"""
    val sels = Seq(".newsfull__body p", ".land-see-body-content p")
    assert(HtmlDom.selectorFallbackTexts(a, sels) == Seq("x", "y"))
    assert(HtmlDom.selectorFallbackTexts(b, sels) == Seq("z1", "z2"))
    assert(HtmlDom.selectorFallbackTexts("<div></div>", sels) == Seq.empty)
  }

  test("entities decode in text and attributes; innerText strips nested markup") {
    val html =
      """<h1 title="A &lt;tag&gt; &#65;">M&aacute;s <b>de</b> 100 &amp; counting</h1>"""
    assert(HtmlDom.selectTexts(html, "h1") ==
      Seq("M&aacute;s de 100 & counting")) // unknown entity passes through
    assert(HtmlDom.selectAttrs(html, "h1", "title") == Seq("A <tag> A"))
  }

  test("void and self-closing elements take no children") {
    val html = """<div class="a"><img src=/i.jpg><br/><span>s</span></div>"""
    assert(HtmlDom.selectAttrs(html, ".a img", "src") == Seq("/i.jpg"))
    assert(HtmlDom.selectTexts(html, ".a") == Seq("s"))
    assert(HtmlDom.selectTexts(html, "span") == Seq("s"))
  }

  test("compound selectors and ids; missing attribute reads as null") {
    val html =
      """<h1 class="title main" id="top">T</h1><h1 class="other">O</h1>"""
    assert(HtmlDom.selectTexts(html, "h1.title") == Seq("T"))
    assert(HtmlDom.selectTexts(html, "#top") == Seq("T"))
    assert(HtmlDom.selectTexts(html, "h1") == Seq("T", "O"))
    assert(HtmlDom.selectAttrs(html, "h1", "id") == Seq("top", null))
  }

  test("innerHTML fragments re-parse and sub-select (the eldolar row pattern)") {
    val html =
      """<table id="dllsTable"><tbody>
        |<tr><td><a href="//b1.x/mx"><span title="B1">x</span></a></td>
        |  <td class="xTimes">17.10</td><td class="xTimes">17.50</td></tr>
        |<tr><td><a href="//b2.x/mx"><span title="B2">x</span></a></td>
        |  <td class="xTimes">16.95</td></tr>
        |</tbody></table>""".stripMargin
    val frags = HtmlDom.selectHtmls(html, "#dllsTable tbody tr")
    assert(frags.length == 2)
    // each fragment is an independent parse, exactly as the reference
    // re-wraps item.innerHTML in a fresh JSDOM
    assert(HtmlDom.selectAttrs(frags(0), "a span", "title") == Seq("B1"))
    assert(HtmlDom.selectTexts(frags(0), ".xTimes") == Seq("17.10", "17.50"))
    assert(HtmlDom.selectTexts(frags(1), ".xTimes") == Seq("16.95"))
  }

  test("bare attributes and whitespace-around-= tolerate") {
    val html = """<button disabled data-title = "Spaced" >x</button>"""
    assert(HtmlDom.selectAttrs(html, "button", "disabled") == Seq(""))
    assert(HtmlDom.selectAttrs(html, "button", "data-title") == Seq("Spaced"))
  }

  test("block opens close an open <p> (HTML5 p-closing set — the r9 gap)") {
    // div is the paragraph's SIBLING, not its child: p's text is 'a'
    assert(HtmlDom.selectTexts("<p>a<div>b</div>", "p") == Seq("a"))
    assert(HtmlDom.selectTexts("<p>a<div>b</div>", "p div") == Seq())
    // cascades through the whole block set, including headings and hr
    assert(HtmlDom.selectTexts("<p>x<h2>t</h2><p>y<ul><li>i</ul>", "p")
      == Seq("x", "y"))
    // scoped search (r13): the p closes THROUGH the open inline
    // wrapper — the div is the paragraph's sibling, as jsdom parses
    // it, and the formatting <b> is RECONSTRUCTED inside the div
    assert(HtmlDom.selectTexts("<p><b>x<div>d</div></b></p>", "p")
      == Seq("x"))
    assert(HtmlDom.selectTexts("<p><b>x<div>d</div></b></p>", "div")
      == Seq("d"))
    assert(HtmlDom.selectTexts("<p><b>x<div>d</div></b></p>", "div b")
      == Seq("d"))
  }

  test("formatting-element reconstruction on implied closes (r13)") {
    // nested formatting reopens in nesting order inside the trigger
    assert(HtmlDom.selectTexts("<p><b><i>x<div>d</div>", "div b i")
      == Seq("d"))
    // attributes survive the clone
    assert(HtmlDom.selectAttrs(
      "<p><b class=\"k\">x<div>d</div>", "div b", "class") == Seq("k"))
    // sibling li: the open <b> continues into the second item
    assert(HtmlDom.selectTexts("<ul><li><b>a<li>b</ul>", "li b")
      == Seq("a", "b"))
    // void trigger: <hr> closes the p, the b reopens as a sibling
    // after it and wraps the trailing text
    assert(HtmlDom.selectTexts("<div><p><b>x<hr>y</div>", "div b")
      == Seq("x", "y"))
    // non-formatting wrappers are NOT reconstructed
    assert(HtmlDom.selectTexts("<p><span>x<div>d</div>", "div span")
      == Seq())
  }

  test("scoped implied closes: through non-boundary wrappers, stopped at scope boundaries (r13)") {
    // li closes its open sibling THROUGH the open div (div is not a
    // list-scope boundary): the first li contains the div, the second
    // is its sibling
    assert(HtmlDom.selectTexts("<ul><li>a<div>b</div><li>c</ul>", "ul li")
      == Seq("ab", "c"))
    assert(HtmlDom.selectTexts("<ul><li>a<div>b<li>c</ul>", "ul li")
      == Seq("ab", "c"))
    // button IS a p scope boundary: the outer p is NOT closed by a p
    // opened inside the button — the inner p nests
    assert(HtmlDom.selectTexts("<p>a<button><p>b</button></p>", "p p")
      == Seq("b"))
    // table scope: a td in another CELL is out of reach — the inner
    // table's td does not close the outer one
    assert(HtmlDom.selectTexts(
      "<table><tr><td>x<table><tr><td>y</td></tr></table>z</td></tr></table>",
      "td td") == Seq("y"))
  }

  test("text-triggered formatting reconstruction after an explicit block close (VERDICT r13 item 6)") {
    // </p> pops the open <b>; the bare trailing text reopens it —
    // the active-formatting list survives closes that are not the
    // element's own end tag
    assert(HtmlDom.selectTexts("<p><b>x</p>y", "b") == Seq("x", "y"))
    // the clone persists across a following block: jsdom nests the
    // next <p> inside the reopened <b>
    assert(HtmlDom.selectTexts("<p><b>x</p>y<p>z", "b") == Seq("x", "yz"))
    assert(HtmlDom.selectTexts("<p><b>x</p>y<p>z", "b p") == Seq("z"))
    // the element's OWN end tag removes the entry even off-stack:
    // </b> after </p> leaves the trailing text bare
    assert(HtmlDom.selectTexts("<p><b>x</p></b>y", "b") == Seq("x"))
    // reconstruction before a phrasing start tag (spec order:
    // reconstruct THEN insert — the clone is the span's ancestor)
    assert(HtmlDom.selectTexts("<p><b>x</p><span>y</span>", "b span")
      == Seq("y"))
  }

  test("option/optgroup reconstruct active formatting before inserting (ADVICE r14)") {
    // the "in body" option rule pops a current option, reconstructs,
    // THEN inserts — so a formatting element popped by the preceding
    // </p> reopens around the option (jsdom parity)
    assert(HtmlDom.selectTexts("<p><b>x</p><option>y</option>",
      "b option") == Seq("y"))
    assert(HtmlDom.selectTexts("<p><b>x</p><optgroup><option>y",
      "b option") == Seq("y"))
    // sibling-option implied close still fires first: pop option,
    // reconstruct, insert — the second option stays b-wrapped and a
    // SIBLING of the first, never nested
    assert(HtmlDom.selectTexts("<p><b>x</p><option>u<option>v",
      "b option") == Seq("u", "v"))
  }

  test("cascaded implied closes reconstruct formatting outermost-first (ADVICE r13)") {
    // <tr> cascades through td AND tr, popping two formatting
    // elements from different segments; the clones must reopen in
    // document order (o outside i), never inverted
    val html = "<table><tr><b class=o>u<td>v<b class=i>w<tr>z</table>"
    assert(HtmlDom.selectTexts(html, "b.o b.i") == Seq("w", "z"))
    assert(HtmlDom.selectTexts(html, "b.i b.o") == Seq())
  }

  test("li sibling search aborts at special elements except address/div/p (ADVICE r13)") {
    // section is HTML5-special: the second li must NOT close the
    // first through it — it nests inside the section, as jsdom does
    assert(HtmlDom.selectTexts("<ul><li>a<section><li>b</section></ul>",
      "section li") == Seq("b"))
    assert(HtmlDom.selectTexts("<ul><li>a<section><li>b</section></ul>",
      "li") == Seq("ab", "b"))
    // address and div stay transparent to the search
    assert(HtmlDom.selectTexts("<ul><li>a<address>w<li>b</ul>", "li")
      == Seq("aw", "b"))
  }

  test("li/dt/dd also close an open <p> (ADVICE r12)") {
    // the li is the p's sibling under the ul, as jsdom parses it
    assert(HtmlDom.selectTexts("<ul><p>a<li>b</ul>", "p") == Seq("a"))
    assert(HtmlDom.selectTexts("<ul><p>a<li>b</ul>", "p li") == Seq())
    assert(HtmlDom.selectTexts("<ul><p>a<li>b</ul>", "ul li") == Seq("b"))
    // same for the definition-list pair
    assert(HtmlDom.selectTexts("<dl><p>t<dt>k<dd>v</dl>", "p")
      == Seq("t"))
    assert(HtmlDom.selectTexts("<dl><p>t<dt>k<dd>v</dl>", "dl dt")
      == Seq("k"))
  }
}
