package graft

import graft.ext.TextOps
import org.apache.spark.sql.functions._

/** Per-rule boundary coverage for
  * [[graft.ext.TextOps.extractMainContent]] (q145) — every jusText
  * signal exercised from BOTH sides of its threshold, plus the
  * wholesale prunes, entity decoding (incl. the no-double-decode
  * order), and the block re-join contract.
  */
class HtmlExtractSpec extends SparkSpec {
  import spark.implicits._

  private def extract(html: String): (Long, Long, String) = {
    val r = TextOps.extractMainContent(
      Seq(html).toDF("html"), "html").select(
      col("blocks_total"), col("blocks_kept"), col("text_main")).head
    (r.getLong(0), r.getLong(1), r.getString(2))
  }

  private def page(blocks: String*): String =
    "<html><body>" + blocks.map(b => s"<p>$b</p>").mkString +
      "</body></html>"

  test("min-chars boundary: 24 visible chars drop, 25 keep") {
    val t24 = "it is of " + "x" * 15
    val t25 = "it is of " + "x" * 16
    assert(t24.length == 24 && t25.length == 25)
    assert(extract(page(t24))._3 == "")
    assert(extract(page(t25))._3 == t25)
  }

  test("link-density boundary: exactly 200 permille keeps, one more drops") {
    // visible text 25 chars; 5 link chars: 5·1000 == 25·200 → keep
    val atBoundary = "<a href=\"/x\">aaaaa</a> it is of xxxxxxxxxx"
    // 6 link chars over 25 visible: 6000 > 5000 → drop
    val over = "<a href=\"/x\">aaaaaa</a> it is of xxxxxxxxx"
    val (_, k1, t1) = extract(page(atBoundary))
    assert(k1 == 1 && t1 == "aaaaa it is of xxxxxxxxxx", s"got '$t1'")
    assert(extract(page(over))._2 == 0)
  }

  test("stopword-density boundary at 50 permille; long blocks escape") {
    // 1 stopword / 20 words == exactly 50 permille → keep (short block)
    val at = ("the" +: Seq.fill(19)("abcd")).mkString(" ")
    assert(at.length < 120)
    assert(extract(page(at))._2 == 1)
    // 1 / 21 words < 50 permille and short → drop
    val under = ("the" +: Seq.fill(20)("abcd")).mkString(" ")
    assert(under.length < 120)
    assert(extract(page(under))._2 == 0)
    // no stopwords at all but 120 chars → the long-block escape keeps it
    assert(extract(page("z" * 120))._2 == 1)
    assert(extract(page("z" * 119))._2 == 0)
  }

  test("script/style/comment/head/nav/header/footer/aside are pruned") {
    val html = "<html><head><title>leaky title words</title>" +
      "<style>p { margin: 0; }</style>" +
      "<script>var secretvar = 1;</script></head>" +
      "<body><nav>navigation words here</nav>" +
      "<header>masthead words here</header>" +
      "<aside>sidebar words here</aside>" +
      "<p>it is the kept paragraph of this little page.</p>" +
      "<footer>footer words here</footer></body></html>"
    val (_, kept, txt) = extract(html)
    assert(kept == 1)
    assert(txt == "it is the kept paragraph of this little page.")
    for (leak <- Seq("leaky", "margin", "secretvar", "navigation",
        "masthead", "sidebar", "footer words"))
      assert(!txt.contains(leak), s"pruned content leaked: $leak")
  }

  test("uppercase and multi-line boilerplate is still pruned (real crawl shape)") {
    // real pages mix tag case and put newlines inside script/style/head;
    // the (?is)/(?i) flags on PruneHtmlPatterns/BlockSplitPattern are
    // what makes these vanish — without them every block here leaks
    val html = "<HTML><HEAD>\n<TITLE>leaky title\nwords</TITLE>\n" +
      "<STYLE type=\"text/css\">\np { margin: 0; }\nbody { color: red; }\n</STYLE>\n" +
      "<Script>\nvar secretvar = 1;\nfunction f() { return 2; }\n</SCRIPT>\n" +
      "</HEAD>\n<BODY><NAV>\nnavigation\nwords here\n</NAV>" +
      "<!-- a\nmulti-line\ncomment -->" +
      "<P>it is the kept paragraph of this little page.</P>" +
      "<FOOTER>\nfooter words here\n</FOOTER></BODY></HTML>"
    val (_, kept, txt) = extract(html)
    assert(kept == 1, s"kept=$kept txt='$txt'")
    assert(txt == "it is the kept paragraph of this little page.")
    for (leak <- Seq("leaky", "margin", "secretvar", "navigation",
        "comment", "footer words"))
      assert(!txt.contains(leak), s"pruned content leaked: $leak")
  }

  test("uppercase anchors count as link chars (<A HREF> density)") {
    // 6 link chars over 25 visible chars = 240 permille > 200 → drop;
    // without (?i) on AnchorTextPattern the anchor text would count as
    // plain visible text and the block would survive
    val over = "<A HREF=\"/x\">aaaaaa</A> it is of xxxxxxxxx"
    assert(extract(page(over))._2 == 0)
  }

  test("header is pruned before head (open-tag prefix collision)") {
    // <head[^>]*> would match <header> if applied first; the documented
    // order strips the header element, leaving head intact to strip
    val html = "<html><head><title>t</title></head><body>" +
      "<header>banner words that must vanish</header>" +
      "<p>it is the body text of a small example page.</p></body></html>"
    val (_, _, txt) = extract(html)
    assert(txt == "it is the body text of a small example page.")
  }

  test("entities decode once, &amp; last (no double decode)") {
    val html = page(
      "entities &lt;x&gt; &quot;q&quot; &#39;s&#39;&nbsp;and &amp;lt; " +
        "stay in this long enough line of the test.")
    val (_, _, txt) = extract(html)
    assert(txt.contains("<x> \"q\" 's'"), s"got '$txt'")
    assert(txt.contains("and &lt; stay"),
      s"&amp;lt; must decode to &lt;, not <: '$txt'")
  }

  test("empty and markup-only pages come out empty, not missing") {
    assert(extract("")._3 == "")
    val (_, kept, txt) = extract("<html><body><div></div></body></html>")
    assert(kept == 0 && txt == "")
  }

  test("kept blocks re-join in document order") {
    val a = "it is the first paragraph of this exercised page."
    val b = "it is the second paragraph of this exercised page."
    val (_, kept, txt) = extract(page(a, b))
    assert(kept == 2)
    assert(txt == s"$a\n$b")
  }

  test("original columns survive and counts are consistent") {
    val df = TextOps.extractMainContent(
      Seq((7L, page("it is the kept one of them all right here.")))
        .toDF("id", "html"), "html")
    val r = df.select("id", "blocks_total", "blocks_kept").head
    assert(r.getLong(0) == 7L)
    assert(r.getLong(2) <= r.getLong(1))
  }
}
