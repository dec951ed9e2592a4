"""Readability behavior on realistic page shapes beyond the reference's
fixtures: comment sections, share widgets, code-heavy docs, link farms.
Assertions derive from the public Mozilla Readability semantics
(SURVEY.md Appendix A.1), not from the reference tests."""

from sift_spark.core.extract import to_markdown

NEWS_PAGE = """<!DOCTYPE html><html><head><title>News</title></head><body>
<header class="masthead"><h1>The Daily Sift</h1>
  <nav><a href="/">Home</a> <a href="/politics">Politics</a></nav></header>
<main>
 <article>
  <h1>Flour Shortage Hits Local Bakeries</h1>
  <p>Bakeries across the region reported shortages of sifted flour on
  Tuesday, forcing many to reduce production of their signature carrot
  cakes. Suppliers blamed unusually high demand, and several mills said
  deliveries would resume within the week.</p>
  <p>Industry analysts noted that flour consumption has risen steadily,
  with home bakers driving much of the increase. The shortage follows a
  similar event last spring, when sugar supplies ran low for nearly a
  month across the same distribution network.</p>
  <figure><img src="/img/flour.jpg" alt="flour"><figcaption>Sifted flour
  at a local mill.</figcaption></figure>
 </article>
 <div class="share-tools"><a href="#">Share on X</a>
   <a href="#">Share on Facebook</a></div>
 <section class="comments">
  <h3>Comments</h3>
  <div class="comment"><p>First! Great article about flour.</p></div>
  <div class="comment"><p>I disagree with the analysts entirely.</p></div>
 </section>
</main>
<aside class="sidebar"><h3>Trending</h3><ul>
  <li><a href="#">Ten cake recipes</a></li></ul></aside>
<footer class="site-footer"><p>Copyright 2025 The Daily Sift.</p></footer>
</body></html>"""


def test_news_page_keeps_article_drops_chrome():
    text, error = to_markdown(NEWS_PAGE)
    assert error is None
    assert "Flour Shortage Hits Local Bakeries" in text
    assert "reported shortages" in text
    assert "Industry analysts" in text
    for dropped in ("Share on X", "First! Great article", "Trending",
                    "Copyright 2025", "The Daily Sift\n"):
        assert dropped not in text, dropped


DOCS_PAGE = """<html><body>
<div class="content">
 <article class="doc-body">
  <h1>Using the sift API</h1>
  <p>The extraction API accepts an HTML byte stream and returns clean
  markdown text. Configure the selector and budget options before
  calling the run method, as shown in the example below.</p>
  <pre><code>from sift import run
result = run(html, budget=200)</code></pre>
  <p>The budget parameter controls output size in tokens, words, or
  characters. When a search query is supplied, the budget applies to the
  selected context instead of the whole document.</p>
  <table><tr><th>option</th><th>default</th></tr>
  <tr><td>budget</td><td>2500</td></tr></table>
 </article>
</div>
<div class="related-widget"><h4>Related</h4>
 <a href="#">Other tools</a></div>
</body></html>"""


def test_docs_page_preserves_code_and_table():
    text, error = to_markdown(DOCS_PAGE)
    assert error is None
    assert "Using the sift API" in text
    assert "```" in text and "from sift import run" in text
    assert "| option | default |" in text
    assert "Other tools" not in text


LINK_FARM = """<html><body>
<div class="content">
 <p>One real paragraph of substantial content describing the actual
 topic of this page in enough detail to score as the main candidate.</p>
</div>
<div class="content2">
 <p><a href="/1">link one</a> <a href="/2">link two</a>
 <a href="/3">link three</a> <a href="/4">link four</a>
 <a href="/5">link five</a> <a href="/6">link six</a></p>
</div>
</body></html>"""


def test_link_density_penalizes_link_farms():
    text, error = to_markdown(LINK_FARM)
    assert error is None
    assert "One real paragraph" in text
    assert "link one" not in text


def test_empty_body_yields_empty():
    text, error = to_markdown("<html><body></body></html>")
    assert error is None
    assert text.strip() == ""


# Regression: candidates ABOVE <body> (notably <html>) are not covered by
# the one-pass density tables built over the body subtree. They must fall
# back to the live link-density computation instead of defaulting to 0.0,
# otherwise a link-heavy page lets <html> escape the penalty, win the
# candidate race, and pull <head>/<title> text into the article.
LINK_HEAVY_PAGE = (
    "<html><head><title>LEAKED TITLE TEXT</title></head><body>\n<div>\n"
    " <p>Pick a topic, any topic, from the long directory listing below.\n"
    + "".join(
        ' <a href="/x%d">one, two, three, four, five, six words in a long'
        " anchor</a>\n" % i
        for i in range(16)
    )
    + " </p>\n</div>\n</body></html>"
)


def test_html_ancestor_does_not_escape_link_density():
    from sift_spark.core.htmlparser import parse
    from sift_spark.core.readability import extract_article

    article = extract_article(parse(LINK_HEAVY_PAGE))
    assert article is not None
    assert article.tag != "html"
    assert "LEAKED TITLE TEXT" not in article.inner_text()


def test_sibling_merge_detaches_from_source_tree():
    from sift_spark.core.htmlparser import parse
    from sift_spark.core.readability import extract_article

    root = parse(NEWS_PAGE)
    article = extract_article(root)
    assert article is not None
    # every node re-parented into the article must be unlinked from its
    # old parent: walking the ORIGINAL tree must not reach article nodes
    article_ids = {id(n) for n in article.iter()}
    for node in root.iter():
        assert id(node) not in article_ids, (node.tag, node.attrs)
