"""Boilerplate removal (jusText-style main-content extraction)."""

from __future__ import annotations

from nifi_extracttext_processor_spark.formats.boilerplate import (
    html_main_content, segment_blocks,
)

ARTICLE_P1 = ("The committee announced on Tuesday that the new policy "
              "would take effect at the start of the next fiscal year, "
              "and officials said they expect it to have a measurable "
              "impact on the region's economy within a decade.")
ARTICLE_P2 = ("Analysts were quick to point out that the plan depends "
              "on funding that has not yet been approved, and that "
              "similar efforts in the past have stalled when political "
              "support faded after the first budget cycle.")

PAGE = f"""
<html><head><title>News</title>
<script>var x = 1; if (x) {{ track("nav"); }}</script>
<style>.nav {{ color: red }}</style>
</head><body>
<nav><ul>
  <li><a href="/">Home</a></li>
  <li><a href="/sports">Sports</a></li>
  <li><a href="/weather">Weather</a></li>
</ul></nav>
<div class="cookie">Accept cookies? <a href="/yes">Yes</a> <a href="/no">No</a></div>
<article>
  <h2>Policy shift announced</h2>
  <p>{ARTICLE_P1}</p>
  <p>{ARTICLE_P2}</p>
  <p>Officials declined further comment.</p>
</article>
<aside><h3>Related</h3>
  <ul><li><a href="/a">Story one</a></li><li><a href="/b">Story two</a></li></ul>
</aside>
<footer><a href="/terms">Terms</a> | <a href="/privacy">Privacy</a> | © 2026</footer>
</body></html>
"""


class TestMainContent:
    def test_keeps_article_drops_chrome(self):
        out = html_main_content(PAGE)
        assert ARTICLE_P1 in out
        assert ARTICLE_P2 in out
        assert "Home" not in out
        assert "Accept cookies" not in out
        assert "Story one" not in out
        assert "Privacy" not in out
        assert "track(" not in out

    def test_short_block_between_good_is_kept(self):
        out = html_main_content(PAGE)
        assert "Officials declined further comment." in out

    def test_heading_ahead_of_good_is_kept(self):
        out = html_main_content(PAGE)
        assert "Policy shift announced" in out

    def test_all_boilerplate_page_yields_empty(self):
        nav = ("<html><body><nav>" +
               "".join(f'<li><a href="/{i}">Link {i}</a></li>'
                       for i in range(30)) +
               "</nav></body></html>")
        assert html_main_content(nav) == ""

    def test_plain_text_without_tags(self):
        # one long clean block → good
        assert ARTICLE_P1 in html_main_content(
            f"<p>{ARTICLE_P1}</p>")

    def test_total_on_garbage(self):
        for junk in (b"", b"\x00\xff\xfe", b"<<<<not html",
                     "caf\xe9".encode("latin-1"),
                     b"<p>" * 1000, b"</div>" * 50 + b"<a href='"):
            html_main_content(junk)  # must not raise

    def test_link_density_classification(self):
        blocks = segment_blocks(
            '<p><a href="/x">all of this text is one link here</a></p>'
            f"<p>{ARTICLE_P1}</p>")
        labels = {b["text"][:10]: b["label"] for b in blocks}
        assert labels["all of thi"] == "bad"
        assert labels[ARTICLE_P1[:10]] == "good"

    def test_entities_unescaped(self):
        out = html_main_content(
            "<p>Research &amp; development teams said the effort was "
            "the largest that they had ever funded, and that results "
            "would be published in the coming year.</p>")
        assert "Research & development" in out


class TestSparkOperator:
    def test_extract_main_content_e2e(self, spark):
        from nifi_extracttext_processor_spark.operators.extract import (
            extract_main_content,
        )
        df = spark.createDataFrame(
            [(1, PAGE.encode()), (2, b"<nav><a href='/'>Home</a></nav>"),
             (3, None)],
            "doc_id long, content binary")
        rows = {r["doc_id"]: r for r in
                extract_main_content(df).collect()}
        assert ARTICLE_P1 in rows[1]["main_text"]
        assert 0.0 < rows[1]["main_text_ratio"] < 1.0
        assert rows[2]["main_text"] == ""
        assert rows[2]["main_text_ratio"] == 0.0
        assert rows[3]["main_text"] == ""


class TestReviewFixes:
    def test_omitted_head_close_still_extracts(self):
        # HTML5 allows omitting </head>; the body must not be skipped
        page = ("<html><head><title>t</title><meta charset='utf-8'>"
                f"<body><p>{ARTICLE_P1}</p></body></html>")
        out = html_main_content(page)
        assert ARTICLE_P1 in out
        assert "t" != out.strip()  # head content stays out

    def test_head_content_excluded_without_close(self):
        page = ("<head><title>SHOULD NOT APPEAR</title>"
                f"<p>{ARTICLE_P1}</p>")
        out = html_main_content(page)
        assert "SHOULD NOT APPEAR" not in out
        assert ARTICLE_P1 in out

    def test_unclosed_object_does_not_swallow_body(self):
        # <body> resets skip state when a non-CDATA skip tag (object/
        # iframe/noscript) never closes. Unclosed <script>/<style> are
        # CDATA-mode in HTMLParser AND real browsers — they legitimately
        # swallow to EOF, so they are not recoverable here either.
        page = ("<html><head><object data='x'></head>"
                f"<body><p>{ARTICLE_P1}</p></body>")
        assert ARTICLE_P1 in html_main_content(page)


class TestHtmlTables:
    def test_basic_and_multiple(self):
        from nifi_extracttext_processor_spark.formats.html import (
            extract_html_tables,
        )
        h = ("<table><tr><th>Name</th><th>Age</th></tr>"
             "<tr><td>Ada</td><td>36</td></tr></table>"
             "<p>between</p><table><tr><td>solo</td></tr></table>")
        assert extract_html_tables(h) == [
            [["Name", "Age"], ["Ada", "36"]], [["solo"]]]

    def test_nested_table_flattened(self):
        from nifi_extracttext_processor_spark.formats.html import (
            extract_html_tables,
        )
        h = ("<table><tr><td>a<table><tr><td>inner</td></tr></table>"
             "</td><td>b</td></tr></table>")
        assert extract_html_tables(h) == [[["a", "b"]], [["inner"]]]

    def test_omitted_tr_and_entities(self):
        from nifi_extracttext_processor_spark.formats.html import (
            extract_html_tables,
        )
        h = "<table><td>R&amp;D</td><td>x  y</td></table>"
        assert extract_html_tables(h) == [[["R&D", "x y"]]]

    def test_script_inside_cell_skipped(self):
        from nifi_extracttext_processor_spark.formats.html import (
            extract_html_tables,
        )
        h = ("<table><tr><td>ok<script>var t='<td>no</td>'</script>"
             "</td></tr></table>")
        assert extract_html_tables(h) == [[["ok"]]]

    def test_total_on_garbage(self):
        from nifi_extracttext_processor_spark.formats.html import (
            extract_html_tables,
        )
        for junk in (b"", b"\x00\xff", "<table><tr><td>unclosed",
                     "</td></tr></table>" * 10, "<table>" * 100):
            extract_html_tables(junk)  # never raises

    def test_spark_operator(self, spark):
        from nifi_extracttext_processor_spark.operators.extract import (
            extract_tables,
        )
        h1 = ("<table><tr><td>a</td><td>b</td></tr>"
              "<tr><td>c</td><td>d</td></tr></table>").encode()
        df = spark.createDataFrame(
            [(1, h1), (2, b"<p>no tables</p>"), (3, None)],
            "doc_id long, content binary")
        rows = extract_tables(df).collect()
        assert len(rows) == 2
        assert [r["cells"] for r in rows] == [["a", "b"], ["c", "d"]]
        assert {r["doc_id"] for r in rows} == {1}


class TestTableReviewFixes:
    def test_omitted_td_close_keeps_cell(self):
        from nifi_extracttext_processor_spark.formats.html import (
            extract_html_tables,
        )
        assert extract_html_tables(
            "<table><tr><td>a<td>b</td></tr></table>") == [[["a", "b"]]]

    def test_omitted_tr_close_keeps_cell(self):
        from nifi_extracttext_processor_spark.formats.html import (
            extract_html_tables,
        )
        assert extract_html_tables(
            "<table><tr><td>a<tr><td>c</td></tr></table>") == \
            [[["a"], ["c"]]]

    def test_text_after_nested_table_kept(self):
        from nifi_extracttext_processor_spark.formats.html import (
            extract_html_tables,
        )
        h = ("<table><tr><td>a<table><tr><td>i</td></tr></table>z"
             "</td><td>b</td></tr></table>")
        assert extract_html_tables(h) == [[["a z", "b"]], [["i"]]]

    def test_string_content_operator(self, spark):
        from nifi_extracttext_processor_spark.operators.extract import (
            extract_tables,
        )
        df = spark.createDataFrame(
            [(1, "<table><tr><td>s</td></tr></table>")],
            "doc_id long, content string")
        rows = extract_tables(df).collect()
        assert [r["cells"] for r in rows] == [["s"]]
        assert "content" not in rows[0].asDict()  # no page-bytes fanout
