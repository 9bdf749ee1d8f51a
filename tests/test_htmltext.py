"""HTML text extraction + hyperlink extraction (stages/htmltext.py)."""

import pyarrow as pa

from gis_scripts_ray.stages.htmltext import (
    HtmlLinkStage,
    HtmlTextStage,
    extract_links,
    html_to_text,
)


class TestHtmlToText:
    def test_block_vs_inline(self):
        assert (
            html_to_text("<p>one <b>two</b> three</p><p>four</p>")
            == "one two three\nfour"
        )
        # inline tags never split a word
        assert html_to_text("re<em>mark</em>able") == "remarkable"

    def test_suppressed_subtrees(self):
        h = (
            "<p>keep</p><script>var a = '<p>fake</p>';</script>"
            "<style>.x{color:red}</style><noscript>nope</noscript><p>also</p>"
        )
        assert html_to_text(h) == "keep\nalso"

    def test_entities_and_charrefs(self):
        assert html_to_text("<p>&amp; &lt;tag&gt; &#65;&#x42;</p>") == "& <tag> AB"

    def test_self_closing_and_malformed_recovery(self):
        assert html_to_text("a<br/>b") == "a\nb"
        # unclosed tags and stray closers: parser recovers, text survives
        assert html_to_text("<p>open<div>deep</p>end") == "open\ndeep\nend"
        assert html_to_text("plain no markup") == "plain no markup"

    def test_newline_collapsing_and_strip(self):
        h = "<div><div><p>  padded  </p></div></div>"
        assert html_to_text(h) == "padded"

    def test_title_extracted(self):
        assert html_to_text(
            "<html><head><title>The Title</title></head><body>x</body></html>"
        ) == "The Title\nx"


class TestExtractLinks:
    PAGE = "https://a.example.com/d1/p.html"

    def test_absolute_and_relative(self):
        h = (
            '<a href="https://b.example.com/x">x</a>'
            '<a href="../up.html">u</a><a href="/rooted">r</a>'
            '<a href="sib.html">s</a>'
        )
        assert extract_links(h, self.PAGE) == [
            "https://b.example.com/x",
            "https://a.example.com/up.html",
            "https://a.example.com/rooted",
            "https://a.example.com/d1/sib.html",
        ]

    def test_base_href_reroots(self):
        h = '<base href="https://cdn.example.org/b/"><a href="../r.html">r</a>'
        assert extract_links(h, self.PAGE) == ["https://cdn.example.org/r.html"]
        # only the FIRST base counts; a relative base resolves vs the page
        h2 = (
            '<base href="q/"><base href="https://z.example.com/">'
            '<a href="f.html">f</a>'
        )
        assert extract_links(h2, self.PAGE) == [
            "https://a.example.com/d1/q/f.html"
        ]

    def test_script_body_links_are_cdata(self):
        h = (
            "<script>document.write('<a href=\"https://evil.example.com/x\">');"
            '</script><a href="/ok">k</a>'
        )
        assert extract_links(h, self.PAGE) == ["https://a.example.com/ok"]

    def test_anchors_without_href_and_duplicates(self):
        h = '<a name="top">t</a><a href="/d">d</a><a href="/d">d</a>'
        assert extract_links(h, self.PAGE) == [
            "https://a.example.com/d",
            "https://a.example.com/d",
        ]

    def test_stage_explodes_and_carries(self):
        t = pa.table(
            {
                "doc": pa.array([7, 8], pa.int64()),
                "url": pa.array([self.PAGE, self.PAGE], pa.string()),
                "html": pa.array(
                    [b'<a href="/x">x</a><a href="/y">y</a>', b"no links"],
                    pa.binary(),
                ),
            }
        )
        out = HtmlLinkStage("html", "url")(t).to_pandas()
        assert out["doc"].tolist() == [7, 7]
        assert out["link_no"].tolist() == [0, 1]
        assert out["link_url"].tolist() == [
            "https://a.example.com/x",
            "https://a.example.com/y",
        ]


class TestHtmlTextStage:
    def test_stage_flags_bad_utf8(self):
        t = pa.table(
            {
                "doc": pa.array([1, 2, 3], pa.int64()),
                "html": pa.array(
                    [b"<p>fine</p>", b"<p>bad \xff byte</p>", None],
                    pa.binary(),
                ),
            }
        )
        df = HtmlTextStage("html")(t).to_pandas()
        assert df["html_text"].tolist()[0] == "fine"
        assert df["decoded_ok"].tolist() == [True, False, True]
        assert "bad � byte" == df["html_text"].tolist()[1]
        assert df["html_text"].tolist()[2] == ""
        assert df["n_chars"].tolist() == [4, 10, 0]
