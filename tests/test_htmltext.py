"""HTML text extraction (stages/htmltext.py)."""

import pyarrow as pa

from gis_scripts_ray.stages.htmltext import HtmlTextStage, html_to_text


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
