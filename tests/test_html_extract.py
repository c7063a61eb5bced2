"""extract_text_html — real HTML boilerplate stripping as pure JVM exprs.

Hand-computed expected outputs exercise every rule and the two
load-bearing orderings: entities decode AFTER tag stripping (escaped
markup survives as text) and &amp; decodes LAST (single-pass entity
semantics: '&amp;lt;' -> '&lt;').
"""

import pyspark.sql.functions as F

from hllspark.text import extract_text_html


CASES = [
    # full page: head (title/style/meta) dropped, comment spanning a
    # newline dropped, script with '<' and a fake close tag inside a JS
    # string dropped, block tags -> newline, inline <b> zero-width,
    # entity decode with amp last, whitespace normalized
    (
        '<html><head><title>T</title><style media="x">p{color:red}'
        '</style><meta charset="utf-8"></head><body><!-- strip\n me -->'
        '<script type="text/javascript">if (1 < 2) { var s = "</p>"; }'
        '</script><h1 class="big">Doc 7</h1><p>Lead\talpha  <b>mid</b>'
        '&nbsp;tail.</p><ul><li>item &amp;one</li><li>A&#39;s '
        '&lt;raw&gt;</li></ul></body></html>',
        'Doc 7\nLead alpha mid tail.\nitem &one\nA\'s <raw>',
    ),
    # double-encoded entity stays single-decoded (amp LAST)
    ("<p>&amp;lt;</p>", "&lt;"),
    # CRLF + tab normalization, block separation
    ("<p>a</p>\r\n<p>b\tc</p>", "a\nb c"),
    # tag-free text passes through
    ("plain text no tags", "plain text no tags"),
    ("", ""),
    # case-insensitive script matching
    ("<ScRiPt>x=1</sCrIpT>after", "after"),
    # unterminated script: open tag stripped, content survives
    # (documented lenient behaviour)
    ("<script>never closed", "never closed"),
    # inline tags are zero-width; <br> is a block separator
    ("word<span>s</span> joined<br>next", "words joined\nnext"),
    # <header>/<td> are blocks; \b keeps 'head' from eating '<header'
    ("<header>top</header><table><tr><td>x</td><td>y</td></tr></table>",
     "top\nx\ny"),
    # noscript content dropped with the element
    ("<noscript>enable js</noscript><p>ok</p>", "ok"),
    # a lone '<!--' inside a JS string must NOT eat visible content
    # through a later '-->' (script/raw-text removal runs BEFORE comment
    # stripping)
    ('<script>var s = "<!--"; f();</script><p>Visible</p>'
     "<!-- footer -->rest", "Visible\nrest"),
    # </head> omitted (legal lenient HTML): <title> is dropped as a
    # raw-text element, so SEO boilerplate cannot leak as corpus text
    ('<html><head><meta charset="utf-8"><title>Spam SEO title</title>'
     "<body><p>Article.</p>", "Article."),
]


def test_extract_text_html_cases(spark):
    df = spark.createDataFrame(
        [(i, h) for i, (h, _) in enumerate(CASES)], "i int, h string"
    )
    got = {
        r["i"]: r["t"]
        for r in df.select(
            "i", extract_text_html(F.col("h")).alias("t")
        ).collect()
    }
    for i, (_, want) in enumerate(CASES):
        assert got[i] == want, (i, got[i], want)


def test_extract_text_html_null_and_binary(spark):
    df = spark.createDataFrame([(1, None), (2, b"<p>bin</p>")],
                               "i int, h binary")
    got = {r["i"]: r["t"] for r in
           df.select("i", extract_text_html(F.col("h")).alias("t")).collect()}
    assert got[1] is None
    assert got[2] == "bin"


def test_extract_text_html_stays_jvm_side(spark):
    """The whole chain must plan as project-only codegen: no Python
    workers (BatchEvalPython/ArrowEvalPython) and no exchange."""
    df = spark.range(100).select(
        F.concat(F.lit("<p>row "), F.col("id"), F.lit("</p>")).alias("h")
    )
    plan = df.select(
        extract_text_html(F.col("h")).alias("t")
    )._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan
    assert "Exchange" not in plan
