"""HTML -> text extraction: tag stripping, entity decode order,
block-structure newlines, numeric references, links, plan shape, and
the WARC -> documents -> text composition."""

from pyspark.sql import functions as F

from osm2world_spark.operators.html import (
    decode_numeric_entities,
    extract_links,
    extract_text,
    extract_title,
    html_to_documents,
)


def _one(spark, html, col):
    return spark.createDataFrame([(html,)], "h string").select(
        col(F.col("h")).alias("v")
    ).first()["v"]


def test_extract_text_pipeline(spark):
    html = (
        "<html><head><title>T</title><style>p{color:red}</style></head>"
        "<body><p>one  two</p><script>var x='<p>no</p>';</script>"
        "<div>three</div><!-- gone --><br>four &amp; five</body></html>"
    )
    got = _one(spark, html, extract_text)
    # the dropped <style> leaves a space that the whitespace pass folds
    # into the following block newline; blank lines cap at one
    assert got == "T\none two\n\nthree\n\nfour & five"


def test_entity_decode_order(spark):
    # &amp;lt; must yield the LITERAL "&lt;" (amp decodes last)
    got = _one(spark, "<p>&amp;lt; &lt; &gt; &quot; &#39; &nbsp;</p>",
               extract_text)
    assert got == "&lt; < > \" '"


def test_numeric_entities(spark):
    df = spark.createDataFrame(
        [("A&#66;&#x43; &#1114112; &#x10FFFF;",)], "t string"
    ).select(decode_numeric_entities(F.col("t")).alias("v"))
    got = df.first()["v"]
    # decimal + hex decode; out-of-range passes through literally
    assert got == "ABC &#1114112; \U0010FFFF"


def test_title_and_links(spark):
    html = (
        "<html><head><title> A &amp;\n B </title></head>"
        "<body><a href='/x'>1</a><p><a href=\"/y\">2</a></p></body>"
    )
    assert _one(spark, html, extract_title) == "A & B"
    assert _one(spark, html, extract_links) == ["/x", "/y"]
    assert _one(spark, "<p>no title</p>", extract_title) == ""


def test_nested_drop_tags_and_cdata(spark):
    html = (
        "<svg><circle r='1'/><text>vector junk</text></svg>"
        "<p>keep</p><![CDATA[ raw <b> ]]><noscript>off</noscript>"
    )
    assert _one(spark, html, extract_text) == "keep"


def test_default_path_is_codegen(spark):
    df = spark.createDataFrame([("<p>x</p>",)], "h string").select(
        extract_text(F.col("h")).alias("t"),
        extract_title(F.col("h")).alias("ti"),
        extract_links(F.col("h")).alias("l"),
    )
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "extended"
    )
    assert "EvalPython" not in plan and "Exchange" not in plan


def test_warc_to_text_composition(spark):
    from osm2world_spark.sources.warc import read_warc, warc_documents

    recs = read_warc(spark, "/root/repo/tests/fixtures/fixture.warc")
    out = html_to_documents(warc_documents(recs))
    row = out.where(F.col("url").endswith("/page/5")).first()
    assert row["title"] == "Doc 5 & Co"
    assert row["text"] == "Doc 5 & Co\nalpha 5 beta\n\ngamma <tag> delta 35\nnext"
    assert row["links"] == ["/p/5"]


def test_custom_elements_not_swallowed(spark):
    # <template-x> / <svg-icon> must NOT match the template/svg drop
    # rules by prefix (review finding: tag-name boundary)
    html = ("<template-x>visible</template-x><p>keep</p>"
            "<template>gone</template><svg-icon>icon text</svg-icon>")
    got = _one(spark, html, extract_text)
    assert "visible" in got and "keep" in got and "icon text" in got
    assert "gone" not in got
    # block-tag prefixes: <param>/<track> are not <p>/<tr>
    got2 = _one(spark, "a<param x=1>b<track>c<p>d</p>", extract_text)
    assert got2 == "abc\nd"


def test_numeric_runs_before_named(spark):
    # a browser renders '&amp;#65;' as the LITERAL '&#65;' — the named
    # pass must not manufacture numeric refs for the numeric pass
    html = "<p>&amp;#65; and &#66;</p>"
    got = _one(spark, html, lambda c: extract_text(c, numeric_entities=True))
    assert got == "&#65; and B"


def test_links_keep_embedded_other_quote(spark):
    html = "<a href=\"/p?a='x'\">1</a><a href='/q?b=\"y\"'>2</a>"
    assert _one(spark, html, extract_links) == ["/p?a='x'", "/q?b=\"y\""]
