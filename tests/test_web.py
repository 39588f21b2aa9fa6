

def test_canonical_url_cases(spark):
    from pyspark.sql import functions as F

    from osm2world_spark.operators.web import canonical_url

    cases = {
        "HTTP://User@Example.COM:80/A/b/?b=2&a=1#frag":
            "http://example.com/A/b?a=1&b=2",
        "https://site.org:443/x": "https://site.org/x",
        "https://site.org:8443/x": "https://site.org:8443/x",
        "http://host.net": "http://host.net/",
        "http://host.net/": "http://host.net/",
        "http://host.net/p?": "http://host.net/p",
        "http://host.net/p?z=1": "http://host.net/p?z=1",
        "ftp://Mixed.Case/Path/": "ftp://mixed.case/Path",
    }
    df = spark.createDataFrame([(i, u) for i, u in enumerate(cases)],
                               "i int, url string")
    got = {
        r["i"]: r["c"]
        for r in df.select("i", canonical_url(F.col("url")).alias("c"))
        .collect()
    }
    assert got == {i: v for i, v in enumerate(cases.values())}


def test_url_dup_groups(spark):
    from osm2world_spark.operators.web import url_dup_groups

    docs = spark.createDataFrame(
        [
            ("d1", "http://A.com:80/x/?b=2&a=1"),
            ("d2", "HTTP://a.com/x?a=1&b=2"),
            ("d3", "http://a.com/x?a=1&b=3"),  # different query value
            ("d4", "https://b.org/y"),
        ],
        "doc_id string, url string",
    )
    rows = url_dup_groups(docs).collect()
    assert len(rows) == 1
    assert rows[0]["canon_url"] == "http://a.com/x?a=1&b=2"
    assert list(rows[0]["doc_ids"]) == ["d1", "d2"]
    assert rows[0]["survivor"] == "d1"


def test_canonical_url_question_mark_inside_fragment(spark):
    """A '?' that appears only inside the fragment is fragment content
    — both URLs canonicalize to the bare resource."""
    from pyspark.sql import functions as F

    from osm2world_spark.operators.web import canonical_url

    df = spark.createDataFrame(
        [("http://x.com/p#a?b=1",), ("http://x.com/p",),
         ("http://x.com/p?b=1#frag",)],
        "url string",
    )
    got = [r["c"] for r in
           df.select(canonical_url(F.col("url")).alias("c")).collect()]
    assert got == ["http://x.com/p", "http://x.com/p", "http://x.com/p?b=1"]
