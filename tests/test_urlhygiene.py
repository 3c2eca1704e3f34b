"""URL/domain hygiene operators (operators/urlhygiene.py)."""

import pytest
from pyspark.sql import functions as F

from validr_spark.operators.urlhygiene import (
    cap_per_domain, domain_histogram, host_of, registrable_domain,
    url_filter)

DOMAIN_CASES = [
    ("https://www.example.com/a/b?q=1", "www.example.com", "example.com"),
    ("http://Example.COM", "example.com", "example.com"),
    ("https://example.com:8443/x", "example.com", "example.com"),
    ("ftp://user:pw@files.example.org/f", "files.example.org",
     "example.org"),
    ("https://bbc.co.uk/news", "bbc.co.uk", "bbc.co.uk"),
    ("https://sport.bbc.co.uk/", "sport.bbc.co.uk", "bbc.co.uk"),
    ("https://a.b.news.com.au", "a.b.news.com.au", "news.com.au"),
    ("http://10.1.2.3/admin", "10.1.2.3", "10.1.2.3"),
    ("https://localhost/x", "localhost", "localhost"),
    ("not a url", None, None),
    ("/relative/path", None, None),
    ("", None, None),
    (None, None, None),
]


def test_host_and_domain_case_table(spark):
    df = spark.createDataFrame(
        [(i, u) for i, (u, _, _) in enumerate(DOMAIN_CASES)],
        "i long, url string")
    got = df.select(
        "i", host_of(F.col("url")).alias("h"),
        registrable_domain(F.col("url")).alias("d")).collect()
    by = {r["i"]: (r["h"], r["d"]) for r in got}
    for i, (url, host, dom) in enumerate(DOMAIN_CASES):
        assert by[i] == (host, dom), url


def _corpus(spark):
    rows = []
    for i in range(30):
        dom = ["example.com", "spam-site.net", "bbc.co.uk"][i % 3]
        rows.append((i, f"https://{['www.', ''][i % 2]}{dom}/p/{i}",
                     float(i)))
    rows.append((90, "garbage-no-scheme", 5.0))
    rows.append((91, None, 6.0))
    return spark.createDataFrame(rows, "doc_id long, url string, q double")


def test_url_filter_list_and_dataframe_agree(spark):
    df = _corpus(spark)
    kept_list = url_filter(df, ["spam-site.net"]).collect()
    bl = spark.createDataFrame([("spam-site.net",)], "domain string")
    kept_df = url_filter(df, bl).collect()
    ids = {r["doc_id"] for r in kept_list}
    assert ids == {r["doc_id"] for r in kept_df}
    assert all(i % 3 != 1 for i in ids if i < 90)   # blocked dropped
    assert 90 not in ids and 91 not in ids          # unparsable dropped
    kept_keep = url_filter(df, ["spam-site.net"],
                           keep_unparsable=True).collect()
    assert {90, 91} <= {r["doc_id"] for r in kept_keep}


def test_url_filter_literal_list_is_map_side(spark):
    plan = (url_filter(_corpus(spark), ["spam-site.net"])
            ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" not in plan


def test_domain_histogram_shares_and_blocked(spark):
    rows = domain_histogram(_corpus(spark), blocklist=["bbc.co.uk"]) \
        .collect()
    by = {r["domain"]: r for r in rows}
    assert by["example.com"]["n_docs"] == 10
    assert by[None]["n_docs"] == 2                  # unparsable bucket
    assert by["bbc.co.uk"]["blocked"] is True
    assert by["example.com"]["blocked"] is False
    assert sum(r["n_docs"] for r in rows) == 32
    assert abs(sum(r["share"] for r in rows) - 1.0) < 1e-6


def test_cap_per_domain_keeps_best_by_quality(spark):
    df = _corpus(spark)
    out = cap_per_domain(df, cap=3, by="q").collect()
    per = {}
    for r in out:
        key = r["doc_id"] % 3 if r["doc_id"] < 90 else "junk"
        per.setdefault(key, []).append(r["doc_id"])
    assert all(len(v) <= 3 for v in per.values())
    # example.com docs are 0,3,...,27 with q=i → top-3 by q = 27,24,21
    assert sorted(per[0]) == [21, 24, 27]
    # NULL-domain group is capped too, not unbounded
    assert len(per.get("junk", [])) <= 3


def test_cap_per_domain_default_order_is_min_ids(spark):
    out = cap_per_domain(_corpus(spark), cap=2).collect()
    got = sorted(r["doc_id"] for r in out if r["doc_id"] % 3 == 0
                 and r["doc_id"] < 90)
    assert got == [0, 3]


def test_cap_per_domain_plan_has_partial_group_limit(spark):
    plan = (cap_per_domain(_corpus(spark), cap=2, by="q")
            ._jdf.queryExecution().executedPlan().toString())
    assert "WindowGroupLimit" in plan


def test_cap_rejects_nonpositive(spark):
    with pytest.raises(ValueError):
        cap_per_domain(_corpus(spark), cap=0)


def test_extra_suffixes_extend_the_heuristic(spark):
    df = spark.createDataFrame([(1, "https://shop.example.web.xx/p")],
                               "doc_id long, url string")
    d0 = df.select(registrable_domain(F.col("url")).alias("d")).first()["d"]
    assert d0 == "web.xx"
    d1 = df.select(registrable_domain(
        F.col("url"), extra_suffixes=("web.xx",)).alias("d")).first()["d"]
    assert d1 == "example.web.xx"
