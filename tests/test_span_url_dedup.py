"""scrub_repeated_spans (Lee et al. exact-substring scrub, shingle
form) + canonical_url / url_dedup edge cases. Corpus-parity is pinned
by the driver oracle rows; these pin the edge shapes clean fixtures
never hit."""

from __future__ import annotations

from pyspark.sql import functions as F

from raptor_spark.functions.dedup import scrub_repeated_spans
from raptor_spark.functions.text import canonical_url


def _rows(df):
    return {r["doc_id"]: r.asDict() for r in df.collect()}


class TestScrubRepeatedSpans:
    def test_cross_doc_span_removed_from_every_doc(self, spark):
        df = spark.createDataFrame(
            [
                (1, "alpha beta gamma delta epsilon zeta unique one"),
                (2, "other words alpha beta gamma delta epsilon zeta tail"),
                (3, "no overlap here at all whatsoever truly"),
            ],
            "doc_id long, text string",
        )
        out = _rows(scrub_repeated_spans(df, k=6))
        assert out[1]["clean_text"] == "unique one"
        assert out[2]["clean_text"] == "other words tail"
        assert out[1]["n_spans"] == 1 and out[1]["n_removed"] == 6
        assert out[3]["clean_text"] == "no overlap here at all whatsoever truly"
        assert out[3]["n_spans"] == 0 and out[3]["n_removed"] == 0

    def test_within_doc_stutter_counts(self, spark):
        # 14 repeated tokens -> overlapping identical 6-shingles; the
        # whole stutter run is covered, the lone tail token survives
        df = spark.createDataFrame(
            [(1, "x " * 14 + "y")], "doc_id long, text string"
        )
        out = _rows(scrub_repeated_spans(df, k=6))
        assert out[1]["clean_text"] == "y"
        assert out[1]["n_removed"] == 14
        assert out[1]["n_spans"] == 9  # starts 0..8

    def test_short_null_and_empty_docs_pass_through(self, spark):
        df = spark.createDataFrame(
            [(1, "short doc"), (2, None), (3, ""), (4, "   ")],
            "doc_id long, text string",
        )
        out = _rows(scrub_repeated_spans(df, k=6))
        assert out[1] == {
            "doc_id": 1, "n_spans": 0, "n_removed": 0,
            "clean_text": "short doc",
        }
        for i in (2, 3, 4):
            assert out[i]["clean_text"] == "" and out[i]["n_spans"] == 0

    def test_overlap_of_two_spans_merges_coverage(self, spark):
        # spans [0..5] and [3..8] both repeated: covered union = 0..8,
        # not double-counted
        common = "a1 a2 a3 a4 a5 a6 a7 a8 a9"
        df = spark.createDataFrame(
            [(1, common + " solo1"), (2, common + " solo2")],
            "doc_id long, text string",
        )
        out = _rows(scrub_repeated_spans(df, k=6))
        assert out[1]["clean_text"] == "solo1"
        assert out[1]["n_removed"] == 9
        assert out[1]["n_spans"] == 4  # starts 0..3

    def test_min_count_threshold(self, spark):
        df = spark.createDataFrame(
            [
                (1, "alpha beta gamma delta epsilon zeta one"),
                (2, "alpha beta gamma delta epsilon zeta two"),
            ],
            "doc_id long, text string",
        )
        out = _rows(scrub_repeated_spans(df, k=6, min_count=3))
        assert out[1]["n_spans"] == 0  # only 2 occurrences < 3


class TestCanonicalUrl:
    def _canon(self, spark, urls):
        df = spark.createDataFrame([(u,) for u in urls], "url string")
        return [r["c"] for r in df.select(canonical_url("url").alias("c")).collect()]

    def test_variant_collapse(self, spark):
        got = self._canon(spark, [
            "https://WWW.Site7.example/Page3/",
            "https://site7.example/Page3?utm_source=x&utm_medium=m",
            "https://site7.example/Page3#frag",
            "http://site7.example/Page3",
        ])
        assert set(got) == {"https://site7.example/Page3"}

    def test_non_tracking_params_survive_in_order(self, spark):
        got = self._canon(spark, [
            "https://h.example/p?a=1&utm_medium=m&b=2",
            "https://h.example/p?utm_source=x&utm_campaign=c&b=2",
        ])
        assert got == [
            "https://h.example/p?a=1&b=2",
            "https://h.example/p?b=2",
        ]

    def test_path_case_significant_host_case_not(self, spark):
        a, b = self._canon(spark, [
            "https://HOST.example/CaseSensitive",
            "https://host.example/casesensitive",
        ])
        assert a == "https://host.example/CaseSensitive"
        assert a != b

    def test_null_and_root_slash(self, spark):
        got = self._canon(spark, ["https://h.example/", None])
        assert got[0] == "https://h.example"
        assert got[1] is None

    def test_unparseable_urls_canonicalize_to_null(self, spark):
        # scheme-less / malformed URLs must NOT all fold to '' (which
        # would merge every malformed-URL doc into ONE dedup group) —
        # they canonicalize to NULL and stay out of URL-level dedup
        got = self._canon(spark, [
            "not a url", "example.com/path", "//host-less/p", "",
            "https://ok.example/p",
        ])
        assert got[:4] == [None, None, None, None]
        assert got[4] == "https://ok.example/p"

    def test_utm_prefix_does_not_eat_other_params(self, spark):
        # 'utmost=1' is NOT a tracking param (utm_ prefix only)
        (got,) = self._canon(spark, ["https://h.example/p?utmost=1&gclid=z"])
        assert got == "https://h.example/p?utmost=1"


    def test_malformed_urls_excluded_from_dedup(self, spark):
        """NULL canon keys must NOT merge into one keeper group: the
        dedup consumer contract is canonical_url(...) + IS NOT NULL."""
        df = spark.createDataFrame(
            [(1, "no-scheme.example/a"), (2, "also malformed"),
             (3, "https://ok.example/x"), (4, "http://www.OK.example/x/")],
            "doc_id long, url string",
        )
        out = (
            df.select("doc_id", canonical_url("url").alias("canon_url"))
            .where(F.col("canon_url").isNotNull())
            .groupBy("canon_url")
            .agg(F.min("doc_id").alias("keeper"), F.count("*").alias("n"))
            .collect()
        )
        assert len(out) == 1  # the two malformed rows form NO group
        assert out[0]["keeper"] == 3 and out[0]["n"] == 2
