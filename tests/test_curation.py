"""Corpus-curation verbs: cap_per_key (domain caps) and c4_line_rules."""

import pytest
from pyspark.sql import functions as F

from ics_search_engine_spark.operators.datapipe import cap_per_key
from ics_search_engine_spark.operators.textstats import c4_line_rules


@pytest.fixture(scope="module")
def domains(spark):
    rows = [
        (i, f"host{i % 3}", float(100 - i)) for i in range(30)
    ] + [(100 + j, "megahost", float(j)) for j in range(40)]
    return spark.createDataFrame(
        rows, "doc_id long, source string, quality double"
    )


class TestCapPerKey:
    def test_cap_and_keep_order(self, spark, domains):
        out = cap_per_key(
            domains, ["source"], 4,
            [F.desc("quality"), F.asc("doc_id")],
        )
        by_src = {}
        for r in out.collect():
            by_src.setdefault(r.source, []).append((r.quality, r.doc_id))
        assert all(len(v) <= 4 for v in by_src.values())
        # megahost keeps its 4 HIGHEST-quality rows
        assert sorted(by_src["megahost"]) == [
            (36.0, 136), (37.0, 137), (38.0, 138), (39.0, 139)
        ]

    def test_under_cap_keys_untouched(self, spark, domains):
        out = cap_per_key(domains, ["source"], 1000, None)
        assert out.count() == domains.count()

    def test_cap_validation(self, spark, domains):
        with pytest.raises(ValueError):
            cap_per_key(domains, ["source"], 0)

    def test_salted_precap_superset_property(self, spark, domains):
        """The docstring's skew mitigation: a salted local cap before
        the exact pass must not change the final answer."""
        order = [F.desc("quality"), F.asc("doc_id")]
        exact = cap_per_key(domains, ["source"], 4, order)
        pre = cap_per_key(
            domains.withColumn("_salt", F.pmod(F.hash("doc_id"), F.lit(8))),
            ["source", "_salt"], 4, order,
        ).drop("_salt")
        two_phase = cap_per_key(pre, ["source"], 4, order)
        key = lambda r: (r.source, r.doc_id)  # noqa: E731
        assert sorted(map(key, exact.collect())) == sorted(
            map(key, two_phase.collect())
        )


class TestC4LineRules:
    def run(self, spark, texts, **kw):
        df = spark.createDataFrame(
            list(enumerate(texts)), "doc_id long, text string"
        )
        return {r.doc_id: r for r in c4_line_rules(df, **kw).collect()}

    def test_line_rules(self, spark):
        out = self.run(
            spark,
            [
                "A good long sentence with many words here.\n"
                "short line.\n"                      # < 5 words
                "No terminal punctuation on this line\n"
                "Please enable JavaScript now everyone!\n"  # javascript
                "Another perfectly good long sentence stands here!"
            ],
            min_words=5,
            min_lines=1,
        )
        r = out[0]
        assert r.n_lines == 5
        assert r.n_lines_kept == 2
        assert r.kept
        assert r.text_clean.splitlines() == [
            "A good long sentence with many words here.",
            "Another perfectly good long sentence stands here!",
        ]

    def test_document_drops(self, spark):
        good = "A good long sentence with many words here."
        out = self.run(
            spark,
            [
                good + "\nsome Lorem Ipsum filler text follows now.",
                good + "\nif (x) { return; }",
                good,
            ],
            min_lines=1,
        )
        assert not out[0].kept          # lorem ipsum (case-insensitive)
        assert not out[1].kept          # brace
        assert out[2].kept

    def test_min_lines_threshold(self, spark):
        good = "A good long sentence with many words here."
        out = self.run(spark, [good, good + "\n" + good + "\n" + good],
                       min_lines=3)
        assert not out[0].kept and out[0].n_lines_kept == 1
        assert out[1].kept and out[1].n_lines_kept == 3

    def test_empty_and_blank_text(self, spark):
        out = self.run(spark, ["", "\n\n"], min_lines=1)
        for r in out.values():
            assert r.n_lines == 0 and r.n_lines_kept == 0 and not r.kept
            assert r.text_clean == ""


class TestChunkDocuments:
    def test_windows_and_overlap(self, spark):
        from ics_search_engine_spark.operators.datapipe import (
            chunk_documents,
        )

        text = " ".join(f"tok{i:02d}" for i in range(25))
        df = spark.createDataFrame([(1, text)], "doc_id long, text string")
        rows = chunk_documents(df, size=10, overlap=4).collect()
        assert [(r.chunk_idx, r.tok_start, r.n_chunk_tokens)
                for r in rows] == [(0, 0, 10), (1, 6, 10), (2, 12, 10),
                                   (3, 18, 7), (4, 24, 1)]
        # consecutive chunks share exactly `overlap` tokens
        a, b = rows[0].chunk_text.split(), rows[1].chunk_text.split()
        assert a[-4:] == b[:4]

    def test_short_and_empty_docs(self, spark):
        from ics_search_engine_spark.operators.datapipe import (
            chunk_documents,
        )

        df = spark.createDataFrame(
            [(1, "alpha beta"), (2, ""), (3, None)],
            "doc_id long, text string",
        )
        rows = chunk_documents(df, size=10, overlap=0).collect()
        assert len(rows) == 1 and rows[0].doc_id == 1
        assert rows[0].n_chunk_tokens == 2

    def test_validation(self, spark):
        import pytest as _pytest

        from ics_search_engine_spark.operators.datapipe import (
            chunk_documents,
        )

        df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
        with _pytest.raises(ValueError):
            chunk_documents(df, size=0)
        with _pytest.raises(ValueError):
            chunk_documents(df, size=5, overlap=5)


class TestFimTransform:
    def test_psm_reconstructs_document(self, spark):
        from ics_search_engine_spark.operators.datapipe import (
            fim_transform,
        )

        texts = [
            (i, " ".join(f"tok{i}x{j:02d}" for j in range(12)))
            for i in range(20)
        ]
        df = spark.createDataFrame(texts, "doc_id long, text string")
        for r in fim_transform(df).collect():
            assert r.fim_applied
            assert 1 <= r.c1 < r.c2 <= r.n_tokens
            parts = r.psm.split(" ")
            ip, isuf, imid = (parts.index("<PRE>"), parts.index("<SUF>"),
                              parts.index("<MID>"))
            assert (ip, isuf - 1 - ip) == (0, r.c1)  # prefix len == c1
            pre = parts[1:isuf]
            suf = parts[isuf + 1 : imid]
            mid = parts[imid + 1 :]
            assert pre + mid + suf == dict(texts)[r.doc_id].split(" ")

    def test_small_docs_pass_through(self, spark):
        from ics_search_engine_spark.operators.datapipe import (
            fim_transform,
        )

        df = spark.createDataFrame(
            [(1, "alpha beta gamma"), (2, "")],
            "doc_id long, text string",
        )
        rows = {r.doc_id: r for r in fim_transform(df).collect()}
        assert not rows[1].fim_applied and rows[1].psm == "alpha beta gamma"
        assert rows[1].c1 is None and rows[1].c2 is None
        assert rows[2].n_tokens == 0 and rows[2].psm == ""
