"""Unit tests for the shared text-processing core (SURVEY.md §5 item 2)."""

import hashlib

from ics_search_engine_spark.textproc.porter import stem_word
from ics_search_engine_spark.textproc.simhash import (
    fingerprint_to_bitstring,
    hamming,
    similarity,
    simhash_text,
    simhash_tokens,
)
from ics_search_engine_spark.textproc.tokenizer import STOP_WORDS, tokenize


class TestPorter:
    def test_paper_step_examples(self):
        # Golden pairs from Porter (1980), per step.
        golden = {
            # step 1a
            "caresses": "caress",
            "ponies": "poni",
            "caress": "caress",
            "cats": "cat",
            # step 1b
            "feed": "feed",
            "agreed": "agre",
            "plastered": "plaster",
            "bled": "bled",
            "motoring": "motor",
            "sing": "sing",
            "conflated": "conflat",
            "troubled": "troubl",
            "sized": "size",
            "hopping": "hop",
            "tanned": "tan",
            "falling": "fall",
            "hissing": "hiss",
            "fizzed": "fizz",
            "failing": "fail",
            "filing": "file",
            # step 1c
            "happy": "happi",
            "sky": "sky",
            # step 2
            "relational": "relat",
            "conditional": "condit",
            "rational": "ration",
            "valenci": "valenc",
            "hesitanci": "hesit",
            "digitizer": "digit",
            "conformabli": "conform",
            "radicalli": "radic",
            "differentli": "differ",
            "vileli": "vile",
            "analogousli": "analog",
            "vietnamization": "vietnam",
            "predication": "predic",
            "operator": "oper",
            "feudalism": "feudal",
            "decisiveness": "decis",
            "hopefulness": "hope",
            "callousness": "callous",
            "formaliti": "formal",
            "sensitiviti": "sensit",
            "sensibiliti": "sensibl",
            # step 3
            "triplicate": "triplic",
            "formative": "form",
            "formalize": "formal",
            "electriciti": "electr",
            "electrical": "electr",
            "hopeful": "hope",
            "goodness": "good",
            # step 4
            "revival": "reviv",
            "allowance": "allow",
            "inference": "infer",
            "airliner": "airlin",
            "gyroscopic": "gyroscop",
            "adjustable": "adjust",
            "defensible": "defens",
            "irritant": "irrit",
            "replacement": "replac",
            "adjustment": "adjust",
            "dependent": "depend",
            "adoption": "adopt",
            "homologou": "homolog",
            "communism": "commun",
            "activate": "activ",
            "angulariti": "angular",
            "homologous": "homolog",
            "effective": "effect",
            "bowdlerize": "bowdler",
            # step 5
            "probate": "probat",
            "rate": "rate",
            "cease": "ceas",
            "controll": "control",
            "roll": "roll",
        }
        for word, expect in golden.items():
            assert stem_word(word) == expect, (word, stem_word(word), expect)

    def test_common_words(self):
        assert stem_word("running") == "run"
        assert stem_word("university") == "univers"
        assert stem_word("computers") == "comput"
        assert stem_word("machine") == "machin"
        assert stem_word("learning") == "learn"
        assert stem_word("engineering") == "engin"
        assert stem_word("science") == "scienc"
        assert stem_word("research") == "research"

    def test_short_words_unchanged(self):
        for w in ("a", "is", "be", "42", "xy"):
            assert stem_word(w) == w


class TestTokenizer:
    def test_regex_and_lowercase(self):
        # [a-zA-Z0-9]+ on lowercased text (utils/tokenizer.py:24-25)
        assert tokenize("Hello, World! 42x", do_stem=False) == ["hello", "world", "42x"]

    def test_single_char_dropped_after_stem(self):
        # length-1 filter runs post-stem (utils/tokenizer.py:34)
        assert tokenize("a b c ab", do_stem=False) == ["ab"]

    def test_stopwords_only_for_query(self):
        # index mode keeps stop words (todo.md:4); query mode drops them
        # BEFORE stemming (utils/tokenizer.py:28-31)
        idx = tokenize("this is the machine", for_query=False)
        qry = tokenize("this is the machine", for_query=True)
        assert "thi" in idx  # 'this' stemmed
        assert "the" in idx
        assert qry == ["machin"]

    def test_empty_and_null(self):
        assert tokenize("") == []
        assert tokenize("!!! ...") == []

    def test_digits_kept(self):
        assert tokenize("cs121 in 2024", do_stem=False) == ["cs121", "in", "2024"]

    def test_stopword_set_size(self):
        # exact reference set (constants.py:2-19)
        assert len(STOP_WORDS) == 173
        assert "ought" in STOP_WORDS and "com" in STOP_WORDS


class TestSimHash:
    def _reference_simhash(self, text: str) -> str:
        """Literal transcription of /root/reference/utils/simhash.py:9-47
        for parity checking (test-only; shares only the public md5/bin
        semantics)."""
        tokens = tokenize(text)
        freq: dict[str, int] = {}
        for t in tokens:
            freq[t] = freq.get(t, 0) + 1
        V = [0] * 128
        for word, weight in freq.items():
            hv = int(hashlib.md5(word.encode("utf-8")).hexdigest(), 16)
            bits = bin(hv)[2:].zfill(128)[-128:]
            for i in range(128):
                if bits[i] == "1":
                    V[i] += weight
                else:
                    V[i] -= weight
        return "".join("1" if v > 0 else "0" for v in V)

    def test_bit_identical_to_reference_transcription(self):
        texts = [
            "Informatics Professors recently started working on a grant",
            "the quick brown fox jumps over the lazy dog",
            "machine learning and its impact on society",
            "x",
            "",
            "aaa aaa aaa bbb",
        ]
        for t in texts:
            hi, lo = simhash_text(t)
            assert fingerprint_to_bitstring(hi, lo) == self._reference_simhash(t), t

    def test_hamming_and_similarity(self):
        h1 = simhash_tokens(["machin", "learn", "societi"])
        h2 = simhash_tokens(["machin", "learn", "societi"])
        assert hamming(h1[0], h1[1], h2[0], h2[1]) == 0
        assert similarity(h1, h2) == 1.0
        h3 = simhash_tokens(["entirely", "unrelated", "words", "here"])
        assert 0.0 <= similarity(h1, h3) < 1.0

    def test_near_duplicate_high_similarity(self):
        a = "the quarterly report shows strong growth in all segments this year"
        b = "the quarterly report shows strong growth in all segments this month"
        assert similarity(simhash_text(a), simhash_text(b)) >= 0.85


class TestSqlSurface:
    def test_registered_functions_match_dataframe_api(self, spark):
        from ics_search_engine_spark.functions.sqlreg import (
            register_sql_functions,
        )
        from ics_search_engine_spark.functions.udfs import tokenize_index

        names = register_sql_functions(spark)
        assert "ics_tokenize" in names and "ics_simhash128" in names
        df = spark.createDataFrame(
            [("machine learning of the engines",),
             ("",), ("Des accents français!",)],
            "text string",
        )
        df.createOrReplaceTempView("sqlreg_probe")
        got = spark.sql(
            "SELECT ics_tokenize(text) AS toks, ics_token_count(text) AS n "
            "FROM sqlreg_probe"
        ).collect()
        want = df.select(tokenize_index("text").alias("toks")).collect()
        for g, w in zip(got, want):
            assert g["toks"] == w["toks"]
            assert g["n"] == len(w["toks"])

    def test_reregistration_is_idempotent(self, spark):
        from ics_search_engine_spark.functions.sqlreg import (
            register_sql_functions,
        )

        register_sql_functions(spark)
        register_sql_functions(spark)  # no error, replaces
        assert spark.sql(
            "SELECT size(ics_tokenize_query('the the machine')) AS n"
        ).collect()[0]["n"] == 1  # stop words dropped in query mode


class TestTokenCounts:
    """token_counts vs a Python-re transcription of the same two
    patterns — the LLM-pipeline budget numbers."""

    CASES = [
        "Hello, world! It's 42 degrees.",
        "",
        "   ",
        "\n\t\n",
        "don't stop--now 3.14xyz",
        "we'll we've we're we'd I'm o'clock",
        "über-café naïve",  # non-ascii letters land in the punct class
        "a" * 500 + " " + "9" * 100,
        "mixed42case UPPER lower 'quoted' (paren)",
    ]

    def test_matches_python_re(self, spark):
        import re

        from ics_search_engine_spark.operators.textstats import (
            BPE_ISH_PATTERN,
            token_counts,
        )

        df = spark.createDataFrame(
            [("c", i, t) for i, t in enumerate(self.CASES)],
            "conv_id string, turn_idx int, text string",
        )
        got = {
            r["turn_idx"]: (r["ws_tokens"], r["bpe_tokens"])
            for r in token_counts(df).collect()
        }
        pat = re.compile(BPE_ISH_PATTERN)
        for i, t in enumerate(self.CASES):
            assert got[i] == (
                len(re.findall(r"\S+", t)),
                len(pat.findall(t)),
            ), f"case {i}: {t[:40]!r}"
