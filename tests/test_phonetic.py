"""Phonetic encoders / stemmer / char normalization + their use as
blocking key encoders (reference methods/Blocking.scala:19-33 offers
Soundex/NYSIIS/Metaphone as the key encoding)."""

import pytest
from pyspark.sql import functions as F

from silk_spark.functions.phonetic import (
    metaphone_code,
    normalize_chars_str,
    nysiis_code,
    porter_stem,
)
from silk_spark.functions.transformers import transform


class TestKernels:
    def test_metaphone_published_values(self):
        # classic Metaphone codes (Philips 1990)
        assert metaphone_code("Church") == "XRX"
        assert metaphone_code("Judge") == "JJ"
        assert metaphone_code("Science") == "SNS"
        assert metaphone_code("School") == "SKL"
        assert metaphone_code("Xavier") == "SFR"
        assert metaphone_code("") == ""

    def test_metaphone_groups_phonetic_variants(self):
        for a, b in [("Smith", "Smyth"), ("Knight", "Night"), ("Phillip", "Filip")]:
            assert metaphone_code(a) == metaphone_code(b), (a, b)

    def test_nysiis_published_values(self):
        assert nysiis_code("Smith") == "SNAT"
        assert nysiis_code("Knight") == "NAGT"
        assert nysiis_code("MacDonald") == "MCDANALD"
        assert nysiis_code("Schmidt") == "SNAD"

    def test_porter_vectors(self):
        vec = {
            "caresses": "caress", "ponies": "poni", "cats": "cat",
            "agreed": "agre", "plastered": "plaster", "motoring": "motor",
            "hopping": "hop", "happy": "happi", "electricity": "electr",
            "relational": "relat", "generalization": "gener",
            "controllable": "control", "oscillation": "oscil",
        }
        for w, want in vec.items():
            assert porter_stem(w) == want, w

    def test_normalize_chars(self):
        assert normalize_chars_str("Müller") == "Muller"
        assert normalize_chars_str("Łódź") == "lodz"
        assert normalize_chars_str("straße") == "strasse"
        # ref fold map covers lowercase æ/ø only (NormalizeCharsTransformer.scala:33-46)
        assert normalize_chars_str("ærø") == "aero"  # æ->ae, ø->o


class TestColumns:
    def test_registry_dispatch(self, spark):
        df = spark.createDataFrame([("Müller running Smith",)], "s string")
        r = df.select(
            transform("metaphone", F.col("s")).alias("m"),
            transform("NYSIIS", F.lit("Knight")).alias("n"),
            transform("stem", F.lit("running")).alias("st"),
            transform("normalizeChars", F.lit("Müller")).alias("nc"),
        ).first()
        assert r["n"] == "NAGT" and r["st"] == "run" and r["nc"] == "Muller"

    def test_metaphone_blocked_link(self, spark):
        """Blocking on metaphone keys must surface phonetic-variant
        pairs without a cross join — the reference's Blocking method
        with a Metaphone key encoder."""
        from silk_spark.functions.phonetic import metaphone
        from silk_spark.operators.blocking import candidate_pairs, key_block

        left = spark.createDataFrame(
            [(1, "Smith"), (2, "Knight"), (3, "Jones")], "id int, name string"
        )
        right = spark.createDataFrame(
            [(10, "Smyth"), (20, "Night"), (30, "Brown")], "id int, name string"
        )
        pairs = candidate_pairs(
            left, right, key_block(metaphone(F.col("name")))
        )
        got = {(r["left_id"], r["right_id"]) for r in pairs.collect()}
        assert {(1, 10), (2, 20)} <= got
        assert (3, 30) not in got  # Jones/Brown don't share a block
