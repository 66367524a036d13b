"""Golden scalar tests for distance measures / transformers /
aggregators — mirrors the reference's annotation-driven example tests
(/root/reference/silk-rules/src/test/.../rule/test/DistanceMeasureTest.scala:19-90)."""

import pytest
from pyspark.sql import functions as F

from silk_spark.functions.aggregators import aggregate_scores
from silk_spark.functions.measures import (
    char_ngrams,
    distance,
    distance_to_confidence,
    similarity,
)
from silk_spark.functions.transformers import transform


def one(spark, expr):
    return spark.range(1).select(expr.alias("v")).first()["v"]


def pair(spark, a, b, schema="a string, b string"):
    return spark.createDataFrame([(a, b)], schema)


class TestCharacterMeasures:
    def test_levenshtein_golden(self, spark):
        # reference names benchmark rule: levenshteinDistance threshold 2
        cases = [("kitten", "sitting", 3.0), ("abc", "abc", 0.0), ("", "ab", 2.0)]
        for a, b, want in cases:
            got = pair(spark, a, b).select(
                distance("levenshteinDistance", F.col("a"), F.col("b")).alias("d")
            ).first()["d"]
            assert got == want, (a, b)

    def test_normalized_levenshtein(self, spark):
        got = pair(spark, "kitten", "sitting").select(
            distance("levenshtein", F.col("a"), F.col("b")).alias("d")
        ).first()["d"]
        assert got == pytest.approx(3 / 7)

    def test_jaro_winkler_golden(self, spark):
        # standard JW(MARTHA, MARHTA) = 0.9611
        got = pair(spark, "MARTHA", "MARHTA").select(
            distance("jaroWinkler", F.col("a"), F.col("b")).alias("d")
        ).first()["d"]
        assert got == pytest.approx(1 - 0.9611, abs=1e-4)

    def test_qgrams_identity(self, spark):
        got = pair(spark, "abc", "abc").select(
            distance("qGrams", F.col("a"), F.col("b")).alias("d")
        ).first()["d"]
        assert got == 0.0

    def test_char_ngrams_short_string(self, spark):
        got = one(spark, char_ngrams(F.lit("a"), 2))
        assert got == []


class TestTokenMeasures:
    def test_jaccard_dice_cosine(self, spark):
        df = spark.createDataFrame(
            [(["a", "b", "c"], ["b", "c", "d"])], "a array<string>, b array<string>"
        )
        r = df.select(
            distance("jaccard", F.col("a"), F.col("b")).alias("j"),
            distance("dice", F.col("a"), F.col("b")).alias("d"),
            distance("cosine", F.col("a"), F.col("b")).alias("c"),
        ).first()
        assert r["j"] == pytest.approx(1 - 2 / 4)
        assert r["d"] == pytest.approx(1 - 4 / 6)
        assert r["c"] == pytest.approx(1 - 2 / 3)

    def test_soft_jaccard_tolerates_edits(self, spark):
        df = spark.createDataFrame(
            [(["smith", "john"], ["smyth", "john"])], "a array<string>, b array<string>"
        )
        r = df.select(distance("softjaccard", F.col("a"), F.col("b")).alias("s")).first()
        assert r["s"] == 0.0  # smith~smyth within edit distance 1


class TestTokenwiseDistance:
    """Goldens mirror the reference's TokenwiseStringDistanceTest
    (silk-rules/.../distance/tokenbased/TokenwiseStringDistanceTest.scala)."""

    STOP = "and or in on the a from thy mr mrs who"

    def _d(self, spark, a, b, **kw):
        from silk_spark.functions.measures import tokenwise_distance

        params = dict(stopwords=self.STOP, nonstopword_weight=0.1, stopword_weight=0.001)
        params.update(kw)
        return pair(spark, a, b).select(
            tokenwise_distance(F.col("a"), F.col("b"), **params).alias("d")
        ).first()["d"]

    def test_reference_goldens(self, spark):
        cases = [
            ("several seditious scribes", "several seditious scribes", 0.0),
            ("several seditious scribes", "scribes seditious several", 0.0),
            ("several seditious scribes", "several seditious scribes from caesarea", 0.251),
            ("several seditious scibes", "several seditious scribes", 0.091),
            ("", "", 1.0),
            ("Anything", "", 1.0),
            ("Hotel Hilton in Manhattan", "hotel hilton manhattan", 0.001),
            ("the", "thy", 0.5),
            ("and", "any", 0.9804),
            ("Mr John Doe", "Mrs John Doe", 0.0),
            ("the the", "the who", 0.5),
            ("Hotel Hotel", "Hotel", 0.5),
        ]
        for a, b, want in cases:
            assert self._d(spark, a, b) == pytest.approx(want, abs=2e-3), (a, b)

    def test_adjust_by_token_length(self, spark):
        got = self._d(spark, "Hotel Hotel", "Hotel", adjust_by_token_length=True)
        assert got == pytest.approx(0.5, abs=1e-3)

    def test_ordering_impact(self, spark):
        same = self._d(spark, "alpha beta", "alpha beta", ordering_impact=0.5)
        rev = self._d(spark, "alpha beta", "beta alpha", ordering_impact=0.5)
        assert same == pytest.approx(0.0)
        assert rev == pytest.approx(0.5, abs=1e-6)  # reverse order -> 1 - (1 - 0.5)


class TestSubstringDistance:
    """Goldens mirror SubStringDistanceTest.scala (graded Stoilos/
    Stamou/Kollias measure, not the 0/1 decision form)."""

    def _d(self, spark, a, b, granularity=3):
        got = pair(spark, a, b).select(
            distance("substringDistance", F.col("a"), F.col("b"), granularity=granularity).alias("d")
        ).first()["d"]
        return got

    def test_relative_distances(self, spark):
        s1, s2, s3 = "ABCDEF", "ABCDEF123", "ABCDEF4567"
        assert self._d(spark, s1, s2) < self._d(spark, s1, s3)
        assert self._d(spark, s1, s3) < self._d(spark, s2, s3)

    def test_granularity(self, spark):
        assert self._d(spark, "AB12", "12AB") == 1.0
        assert self._d(spark, "AB12", "12AB", granularity=2) == 0.0

    def test_exact_short_match(self, spark):
        assert self._d(spark, "id", "id") == 0.0

    def test_decision_form_kept(self, spark):
        got = pair(spark, "foobar", "oba").select(
            distance("isSubstring", F.col("a"), F.col("b")).alias("d")
        ).first()["d"]
        assert got == 0.0


class TestEqualityNumericMeasures:
    def test_equality_family(self, spark):
        r = pair(spark, " Foo", "foo ").select(
            distance("equality", F.col("a"), F.col("b")).alias("eq"),
            distance("relaxedEquality", F.col("a"), F.col("b")).alias("req"),
        ).first()
        assert r["eq"] == 1.0 and r["req"] == 0.0

    def test_numeric_and_interval(self, spark):
        df = spark.createDataFrame([(10.0, 12.5)], "a double, b double")
        r = df.select(
            distance("num", F.col("a"), F.col("b")).alias("n"),
            distance("num", F.col("a"), F.col("b"), min_value=0, max_value=100).alias("nn"),
            distance("numericEquality", F.col("a"), F.col("b"), precision=3.0).alias("ne"),
        ).first()
        assert r["n"] == 2.5 and r["nn"] == pytest.approx(0.025) and r["ne"] == 0.0

    def test_wgs84_equator_degree(self, spark):
        df = spark.createDataFrame([(0.0, 0.0, 0.0, 1.0)], "lat1 double, lon1 double, lat2 double, lon2 double")
        from silk_spark.functions.measures import wgs84

        got = df.select(wgs84(F.col("lat1"), F.col("lon1"), F.col("lat2"), F.col("lon2")).alias("m")).first()["m"]
        assert got == pytest.approx(111195, rel=0.01)  # ~111 km per degree


class TestConfidenceMapping:
    def test_comparison_semantics(self, spark):
        # reference Comparison.scala:71-78 — 1 - d/t, floored at -1
        for d, t, want in [(0.0, 2.0, 1.0), (1.0, 2.0, 0.5), (2.0, 2.0, 0.0), (10.0, 2.0, -1.0)]:
            got = one(spark, distance_to_confidence(F.lit(d), t))
            assert got == pytest.approx(want)

    def test_similarity_dispatch(self, spark):
        got = pair(spark, "abc", "abd").select(
            similarity("levenshteinDistance", F.col("a"), F.col("b"), threshold=2.0).alias("c")
        ).first()["c"]
        assert got == pytest.approx(0.5)


class TestAggregators:
    def test_all_combinators(self, spark):
        df = spark.createDataFrame([(0.5, 0.9)], "x double, y double")
        r = df.select(
            aggregate_scores("min", F.col("x"), F.col("y")).alias("mn"),
            aggregate_scores("max", F.col("x"), F.col("y")).alias("mx"),
            aggregate_scores("average", F.col("x"), F.col("y"), weights=[1, 3]).alias("av"),
            aggregate_scores("geometricMean", F.col("x"), F.col("y")).alias("gm"),
            aggregate_scores("quadraticMean", F.col("x"), F.col("y")).alias("qm"),
            aggregate_scores("negate", F.col("x")).alias("ng"),
            aggregate_scores("scale", F.col("x"), factor=0.5).alias("sc"),
            aggregate_scores("handleMissingValues", F.lit(None).cast("double"), default=-1.0).alias("hm"),
        ).first()
        assert r["mn"] == 0.5 and r["mx"] == 0.9
        assert r["av"] == pytest.approx(0.8)
        assert r["gm"] == pytest.approx((0.5 * 0.9) ** 0.5)
        assert r["qm"] == pytest.approx(((0.25 + 0.81) / 2) ** 0.5)
        assert r["ng"] == -0.5 and r["sc"] == 0.25 and r["hm"] == -1.0


class TestValidationAndSequenceTransformers:
    """Mirrors the reference's TransformExample annotations for the
    validation / sequence / date / numeric transformer additions."""

    def test_validate_date_family(self, spark):
        df = spark.createDataFrame([("2015-04-04", "2015-04-03")], "a string, b string")
        r = df.select(
            transform("validateDateRange", F.col("a"), "1900-01-01", "2020-12-31").alias("in_range"),
            transform("validateDateRange", F.col("a"), "2016-01-01", "2020-12-31").alias("out_range"),
            transform("validateDateAfter", F.col("a"), F.col("b")).alias("after_ok"),
            transform("validateDateAfter", F.col("b"), F.col("a")).alias("after_bad"),
            transform("validateDateAfter", F.col("a"), F.col("a"), allow_equal=True).alias("eq_ok"),
        ).first()
        assert r["in_range"] == "2015-04-04" and r["out_range"] is None
        assert r["after_ok"] == "2015-04-04" and r["after_bad"] is None
        assert r["eq_ok"] == "2015-04-04"

    def test_validate_number_of_values(self, spark):
        df = spark.createDataFrame([(["v1"], ["v1", "v2"])], "a array<string>, b array<string>")
        r = df.select(
            transform("validateNumberOfValues", F.col("a"), min_n=0, max_n=1).alias("ok"),
            transform("validateNumberOfValues", F.col("b"), min_n=0, max_n=1).alias("bad"),
        ).first()
        assert r["ok"] == ["v1"] and r["bad"] is None

    def test_regex_select(self, spark):
        # reference scaladoc example: output 'output', regexes (a,b,c)
        # against value 'catch' -> ("output", "", "output")
        df = spark.createDataFrame([("output", "catch")], "o string, v string")
        r = df.select(
            transform("regexSelect", F.col("o"), ["a", "b", "c"], F.col("v")).alias("all"),
            transform("regexSelect", F.col("o"), ["a", "b", "c"], F.col("v"), one_only=True).alias("one"),
        ).first()
        assert r["all"] == ["output", "", "output"]
        assert r["one"] == ["output", "", ""]

    def test_to_sequence_index(self, spark):
        df = spark.createDataFrame([(["a", "b", "c"],)], "v array<string>")
        assert df.select(transform("toSequenceIndex", F.col("v")).alias("i")).first()["i"] == ["0", "1", "2"]

    def test_number_to_duration(self, spark):
        df = spark.createDataFrame([(1.0,)], "n double")
        r = df.select(
            transform("numberToDuration", F.col("n"), unit="day").alias("d"),
            transform("numberToDuration", F.col("n") * 90061.001, unit="seconds").alias("s"),
            transform("numberToDuration", F.col("n") * 3, unit="month").alias("m"),
            transform("numberToDuration", F.col("n") * 0, unit="day").alias("z"),
        ).first()
        assert r["d"] == "P1D"
        assert r["s"] == "P1DT1H1M1.001S"
        assert r["m"] == "P3M" and r["z"] == "PT0S"

    def test_extract_physical_quantity(self, spark):
        # reference PhysicalQuantityExtractorTest goldens (en locale)
        cases = [
            ("230V", "V", 0, 230.0),
            ("-100C", "C", 0, -100.0),
            ("50km", "m", 0, 50000.0),
            ("500mV", "V", 0, 0.5),
            ("Capacitor 10000pF 10V ### durable", "V", 0, 10.0),
            ("2.7V/5.5V", "V", 0, 2.7),
            ("2.7V/5.5V", "V", 1, 5.5),
            ("2.7V/5.5V", "V", 2, None),
        ]
        for text, sym, idx, want in cases:
            got = (
                spark.createDataFrame([(text,)], "t string")
                .select(transform("extractPhysicalQuantity", F.col("t"), sym, index=idx).alias("q"))
                .first()["q"]
            )
            if want is None:
                assert got is None, (text, sym, idx)
            else:
                assert got == pytest.approx(want), (text, sym, idx)


class TestTransformers:
    def test_string_family(self, spark):
        df = spark.createDataFrame([("  Hello World! (x) ",)], "s string")
        r = df.select(
            transform("lowerCase", F.col("s")).alias("lc"),
            transform("trim", F.col("s")).alias("tr"),
            transform("alphaReduce", F.col("s")).alias("ar"),
            transform("removeParentheses", F.col("s")).alias("rp"),
            transform("soundex", F.lit("Robert")).alias("sx"),
            transform("uuid", F.lit("x")).alias("u1"),
            transform("uuid", F.lit("x")).alias("u2"),
        ).first()
        assert r["lc"].strip() == "hello world! (x)"
        assert r["ar"] == "HelloWorldx"
        assert "(x)" not in r["rp"]
        assert r["sx"] == "R163"
        assert r["u1"] == r["u2"]  # deterministic ids (replay-stable)

    def test_array_family(self, spark):
        df = spark.createDataFrame([(["b", "", "a", "b"],)], "a array<string>")
        r = df.select(
            transform("removeEmptyValues", F.col("a")).alias("re"),
            transform("removeDuplicates", F.col("a")).alias("rd"),
            transform("concatMultiValues", F.col("a"), glue="-", sort=True).alias("cj"),
            transform("count", F.col("a")).alias("n"),
        ).first()
        assert r["re"] == ["b", "a", "b"]
        assert r["rd"] == ["b", "", "a"]
        assert r["cj"] == "-a-b-b"
        assert r["n"] == 4

    def test_numeric_and_date(self, spark):
        df = spark.createDataFrame([("3", "4", "2021-01-01", "2021-02-01")], "x string, y string, d1 string, d2 string")
        r = df.select(
            transform("numOperation", F.col("x"), F.col("y"), op="*").alias("mul"),
            transform("durationInDays", F.col("d1"), F.col("d2")).alias("dd"),
            transform("parseDate", F.col("d1")).alias("pd"),
        ).first()
        assert r["mul"] == 12.0 and r["dd"] == 31 and str(r["pd"]) == "2021-01-01"

    def test_aggregate_numbers_cell(self, spark):
        df = spark.createDataFrame([(["1", "2", "3"],)], "a array<string>")
        r = df.select(
            transform("aggregateNumbers", F.col("a"), op="sum").alias("s"),
            transform("aggregateNumbers", F.col("a"), op="average").alias("m"),
        ).first()
        assert r["s"] == 6.0 and r["m"] == 2.0

    def test_conditional_and_map(self, spark):
        df = spark.createDataFrame([("cat",)], "s string")
        r = df.select(
            transform("map", F.col("s"), mapping={"cat": "feline"}, default="?").alias("m"),
            transform("ifMatchesRegex", F.col("s"), "^c", F.lit("yes"), F.lit("no")).alias("rx"),
            transform("getValueByIndex", F.split(F.lit("a,b"), ","), 1).alias("ix"),
            transform("getValueByIndex", F.split(F.lit("a,b"), ","), 9).alias("oob"),
        ).first()
        assert r["m"] == "feline" and r["rx"] == "yes" and r["ix"] == "b" and r["oob"] is None
