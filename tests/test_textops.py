"""Language-ID heuristic + winnowing fingerprint tests."""

import pytest
from pyspark.sql import functions as F

from osm2vdv462_spark.operators import textops


class TestLangId:
    def test_real_sentences(self, spark):
        rows = [
            (1, "the quick brown fox jumps over the lazy dog and runs into the forest"),
            (2, "der schnelle braune fuchs springt über den faulen hund und rennt in den wald"),
            (3, "le renard brun rapide saute par dessus le chien paresseux et les arbres"),
            (4, "el zorro marrón rápido salta sobre el perro perezoso de la casa"),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {r["doc_id"]: r["lang_pred"] for r in textops.lang_id_ngram(df).collect()}
        assert got[1] == "en"
        assert got[2] == "de"
        assert got[3] == "fr"
        assert got[4] == "es"

    def test_deterministic_on_corpus(self, spark, sf_dir):
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        a = textops.lang_id_ngram(docs).orderBy("doc_id").collect()
        b = textops.lang_id_ngram(docs).orderBy("doc_id").collect()
        assert [tuple(r) for r in a] == [tuple(r) for r in b]


class TestWinnowing:
    def test_shared_substring_guarantee(self, spark):
        shared = "this exact shared passage appears in both documents verbatim"
        rows = [
            (1, "prefix one " + shared + " suffix one"),
            (2, "completely different lead-in " + shared + " and tail"),
            (3, "nothing in common with the others at all whatsoever here"),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        pairs = textops.fingerprint_match_pairs(df, min_shared=3).collect()
        got = {(r["id_a"], r["id_b"]) for r in pairs}
        assert (1, 2) in got
        assert (1, 3) not in got and (2, 3) not in got

    def test_fingerprints_subset_of_kgram_hashes(self, spark):
        df = spark.createDataFrame(
            [(1, "abcdefghijklmnopqrstuvwxyz")], "doc_id long, text string"
        )
        fp = textops.winnow_fingerprints(df, k=8, window=4).collect()[0][
            "fingerprints"
        ]
        import hashlib

        s = "abcdefghijklmnopqrstuvwxyz"
        all_h = {
            int(hashlib.md5(s[i : i + 8].encode()).hexdigest()[:15], 16)
            for i in range(len(s) - 7)
        }
        assert set(fp) <= all_h and fp
