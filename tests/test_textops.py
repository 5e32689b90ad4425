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


class TestPIIRedact:
    def test_redaction_and_order(self, spark):
        rows = [
            (1, "reach me at jane.doe+x@sub.example.co.uk or +44-555-123-4567"),
            (2, "server 192.168.1.254 and 10.0.0.1 are down"),
            # the email's local/domain digits+dots must NOT leak into the
            # IP count (emails are scrubbed first — ordering contract)
            (3, "mail a1.2.3.4b@h1.2.3.4.example.com about host 8.8.8.8"),
            (4, "nothing sensitive here"),
        ]
        df = spark.createDataFrame(rows, "doc_id long, full_text string")
        got = {r["doc_id"]: r for r in textops.pii_redact(df).collect()}
        assert (got[1]["n_emails"], got[1]["n_phones"], got[1]["n_ips"]) == (1, 1, 0)
        assert (got[2]["n_emails"], got[2]["n_phones"], got[2]["n_ips"]) == (0, 0, 2)
        assert (got[3]["n_emails"], got[3]["n_ips"]) == (1, 1)
        assert (got[4]["n_emails"], got[4]["n_phones"], got[4]["n_ips"]) == (0, 0, 0)
        # fully-clean text hashes to the identity of its own bytes
        import hashlib

        assert got[4]["redacted_md5"] == hashlib.md5(
            b"nothing sensitive here"
        ).hexdigest()


class TestChunkDedup:
    def _mk(self, spark, rows):
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_first_occurrence_wins(self, spark):
        a = " ".join(f"w{i}" for i in range(10))
        b = " ".join(f"x{i}" for i in range(10))
        rows = [(1, a + " " + b), (2, b + " " + a), (3, a)]
        got = {
            r["doc_id"]: r
            for r in textops.chunk_dedup(self._mk(spark, rows), chunk=10).collect()
        }
        # doc 1 owns both chunks; docs 2 and 3 only repeat them
        assert (got[1]["n_chunks"], got[1]["n_dup_chunks"]) == (2, 0)
        assert (got[2]["n_chunks"], got[2]["n_dup_chunks"]) == (2, 2)
        assert (got[3]["n_chunks"], got[3]["n_dup_chunks"]) == (1, 1)
        import hashlib

        assert got[2]["cleaned_md5"] == hashlib.md5(b"").hexdigest()
        assert got[1]["cleaned_md5"] == hashlib.md5(
            (a + " " + b).encode()
        ).hexdigest()

    def test_parallelism_invariant(self, spark, sf_dir):
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        one = textops.chunk_dedup(docs.coalesce(1)).collect()
        many = textops.chunk_dedup(docs.repartition(13)).collect()
        assert sorted(map(tuple, one)) == sorted(map(tuple, many))


class TestAdler32Referee:
    def test_matches_zlib(self, spark, sf_dir):
        """Third derivation: the relational closed-form Adler-32 must
        equal zlib's C implementation byte for byte (the SQL oracle is
        the second — see queries/text_queries.py::adler32_audit)."""
        import hashlib
        import zlib

        import pandas as pd

        from osm2vdv462_spark.queries.text_queries import adler32_audit

        got = {
            r["doc_id"]: (r["n_bytes"], r["adler32"])
            for r in adler32_audit(spark, sf_dir).collect()
        }
        assert got, "sample gate must keep some docs"
        docs = pd.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])
        checked = 0
        for doc_id, text in zip(docs["doc_id"], docs["text"]):
            try:
                raw = text.encode("ascii")
            except UnicodeEncodeError:
                continue
            if len(raw) == 0:
                continue
            h = hashlib.md5(f"ad:{doc_id}".encode()).hexdigest()
            if int(h[:4], 16) % 5 != 0:
                continue
            assert got[int(doc_id)] == (len(raw), zlib.adler32(raw)), doc_id
            checked += 1
        assert checked == len(got)
