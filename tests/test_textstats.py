"""Behavioral checks for the trigram-profile language ID — the driver oracle
proves Spark==DuckDB parity; these prove the classifier itself does the
right thing on real-language text (which the synthetic fixture cannot)."""

from orientdb_neo4j_importer_plugin_spark.operators.textstats import (
    LANG_TRIGRAMS,
    lang_id,
    lang_id_ngram,
)

REAL_SENTENCES = [
    (1, "The quick brown fox jumps over the lazy dog and runs into the woods.", "en"),
    (2, "La casa de la montana es grande y el perro que vive alli es pequeno.", "es"),
    (3, "Der Hund und die Katze spielen in einem schoenen Garten unter der Sonne.", "de"),
    (4, "Le chat et le chien de la maison jouent dans le jardin pendant la nuit.", "fr"),
    (5, "zzz qqq xxx", None),  # no profile trigram at all -> und
]


def _df(spark):
    return spark.createDataFrame(
        [(i, t) for i, t, _ in REAL_SENTENCES], ["doc_id", "text"]
    )


def test_ngram_lang_id_classifies_real_sentences(spark):
    got = {r.doc_id: r.lang_guess for r in lang_id_ngram(_df(spark)).collect()}
    assert got == {1: "en", 2: "es", 3: "de", 4: "fr", 5: "und"}


def test_ngram_beats_marker_words_without_whole_markers(spark):
    # No whole marker word of any language, but trigram evidence is clear:
    # "ing"/"ion"/" th" substrings inside longer English words.
    df = spark.createDataFrame(
        [(1, "thinking nations acting motioning thumping")], ["doc_id", "text"]
    )
    assert lang_id(df).collect()[0].lang_guess == "und"  # markers find nothing
    assert lang_id_ngram(df).collect()[0].lang_guess == "en"


def test_ngram_scores_are_case_and_punct_insensitive(spark):
    df = spark.createDataFrame(
        [
            (1, "The  Quick,, Brown --- FOX!! And THE dog."),
            (2, "the quick brown fox and the dog"),
        ],
        ["doc_id", "text"],
    )
    rows = {r.doc_id: r for r in lang_id_ngram(df).collect()}
    assert rows[1].lang_guess == rows[2].lang_guess == "en"
    assert rows[1].lang_score == rows[2].lang_score


def test_profiles_are_normalization_closed():
    # every profile trigram must survive the [^a-z]+ -> ' ' normalization,
    # or it could never match and silently weakens its language
    for grams in LANG_TRIGRAMS.values():
        for g in grams:
            assert len(g) == 3 and all(c == " " or "a" <= c <= "z" for c in g)
            assert "  " not in g  # runs collapse to ONE space


def test_redact_pii_masks_and_counts(spark):
    from orientdb_neo4j_importer_plugin_spark.operators.textstats import redact_pii

    df = spark.createDataFrame(
        [
            (1, "mail bob.smith+x@corp.example.com or call +1 415 555 0000"),
            (2, "server 192.168.0.1 logged 2026-08-16 at 10.2.3.4"),
            (3, "clean text"),
        ],
        ["doc_id", "text"],
    )
    rows = {r.doc_id: r for r in redact_pii(df).collect()}
    assert rows[1].text_redacted == "mail [EMAIL] or call [PHONE]"
    assert (rows[1].n_email, rows[1].n_phone, rows[1].n_pii) == (1, 1, 2)
    # emails mask before IPs: the hostname's dotted part is never half-masked
    assert rows[2].text_redacted == "server [IP] logged [PHONE] at [IP]"
    assert rows[2].n_ip == 2 and rows[2].n_phone == 1  # date scrubs as phone
    assert rows[3].n_pii == 0 and rows[3].text_redacted == "clean text"
