"""CJK script-range language ID (VERDICT r3 item 2): accuracy pin on
mixed-script texts + exact Spark/DuckDB parity of the extended ladder."""

import duckdb
import pytest

from granulate_char_ocr_spark.operators import textstats

# (text, expected prediction)
CASES = [
    # whitespace-free Chinese: zero Latin markers, Han chars decide
    ("中文文档处理引擎测试", "zh"),
    ("大规模语言模型的训练数据需要去重和质量过滤。", "zh"),
    # Japanese mixes kanji and kana — kana presence resolves ja over zh
    ("漢字とひらがなのテキストです", "ja"),
    ("データ処理エンジンのテスト", "ja"),
    # Korean hangul syllables
    ("한국어 텍스트 문서", "ko"),
    # Latin-marker languages keep their previous behavior
    ("the quick brown fox jumps over the lazy dog", "en"),
    ("el perro corre por la calle y no se detiene", "es"),
    ("le chat est sur la table avec les livres", "fr"),
    ("der hund läuft durch die stadt und nicht zurück", "de"),
    # a lone quoted ideograph must NOT flip an English sentence
    ("the word 漢 is a han character used in the east", "en"),
    # an English sentence quoting a short kana word stays en too
    ("the japanese word かな means kana in english text", "en"),
    # majority-CJK with a couple of English tokens → script wins
    ("机器学习模型训练需要大量数据 the model", "zh"),
    ("nothing matches here xyzzy qwerty", "und"),
    # mono-script alphabets (r4): script evidence maps to the majority
    # language of the script — macro-language guesses for ru/ar
    ("привет мир как дела сегодня", "ru"),
    ("καλημέρα κόσμε τι κάνεις", "el"),
    ("مرحبا بالعالم كيف حالك اليوم", "ar"),
    ("שלום עולם מה שלומך היום", "he"),
    # a lone Cyrillic word inside English stays en
    ("the russian word мир means world in english", "en"),
    # a stray BOM (U+FEFF, script=Common) is NOT Arabic evidence
    ("﻿nothing matches here xyzzy qwerty", "und"),
]


@pytest.fixture(scope="module")
def pred_rows(spark):
    docs = spark.createDataFrame(
        [(str(i), t) for i, (t, _) in enumerate(CASES)],
        "doc_id string, text string",
    )
    rows = textstats.lang_id(docs).collect()
    return {r["doc_id"]: r["predicted_lang"] for r in rows}


def test_mixed_script_accuracy_pin(pred_rows):
    got = [pred_rows[str(i)] for i in range(len(CASES))]
    want = [lang for _, lang in CASES]
    assert got == want


def test_duckdb_oracle_parity(spark, pred_rows):
    """The extended oracle SQL (driver_queries.ORACLES['lang_id_docs'])
    must agree with the Spark plan on every crafted text — Java regex and
    RE2 count the script classes identically."""
    from granulate_char_ocr_spark import driver_queries

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents(doc_id VARCHAR, text VARCHAR)"
    )
    con.executemany(
        "INSERT INTO documents VALUES (?, ?)",
        [(str(i), t) for i, (t, _) in enumerate(CASES)],
    )
    oracle = {
        r[0]: r[1]
        for r in con.execute(
            driver_queries.ORACLES["lang_id_docs"]
        ).fetchall()
    }
    assert oracle == pred_rows
