#!/usr/bin/env python3
"""Dev-only: build the adversarial text fixture at /tmp/adversarial.

NOTE: the committed regression gate for this corpus is
src/test/scala/graft/AdversarialParitySpec.scala, which rebuilds the
same 30 docs in-JVM and pins the DuckDB-parity rows — keep the two
literals in sync if docs are added here.

The synthetic corpus is clean ASCII with no null/empty docs, so the
text/dedup/streaming families' DuckDB parity has never been exercised
against the inputs a real ingest throws at a tokenizer: null text,
empty strings, whitespace-only docs, unicode words, emoji, 1-word
docs, huge single tokens, digit runs. This script writes a documents
table of exactly those shapes (plus the other tables copied from
sf0.001 so every query's inputs resolve), for:

    python3 tools/make_adversarial.py
    sbt "runMain graft.Verify /tmp/adversarial /tmp/v_adv <text+dedup queries>"
    python3 tools/check_oracle.py /tmp/adversarial /tmp/v_adv

Parity expectation: the `[a-z0-9]+` tokenizer (Spark
regexp_extract_all == DuckDB regexp_extract_all) sees IDENTICAL token
streams by construction — unicode letters, emoji, and punctuation are
all non-matches in both engines; null/empty text produce empty token
arrays. Divergences are real bugs.
"""
import shutil, os
import pandas as pd

SRC = "/root/testdata/sf0.001"
DST = "/tmp/adversarial"

docs = [
    # (doc_id, text, lang, source)
    (1, None, "en", "webA"),                         # null text
    (2, "", "en", "webA"),                           # empty string
    (3, "   \t\n  ", "en", "webA"),                  # whitespace only
    (4, "word", "en", "webA"),                       # 1-word doc
    (5, "word", "en", "webB"),                       # exact dup, other source
    (6, "héllo wörld naïve café", "fr", "webA"),     # latin diacritics
    (7, "日本語のテキストです 完全に", "ja", "webA"),  # CJK (no ascii tokens)
    (8, "🎉🎊 emoji only 🚀", "en", "webB"),          # emoji + 2 words
    (9, "MiXeD CaSe TEXT with UPPER lower", "en", "webA"),
    (10, "a b c d e f g h i j k l m n o p q r s t", "en", "webA"),  # 1-char words
    (11, "x" * 5000, "en", "webB"),                  # one huge token
    (12, ("repeat me " * 50).strip(), "en", "webA"), # pathological repetition
    (13, "1234 5678 90 42 1234", "en", "webB"),      # digit tokens
    (14, "the quick brown fox jumps over the lazy dog", "en", "webA"),
    (15, "the quick brown fox jumps over the lazy dog", "en", "webB"),  # dup of 14
    (16, "the quick brown fox leaps over the lazy dog", "en", "webA"),  # near-dup
    (17, "tab\tseparated\nnewline\rcarriage", "en", "webA"),
    (18, "punctuation!!! ??? ... ;;; ---", "en", "webB"),  # no alnum after strip? ! ? . ; - are all non-tokens; words: punctuation
    (19, "Ünïcödé wîth số 123 mixed", "vi", "webA"),
    (20, "\x00hidden\x01control\x02chars", "en", "webB"),  # control chars
    (21, "ZERO​WIDTH​SPACE joined", "en", "webA"),
    (22, "é combining accent vs é precomposed", "fr", "webB"),
    (23, "word " * 200, "en", "webA"),               # long doc, tiny vocab
    (24, "singleton", "en", "webB"),
    (25, "𝕞𝕒𝕥𝕙 𝖇𝖔𝖑𝖉 unicode letters", "en", "webA"),  # non-BMP letters
    (26, "mixed ascii and 中文 words here", "zh", "webB"),
    (27, "a" * 3 + " " + "b" * 7 + " normal words too", "en", "webA"),
    (28, "  leading and trailing  ", "en", "webB"),
    (29, "UPPER ONLY SHOUTING DOC", "en", "webA"),
    (30, "final doc with enough words to be ordinary text", "en", "webA"),
]

def main():
    os.makedirs(DST, exist_ok=True)
    for t in ["region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "embeddings"]:
        shutil.copy(f"{SRC}/{t}.parquet", f"{DST}/{t}.parquet")
    df = pd.DataFrame(docs, columns=["doc_id", "text", "lang", "source"])
    df["doc_id"] = df["doc_id"].astype("int64")
    df["n_chars"] = df["text"].map(lambda t: 0 if t is None else len(t)).astype("int64")
    df.to_parquet(f"{DST}/documents.parquet", index=False)
    print(f"wrote {len(df)} adversarial docs to {DST}")

if __name__ == "__main__":
    main()
