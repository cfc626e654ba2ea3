#!/usr/bin/env python3
"""Independent BPE-induction reference for t20_bpe_vocab.

Re-implements the merge loop from scratch (no shared code with the
Scala engine) so the committed sf0.01 VALUES pin in t20's oracle is a
cross-implementation check, not a self-confirmation. Contract mirrored
from the engine's documented semantics:

  - words: regexp [a-z0-9]+ over lower(text), NULL text contributes none
  - shape dict: top BPE_SHAPE_WORDS words by (freq DESC, word ASC)
  - per round: count every adjacent symbol position weighted by word
    freq; winner = max count, ties broken lexicographically (a, b);
    fuse greedy left-to-right; stop at BPE_MERGES merges or when the
    best count < BPE_MIN_PAIR_FREQ

Usage: python3 tools/bpe_reference.py <sf_dir> [--scala|--sql|--apply]
  --sql    print the DuckDB VALUES rows for the t20 oracle pin
  --apply  tokenize the corpus per source with the induced merges and
           print the t21 VALUES rows (source, n_words, n_tokens,
           n_chars, fertility_micro, char_fertility_micro, beats_chars)
  (default) print TSV rank/left/right/merged/freq
"""
import re
import sys
from collections import Counter

import pandas as pd

BPE_SHAPE_WORDS = 50000
BPE_MERGES = 50
BPE_MIN_PAIR_FREQ = 2
WORD_RE = re.compile(r"[a-z0-9]+")


def induce(sf_dir):
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])
    freq = Counter()
    for t in docs["text"]:
        if t is None or (isinstance(t, float)):
            continue
        freq.update(WORD_RE.findall(t.lower()))
    shapes = sorted(freq.items(), key=lambda kv: (-kv[1], kv[0]))
    shapes = shapes[:BPE_SHAPE_WORDS]
    words = [(list(w), f) for w, f in shapes]
    merges = []
    for rank in range(1, BPE_MERGES + 1):
        counts = Counter()
        for syms, f in words:
            for i in range(len(syms) - 1):
                counts[(syms[i], syms[i + 1])] += f
        if not counts:
            break
        (a, b), c = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        if c < BPE_MIN_PAIR_FREQ:
            break
        merges.append((rank, a, b, a + b, c))
        merged_words = []
        for syms, f in words:
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            merged_words.append((out, f))
        words = merged_words
    return merges


def tokenize(word, ranks):
    syms = list(word)
    while len(syms) >= 2:
        best = None
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best is None or r < best[0]):
                best = (r, syms[i], syms[i + 1])
        if best is None:
            break
        _, a, b = best
        out, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def apply_rows(sf_dir, merges):
    ranks = {(a, b): r for r, a, b, _, _ in merges}
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["source", "text"])
    per_src = {}
    for src, t in zip(docs["source"], docs["text"]):
        if t is None or isinstance(t, float):
            continue
        freq = per_src.setdefault(src, Counter())
        freq.update(WORD_RE.findall(t.lower()))
    rows = []
    for src in sorted(per_src):
        nw = nt = nc = 0
        for w, f in per_src[src].items():
            nw += f
            nt += len(tokenize(w, ranks)) * f
            nc += len(w) * f
        fert = nt * 1000000 // nw
        cfert = nc * 1000000 // nw
        rows.append((src, nw, nt, nc, fert, cfert, int(nt < nc)))
    return rows


def main():
    sf_dir = sys.argv[1]
    merges = induce(sf_dir)
    if "--apply" in sys.argv:
        for src, nw, nt, nc, f, cf, b in apply_rows(sf_dir, merges):
            print(f"          ('{src}', {nw}, {nt}, {nc}, {f}, {cf}, {b}),")
        return
    if "--sql" in sys.argv:
        rows = ",\n          ".join(
            f"({r}, '{a}', '{b}', '{m}', {c})" for r, a, b, m, c in merges)
        print(rows)
    else:
        for r, a, b, m, c in merges:
            print(f"{r}\t{a}\t{b}\t{m}\t{c}")


if __name__ == "__main__":
    main()
