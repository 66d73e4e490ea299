#!/usr/bin/env python3
"""Generate reference-parity test vectors for the PyText kernel.

Lifts the pure normalization helpers out of the reference's main.py BY
SOURCE RANGE at runtime (no reference code is stored in this repo; only
the resulting input/expected-output vectors are written, to
src/test/resources/graft/parity_vectors.tsv).

Usage: python3 tools/gen_parity_vectors.py
"""
import ast
import random
import sys

MAIN = "/root/reference/main.py"
OUT = "src/test/resources/graft/parity_vectors.tsv"

# helper functions + module-level constants they close over
WANTED_FUNCS = {
    "clean_name", "strip_accents", "norm_keep_accents", "remove_punctuation", "_normalize_for_latin_check",
    "is_latin_name", "clean_fullname_no_accents_final", "is_forced_male",
}
WANTED_ASSIGNS = {"MALE_TITLES", "MALE_NAME_PATTERNS"}


def lift_reference():
    src = open(MAIN, encoding="utf-8").read()
    tree = ast.parse(src)
    pieces = []
    for node in tree.body:
        if isinstance(node, ast.FunctionDef) and node.name in WANTED_FUNCS:
            pieces.append(ast.get_source_segment(src, node))
        if isinstance(node, ast.Assign):
            for t in node.targets:
                if isinstance(t, ast.Name) and t.id in WANTED_ASSIGNS:
                    pieces.append(ast.get_source_segment(src, node))
    ns = {}
    exec("import re\nimport unicodedata\nimport regex\n" + "\n\n".join(pieces), ns)
    missing = (WANTED_FUNCS - {"_normalize_for_latin_check"}) - set(ns)
    if missing:
        sys.exit(f"could not lift: {missing}")
    return ns


ALPHABETS = [
    "abcdefghijklmnopqrstuvwxyz", "ABCDEFGHIJ",
    "àáâãäåçèéêëìíîïñòóôõöùúûüý", "ĀĂĄĆČĐĒĖĘŁŃŇŘŚŠŤŮŹŻŽ",
    "абвгдежзийклмн", "ІіЁё", "ﬁﬂǅǈǅ", "ʼ'‘’“”—–-‐",
    " \t   ", ".,'()-;:/#&0123456789", "中文字符", "αβγδ",
]


def rand_string(rng):
    n = rng.randint(0, 24)
    return "".join(
        rng.choice(ALPHABETS[rng.randrange(len(ALPHABETS))]) for _ in range(n))


def main():
    ns = lift_reference()
    rng = random.Random(20260812)
    hand = [
        "", " ", "o'brien o'BRIEN", "abd-al rahman", "ABC3def 4gh",
        "ǅungla ǆep", "ﬁancé ﬂow", "Crème  Brûlée", "І і Ё ё",
        "name–with—dashes", "“quoted” ‘name’", 'he said "hi"',
        "mullah omar", "miss jane", "x" * 200, "a b c",
        "tab\tnewline\nmix", "７８９ fullwidth", "½ fraction ⅓",
    ]
    cases = hand + [rand_string(rng) for _ in range(600)]
    rows = []
    for s in cases:
        enc = s.encode("unicode_escape").decode("ascii").replace("\t", "\\t")
        for fn in ("clean_name", "strip_accents", "norm_keep_accents",
                   "remove_punctuation", "clean_fullname_no_accents_final"):
            try:
                out = ns[fn](s)
            except Exception:
                continue
            oenc = out.encode("unicode_escape").decode("ascii").replace("\t", "\\t")
            rows.append(f"{fn}\t{enc}\t{oenc}")
        rows.append(f"is_latin_name\t{enc}\t{ns['is_latin_name'](s)}")
        rows.append(f"is_forced_male\t{enc}\t{ns['is_forced_male'](s)}")
    with open(OUT, "w", encoding="ascii") as f:
        f.write("\n".join(rows) + "\n")
    print(f"wrote {len(rows)} vectors to {OUT}")


if __name__ == "__main__":
    main()
