#!/usr/bin/env python3
"""Cross-language fuzz of the REM2 oracle's J1 line-scanner CTEs
(pname/pscan/pparsed/prem2/pnamed in Core.pipelineColsOracle) against the
engine's PdfParse.parseChunk.

Protocol:
  1. generate N random chunk texts from a grammar that covers the scanner's
     branch space (empty rest + blank-line continuation, index skip over a
     consumed line that itself looks like a label line, label truncation of
     the name, pipe-split programmes, non-Latin names, duplicate labels) —
     restricted to the pdf fixture guard's alphabet (printable ASCII minus
     '"', newline, plain Cyrillic);
  2. `sbt "Test/runMain graft.PdfParseFuzzDump <in> <out>"` runs the REAL
     engine kernel on every chunk;
  3. this script extracts the shipped scanner CTEs from a rendered
     oracle_sql.json, splices a VALUES-fed `plines` in front, runs DuckDB,
     and compares (name, rem2) per chunk.

Usage:
  python3 tools/fuzz_pdf_scan.py gen <n> <chunks.b64>
  python3 tools/fuzz_pdf_scan.py check <chunks.b64> <engine.tsv> <oracle_sql.json>
"""
import base64
import json
import random
import re
import sys

import duckdb

NAMES = ["Alice Rivera", "bob  stone", "Abdul Rahman O'Brien", "X (alias)",
         "Сергей Иванов", "Maria-Luisa de. la Cruz", "A", "  padded  name "]
LABEL_SUFFIX = ["", " Title: Mullah", " Function: Chief remark: none",
                " birth date: 1990", " programme: EU"]
VALUES = ["X-1", "ML 7", "AFG-001", " spaced  val ", "Number: nested",
          "Programme: inner", "a|b|c", "|", "only"]
PROGS = ["SYRIA", "EU|TALIBAN", "a | b |", "|", "  ", "x"]


def gen_chunk(rng):
    lines = [f"Entity {rng.randint(1, 99)}"]
    n_body = rng.randint(0, 10)
    for _ in range(n_body):
        r = rng.random()
        if r < 0.25:
            # Name/Alias line: empty rest sometimes, label suffix sometimes
            if rng.random() < 0.3:
                lines.append("Name/Alias:")
            else:
                lines.append("Name/Alias: " + rng.choice(NAMES)
                             + rng.choice(LABEL_SUFFIX))
        elif r < 0.5:
            if rng.random() < 0.35:
                lines.append("Number:")
            else:
                lines.append("Number: " + rng.choice(VALUES))
        elif r < 0.65:
            if rng.random() < 0.35:
                lines.append("Programme:")
            else:
                lines.append("Programme: " + rng.choice(PROGS))
        elif r < 0.8:
            lines.append("")  # blank (continuation lookahead fodder)
        else:
            lines.append(rng.choice(
                ["junk line", rng.choice(VALUES), rng.choice(NAMES),
                 "  indented junk", "number of things: 4"]))
    # random casing of label keywords exercises (?i)
    txt = "\n".join(lines)
    if rng.random() < 0.3:
        txt = txt.replace("Number:", rng.choice(["NUMBER:", "number :", "Number  :"]))
    if rng.random() < 0.3:
        txt = txt.replace("Programme:", rng.choice(["PROGRAMME:", "programme :"]))
    if rng.random() < 0.2:
        txt = txt.replace("Name/Alias:", rng.choice(["NAME/ALIAS:", "name/alias :"]))
    return txt


def cmd_gen(n, out_path):
    rng = random.Random(1313)
    with open(out_path, "w") as f:
        for _ in range(n):
            c = gen_chunk(rng)
            f.write(base64.b64encode(c.encode()).decode() + "\n")
    print(f"generated {n} chunks -> {out_path}")


def cmd_check(chunks_path, engine_tsv, oracle_json):
    chunks = [base64.b64decode(l.strip()).decode()
              for l in open(chunks_path) if l.strip()]
    engine = []
    for l in open(engine_tsv):
        a, b = l.rstrip("\n").split("\t")
        name = None if a == "-" else base64.b64decode(a).decode()
        engine.append((name, base64.b64decode(b).decode()))
    assert len(engine) == len(chunks), "engine dump row count mismatch"

    sql = json.load(open(oracle_json))["pipeline_sanctions_cols"]
    # markers tolerate the render-time AS MATERIALIZED injection
    start = re.search(r"plines AS (MATERIALIZED )?\(", sql).start()
    end = re.search(r"pidx AS (MATERIALIZED )?\(", sql).start()
    scanner = sql[start:end]
    # the oracle's plines reads pchunks(chunk_seq, ch); feed it from a table
    q = ("WITH RECURSIVE pchunks AS (SELECT chunk_seq, ch FROM fuzz_chunks),\n"
         + scanner
         + "pout AS (SELECT n.chunk_seq, nm.name, r.rem2\n"
           "  FROM pname n JOIN prem2 r USING (chunk_seq)\n"
           "  LEFT JOIN pnamed nm USING (chunk_seq))\n"
           "SELECT chunk_seq, name, rem2 FROM pout ORDER BY chunk_seq")
    con = duckdb.connect()
    con.execute("CREATE TABLE fuzz_chunks(chunk_seq BIGINT, ch VARCHAR)")
    con.executemany("INSERT INTO fuzz_chunks VALUES (?,?)",
                    list(enumerate(chunks)))
    got = con.execute(q).fetchall()
    assert len(got) == len(chunks), f"oracle rows {len(got)} != {len(chunks)}"
    fails = 0
    for (seq, oname, orem2), (ename, erem2), chunk in zip(got, engine, chunks):
        if oname != ename or orem2 != erem2:
            fails += 1
            print(f"MISMATCH chunk {seq}:")
            print("  chunk  =", repr(chunk))
            print("  engine =", repr((ename, erem2)))
            print("  oracle =", repr((oname, orem2)))
            if fails > 5:
                break
    print(f"{len(chunks)} chunks compared, fails = {fails}")
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    if sys.argv[1] == "gen":
        cmd_gen(int(sys.argv[2]), sys.argv[3])
    elif sys.argv[1] == "check":
        cmd_check(sys.argv[2], sys.argv[3], sys.argv[4])
    else:
        raise SystemExit("usage: gen <n> <out> | check <chunks> <tsv> <oracle_json>")
