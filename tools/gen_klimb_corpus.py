#!/usr/bin/env python3
"""Generate the k-limb gate corpus: documents.parquet with candidate/
reference pairs spanning 1..16 bitvector limbs (token lengths around
every limb boundary), so the DuckDB k-limb DP oracles (x154 ROUGE-L,
x156 WER) actually EXERCISE their >= 3-limb carry/shift paths — the
bundled testdata maxes out at ~110 tokens (2 limbs), so without this
corpus a regression in the Duck-dialect fold above 2 limbs would pass
every sweep (round-9 review finding).

Usage:
    python3 tools/gen_klimb_corpus.py /tmp/klimb
    sbt -batch "runMain graft.Verify /tmp/klimb /tmp/klimb_out \
        x154_rouge_l,x155_chrf,x156_wer,x161_chrf_pp"
    <filter /tmp/klimb_out/oracle_sql.json to those queries>
    python3 tools/check_oracle.py /tmp/klimb /tmp/klimb_out

Deterministic (seeded); doc_id pairing follows the engine convention
(candidate = odd id, reference = id - 1); lengths hit the limb
boundaries 61/62/63/123/124/125/186/187 plus 1..16-limb interiors.
"""
import random
import sys

import duckdb


def main(out_dir: str) -> None:
    rnd = random.Random(20260815)
    lens = [1, 5, 61, 62, 63, 123, 124, 125, 186, 187, 200, 311,
            500, 700, 900, 992]
    rows = []
    for i in range(24):
        m = lens[rnd.randrange(len(lens))]
        n = lens[rnd.randrange(len(lens))]
        v = 1 + rnd.randrange(40)
        ref = ' '.join(f"w{rnd.randrange(v)}" for _ in range(m))
        cand = ' '.join(f"w{rnd.randrange(v)}" for _ in range(n))
        src = f"p{i:02d}"
        rows.append((2 * i, src, ref))
        rows.append((2 * i + 1, src, cand))
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents(doc_id BIGINT, source VARCHAR,"
        " text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?,?,?)", rows)
    import os
    os.makedirs(out_dir, exist_ok=True)
    con.execute(
        f"COPY documents TO '{out_dir}/documents.parquet'"
        " (FORMAT PARQUET)")
    print(f"wrote {len(rows)} docs ({len(rows)//2} pairs) to"
          f" {out_dir}/documents.parquet")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/klimb")
