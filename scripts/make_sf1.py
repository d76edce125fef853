"""Build the .bench/sf1 oracle fixture: the dedup/ANN/session tables at
10× the sf0.1 scale, other tables symlinked from sf0.1.

Rationale (CLAUDE.md lesson, round-2 verdict item 7): two real parity
bugs (DECIMAL re-round ties, ROWS-frame order dependence) were
invisible below sf0.1 — the guarded dedup/ANN paths need one sweep at a
scale where their skew caps (``max_bucket_size``, ``max_doc_freq``) and
tie handling actually bite.

Construction is ADVERSARIAL, not just bigger: 10 copies of the sf0.1
corpus where copy 0 is verbatim and copies 1-9 append a one-token
mutation marker — so every base document gains 9 NEAR-duplicates (one
shingle apart: LSH candidate storm, 10× bucket occupancy) while exact
duplicate groups also multiply ×10. Embeddings get a ±k/1000 first-
coordinate perturbation per copy (cosine ≈ 0.999…: near-dup and ANN
top-k tie stress); events get shifted users/timestamps so session
windows multiply without colliding.

Deterministic (seed-free index arithmetic); re-run to rebuild.
Usage: python scripts/make_sf1.py [out_dir] (default .bench/sf1)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, ".")

import duckdb

SRC = "/root/testdata/sf0.1"
COPIES = 10
# id strides far above any planted-twin offset the queries add (+100000)
DOC_STRIDE = 10_000_000
VEC_STRIDE = 10_000_000
EVT_STRIDE = 100_000_000
USER_STRIDE = 1_000_000

SCALED = {
    "documents": f"""
        SELECT doc_id + {DOC_STRIDE} * k.k AS doc_id,
               CASE WHEN k.k = 0 THEN text ELSE text || ' mutcopy' || k.k END AS text,
               lang, source,
               CAST(length(CASE WHEN k.k = 0 THEN text
                                ELSE text || ' mutcopy' || k.k END) AS BIGINT) AS n_chars
        FROM read_parquet('{SRC}/documents.parquet'),
             (SELECT unnest(generate_series(0, {COPIES - 1})) AS k) k
    """,
    "embeddings": f"""
        SELECT vec_id + {VEC_STRIDE} * k.k AS vec_id,
               CASE WHEN k.k = 0 THEN embedding
                    ELSE list_prepend(CAST(embedding[1] + k.k / 1000.0 AS FLOAT),
                                      embedding[2:]) END AS embedding,
               label
        FROM read_parquet('{SRC}/embeddings.parquet'),
             (SELECT unnest(generate_series(0, {COPIES - 1})) AS k) k
    """,
    "events": f"""
        SELECT event_id + {EVT_STRIDE} * k.k AS event_id,
               ts + to_seconds(k.k * 17) AS ts,
               user_id + {USER_STRIDE} * k.k AS user_id,
               event_type, value, props
        FROM read_parquet('{SRC}/events.parquet'),
             (SELECT unnest(generate_series(0, {COPIES - 1})) AS k) k
    """,
}

PASSTHROUGH = "region nation customer supplier part orders lineitem".split()


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else ".bench/sf1"
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    for name, sql in SCALED.items():
        dst = os.path.join(out, f"{name}.parquet")
        con.execute(f"COPY ({sql}) TO '{dst}' (FORMAT PARQUET)")
        n = con.execute(f"SELECT count(*) FROM '{dst}'").fetchone()[0]
        print(f"{name}: {n} rows -> {dst}")
    for name in PASSTHROUGH:
        dst = os.path.join(out, f"{name}.parquet")
        if not os.path.exists(dst):
            os.symlink(os.path.join(SRC, f"{name}.parquet"), dst)
    print("done")


if __name__ == "__main__":
    main()
