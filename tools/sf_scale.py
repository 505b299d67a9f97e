"""Synthesize a larger scale factor from an existing TESTDATA dir by
replicating the fact tables with key offsets (dims copied as-is) — the
sf1 bench row's input (VERDICT round-1 item 8: surface quadratic/skew
surprises that sf0.1 hides).

Fact scaling only: customer/supplier/part keep their size, so joins keep
1:1 dimension matches while fact cardinality (and output) grows by the
factor. documents text and embeddings values are perturbed per replica so
near-dup structure stays realistic instead of exact-duplicate-degenerate
(replicas of a doc ARE near-dups — the workload a dedup pass exists for).

Generation is cached (atomic marker file); ~10 s for factor=10 off sf0.1.
"""

from __future__ import annotations

import os
import tempfile

DIMS = ["region", "nation", "customer", "supplier", "part"]


def ensure_scaled(
    src_dir: str, factor: int = 10, out_dir: str | None = None
) -> str:
    """Build (or reuse) a ``factor``x fact-scaled copy of ``src_dir``."""
    import duckdb

    tag = src_dir.rstrip("/").replace("/", "_").lstrip("_")
    # v2: n_chars invariant fix (r10) — new cache name so stale dirs
    # built by the v1 scaler are not silently reused
    out_dir = out_dir or os.path.join(
        tempfile.gettempdir(), "tectonic_scaled", f"{tag}_x{factor}_v2"
    )
    marker = os.path.join(out_dir, "_DONE")
    if os.path.exists(marker):
        return out_dir
    os.makedirs(out_dir, exist_ok=True)
    con = duckdb.connect()

    def src(name: str) -> str:
        return os.path.join(src_dir, f"{name}.parquet")

    def copy_to(name: str, select: str) -> None:
        con.execute(
            f"COPY ({select}) TO '{os.path.join(out_dir, name + '.parquet')}'"
            " (FORMAT PARQUET)"
        )

    for d in DIMS:
        copy_to(d, f"SELECT * FROM read_parquet('{src(d)}')")

    off_o = con.execute(
        f"SELECT MAX(o_orderkey) + 1 FROM read_parquet('{src('orders')}')"
    ).fetchone()[0]
    copy_to(
        "orders",
        f"SELECT o.* REPLACE (o_orderkey + i * {off_o} AS o_orderkey) "
        f"FROM read_parquet('{src('orders')}') o, range({factor}) r(i)",
    )
    copy_to(
        "lineitem",
        f"SELECT l.* REPLACE (l_orderkey + i * {off_o} AS l_orderkey) "
        f"FROM read_parquet('{src('lineitem')}') l, range({factor}) r(i)",
    )

    off_e = con.execute(
        f"SELECT MAX(event_id) + 1 FROM read_parquet('{src('events')}')"
    ).fetchone()[0]
    copy_to(
        "events",
        f"SELECT e.* REPLACE (event_id + i * {off_e} AS event_id) "
        f"FROM read_parquet('{src('events')}') e, range({factor}) r(i)",
    )

    off_d = con.execute(
        f"SELECT MAX(doc_id) + 1 FROM read_parquet('{src('documents')}')"
    ).fetchone()[0]
    copy_to(
        "documents",
        f"SELECT d.* REPLACE (doc_id + i * {off_d} AS doc_id, "
        "text || ' r' || CAST(i AS VARCHAR) AS text, "
        # keep the n_chars invariant (n_chars == length(text)) under the
        # replica suffix — the r10 crawl queries cross-pin EXTRACTED text
        # length against this column and caught it stale (off by the
        # suffix length on every replica)
        "n_chars + 2 + length(CAST(i AS VARCHAR)) AS n_chars) "
        f"FROM read_parquet('{src('documents')}') d, range({factor}) r(i)",
    )

    off_v = con.execute(
        f"SELECT MAX(vec_id) + 1 FROM read_parquet('{src('embeddings')}')"
    ).fetchone()[0]
    # per-replica, per-dimension additive perturbation (a scalar multiple
    # would leave cosine similarity exactly 1 between replicas)
    copy_to(
        "embeddings",
        f"SELECT v.* REPLACE (vec_id + i * {off_v} AS vec_id, "
        "CAST(list_transform(range(1, len(embedding) + 1), "
        "j -> embedding[j] + 0.003 * i * ((j % 7) - 3)) AS FLOAT[]) "
        "AS embedding) "
        f"FROM read_parquet('{src('embeddings')}') v, range({factor}) r(i)",
    )

    con.close()
    with open(marker, "w") as f:
        f.write("ok\n")
    return out_dir


if __name__ == "__main__":
    import sys

    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    factor = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    print(ensure_scaled(src, factor))
