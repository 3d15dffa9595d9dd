"""Regenerate tests/fixtures/etag_expected.parquet — the expected-output
fixture backing the `multipart_etag` oracle.

DuckDB's md5() accepts VARCHAR only, so the raw-digest-chain multipart ETag
(md5 over concatenated 16-byte part digests — AzureEtagCheck/etag_app.py:38-52)
is not expressible in oracle SQL. The oracle instead hash-compares against
this fixture: expected etags computed here by plain hashlib (no Spark in the
loop), for every document in every testdata scale, keyed by
(doc_id, md5(text)) so the same oracle SQL is correct at whichever sf the
driver registers.

Run: python tests/gen_etag_fixture.py
"""

from __future__ import annotations

import pathlib
import sys

import duckdb

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from s3bigdatasync_spark.functions.etag import multipart_etag_bytes  # noqa: E402
from s3bigdatasync_spark.operators.verify_ops import PART_SIZE  # noqa: E402

OUT = pathlib.Path(__file__).parent / "fixtures" / "etag_expected.parquet"
SF_DIRS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"]


def main() -> None:
    con = duckdb.connect()
    rows: list[tuple[int, str, str]] = []
    for sf in SF_DIRS:
        for doc_id, text in con.execute(
            f"SELECT doc_id, text FROM read_parquet('{sf}/documents.parquet')"
        ).fetchall():
            payload = text.encode("utf-8")
            rows.append((doc_id, text, multipart_etag_bytes(payload, PART_SIZE)))
    OUT.parent.mkdir(exist_ok=True)
    con.execute("CREATE TABLE t (doc_id BIGINT, text VARCHAR, etag VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?, ?)", rows)
    con.execute(
        "COPY (SELECT DISTINCT doc_id, md5(text) AS text_md5, etag FROM t) TO "
        f"'{OUT}' (FORMAT PARQUET)"
    )
    n = con.execute(f"SELECT count(*) FROM read_parquet('{OUT}')").fetchone()[0]
    print(f"wrote {n} rows -> {OUT}")


if __name__ == "__main__":
    main()
