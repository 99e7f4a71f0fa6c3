"""Build a unicode-injected copy of a fixture dir (single-file parquet,
same layout the harness expects).

10% of documents get multibyte text appended — accents, CJK, emoji
(astral plane), RTL — while keeping the space-separated token
structure, and ``n_chars`` is recomputed. Everything else is copied
verbatim. This is the corpus that separates byte-level from
codepoint-level semantics across engines; the full differential
(`tools/diffcheck.py <out>`) is expected to pass 225/225 on it (it
caught one real oracle bug when introduced: `mm_extract_features`'s
oracle read characters over a byte-count range).

Usage: python tools/unicode_fixture.py [BASE_SF_DIR] [OUT_DIR]
"""

from __future__ import annotations

import os
import shutil
import sys

UNI_SUFFIX = " café 日本語😀 שלום naïvé"
TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "embeddings",
]


def build(base: str, out: str) -> int:
    import pyarrow as pa
    import pyarrow.parquet as pq

    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out)
    for t in TABLES:
        shutil.copy(f"{base}/{t}.parquet", f"{out}/{t}.parquet")
    df = pq.read_table(f"{base}/documents.parquet").to_pandas()
    mask = df["doc_id"] % 10 == 3
    df.loc[mask, "text"] = df.loc[mask, "text"] + UNI_SUFFIX
    # NULL text must survive (the null-sweep fixtures carry it):
    # .str.len() yields NaN there, which cannot cast to int64 directly
    df["n_chars"] = df["text"].str.len().fillna(0).astype("int64")
    pq.write_table(
        pa.Table.from_pandas(df, preserve_index=False),
        f"{out}/documents.parquet",
    )
    return int(mask.sum())


if __name__ == "__main__":
    base = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/unicode_sf"
    n = build(base, out)
    print(f"built {out}: {n} unicode docs")
